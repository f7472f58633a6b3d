"""Sketch-based approximate operators, made hash-checkable: a
count-min-sketch heavy-hitters query and a Bloom-filter-pruned join.

Both need a hash family the DuckDB oracle can reproduce bit-for-bit;
``_md5_mod`` builds one SQL fragment — a 6-hex-digit polynomial parse
of md5(seed:key) — that is valid verbatim in BOTH dialects (instr/
substr/md5/concat only), so the sketches themselves are deterministic
and the whole pipeline is value-oracled, not recall-gated.

Scale design: the CMS is the classic one-pass shuffle-shrinker — the
(seed,bucket) partial counts combine map-side, so the shuffle carries
at most d×w rows per task regardless of input size. The Bloom build
aggregates a ≤8 KB word table that broadcasts; the fact side is
pruned by two broadcast-hash probes before the exact join, never
shuffling unmatched rows — exactly what Spark's AQE runtime bloom
filter does, spelled out so the mechanics are visible and testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import query


def _md5_mod(expr: str, seed: str, mod: int) -> str:
    """Dialect-portable hash fragment: parse the first 6 hex digits of
    md5('<seed>:' || expr) as an integer, mod ``mod``. Identical
    output in Spark SQL and DuckDB (probed: both 226 for seed s0,
    key 42, mod 256)."""
    return _md5_mod_at(expr, seed, mod, 0)


def _md5_mod_at(expr: str, seed: str, mod: int, offset: int) -> str:
    """Like ``_md5_mod`` but parses the 6 hex digits starting at
    1-based position ``offset+1`` — one md5 yields FOUR independent
    6-digit hashes (offsets 0/6/12/18 of its 32 hex chars), so a
    k-hash family costs ceil(k/4) md5 evaluations per row instead of
    k (4x on MinHash signatures). Still valid verbatim in both
    dialects."""
    assert 0 <= offset <= 26
    digits = " + ".join(
        f"(instr('0123456789abcdef', "
        f"substr(md5(concat('{seed}', ':', {expr})), {offset + i}, 1)) - 1)"
        f" * {16 ** (6 - i)}"
        for i in range(1, 7)
    )
    return f"(({digits}) % {mod})"


def _md5_mod_spark(expr: str, seed: str, mod: int) -> str:
    """Spark-side hot-path twin of ``_md5_mod``: same 24-bit value via
    ONE md5 + conv(hex,16,10) instead of six instr/substr digit
    parses (bit-identical — pinned in tests/test_sketches.py — and
    ~3.5x faster per row, which matters when the hash gates a scan
    at 100 TB). Spark-only: DuckDB has no conv(), so oracles keep the
    polynomial form; only the VALUES must match, not the SQL shape."""
    return _md5_mod_at_spark(expr, seed, mod, 0)


def _md5_mod_at_spark(expr: str, seed: str, mod: int, offset: int) -> str:
    """Offset variant of ``_md5_mod_spark`` — the hot-path twin of
    ``_md5_mod_at`` (four independent 6-digit hashes per md5)."""
    assert 0 <= offset <= 26
    return (
        f"(cast(conv(substr(md5(concat('{seed}', ':', {expr})),"
        f" {offset + 1}, 6), 16, 10) as bigint) % {mod})"
    )


_CMS_W = 256
_CMS_SEEDS = ("s0", "s1", "s2")

_CMS_BUCKETS = {
    f"b{j}": _md5_mod("l_partkey", s, _CMS_W) for j, s in enumerate(_CMS_SEEDS)
}
# Spark body uses the conv twin (values pinned identical) — 18 -> 3
# md5 evaluations per lineitem row.
_CMS_BUCKETS_SPARK = {
    f"b{j}": _md5_mod_spark("l_partkey", s, _CMS_W)
    for j, s in enumerate(_CMS_SEEDS)
}

CMS_ORACLE = f"""
WITH keys AS (
  SELECT l_partkey,
    {_CMS_BUCKETS['b0']} AS b0,
    {_CMS_BUCKETS['b1']} AS b1,
    {_CMS_BUCKETS['b2']} AS b2
  FROM lineitem
),
pairs AS (
  SELECT l_partkey, 0 AS seed, b0 AS bucket FROM keys
  UNION ALL SELECT l_partkey, 1, b1 FROM keys
  UNION ALL SELECT l_partkey, 2, b2 FROM keys
),
sketch AS (
  SELECT seed, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM pairs GROUP BY seed, bucket
),
est AS (
  SELECT k.l_partkey, MIN(s.cnt) AS est
  FROM (SELECT DISTINCT l_partkey, seed, bucket FROM pairs) k
  JOIN sketch s ON k.seed = s.seed AND k.bucket = s.bucket
  GROUP BY k.l_partkey
),
truth AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS true_cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT e.l_partkey, e.est, t.true_cnt, e.est - t.true_cnt AS overcount
FROM est e JOIN truth t ON e.l_partkey = t.l_partkey
ORDER BY e.est DESC, e.l_partkey
LIMIT 20
"""


@query("agg_count_min_topk", oracle=CMS_ORACLE, category="sketch")
def agg_count_min_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters over lineitem.l_partkey: build a
    d=3 × w=256 sketch in ONE pass (the (seed,bucket) partials combine
    map-side, so the shuffle is ≤ d·w rows), estimate every key as the
    min over its d counters, report the top 20 with the true counts
    alongside — the CMS one-sided-error guarantee (est ≥ true) is
    pinned by a test. The md5-polynomial hash family is evaluated
    identically by DuckDB, so the sketch itself is value-oracled."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    keyed = li.select(
        "l_partkey",
        *[
            F.expr(frag).cast("bigint").alias(b)
            for b, frag in _CMS_BUCKETS_SPARK.items()
        ],
    )
    pairs = keyed.select(
        "l_partkey",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("int").alias("seed"),
                        F.col(f"b{j}").alias("bucket"),
                    )
                    for j in range(len(_CMS_SEEDS))
                ]
            )
        ).alias("sb"),
    ).select("l_partkey", "sb.seed", "sb.bucket")
    sketch = pairs.groupBy("seed", "bucket").agg(F.count("*").alias("cnt"))
    est = (
        pairs.distinct()
        .join(sketch, ["seed", "bucket"])
        .groupBy("l_partkey")
        .agg(F.min("cnt").alias("est"))
    )
    truth = li.groupBy("l_partkey").agg(F.count("*").alias("true_cnt"))
    return (
        est.join(truth, "l_partkey")
        .select(
            "l_partkey",
            "est",
            "true_cnt",
            (F.col("est") - F.col("true_cnt")).alias("overcount"),
        )
        .orderBy(F.desc("est"), "l_partkey")
        .limit(20)
    )


_BLOOM_M = 65536  # bits; 1024 64-bit words — broadcasts as ≤8 KB

_BLOOM_POS_FACT = {
    "p0": _md5_mod_spark("l_orderkey", "bf0", _BLOOM_M),
    "p1": _md5_mod_spark("l_orderkey", "bf1", _BLOOM_M),
}

# The oracle never sees the bloom: a Bloom prefilter admits every true
# match (no false negatives), so the exact join downstream makes the
# result identical to the plain join — which is the whole point.
BLOOM_ORACLE = """
SELECT month(o.o_orderdate) AS o_month,
  CAST(COUNT(*) AS BIGINT) AS n_items,
  CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT' AND year(o.o_orderdate) = 1995
GROUP BY month(o.o_orderdate)
"""


def bloom_words(dim_keys: DataFrame, key: str, m: int = _BLOOM_M) -> DataFrame:
    """Build the Bloom bitmap as (word, mask) rows: each key sets k=2
    bit positions derived from ``key`` via the portable md5-polynomial
    hash; bit_or folds them into 64-bit words. The result is at most
    m/64 rows — broadcastable at any dim size worth blooming."""
    positions = {f"p{i}": _md5_mod_spark(key, f"bf{i}", m) for i in range(2)}
    pos = dim_keys.select(
        *[F.expr(frag).cast("bigint").alias(p) for p, frag in positions.items()]
    )
    exploded = pos.select(
        F.explode(F.array(*[F.col(p) for p in positions])).alias("pos")
    )
    return (
        exploded.select(
            F.shiftright("pos", 6).alias("word"),
            F.expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("mask"))
    )


@query("bloom_prune_join", oracle=BLOOM_ORACLE, category="etl-pattern")
def bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join pruning, spelled out: a selective orders
    subset (~URGENT 1995, ≈3% of orders) builds a 64 Kbit Bloom bitmap
    (≤1024 (word,mask) rows, broadcast); lineitem probes both bit
    positions with broadcast-hash joins BEFORE the exact join, so at
    scale the fact table sheds non-matching rows at scan parallelism
    without shuffling them. No false negatives ⇒ the final exact join
    returns exactly the plain-join result — the oracle is that plain
    join. Only the constant-size (word,mask) bitmap frames carry
    broadcast hints; the dim subset itself is SF-scaled (~3% of
    orders), so the exact join's strategy is left to AQE. The
    pass-rate (pruning power) is pinned in tests/test_plans.py."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dim = o.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.year("o_orderdate") == 1995)
    ).select("o_orderkey", F.month("o_orderdate").alias("o_month"))

    words = bloom_words(dim, "o_orderkey")

    fact = li.select("l_orderkey", "l_quantity").select(
        "l_orderkey",
        "l_quantity",
        *[
            F.expr(frag).cast("bigint").alias(p)
            for p, frag in _BLOOM_POS_FACT.items()
        ],
    )
    for p in _BLOOM_POS_FACT:
        probe = words.select(
            F.col("word").alias(f"__w_{p}"), F.col("mask").alias(f"__m_{p}")
        )
        fact = (
            fact.join(
                F.broadcast(probe),
                F.shiftright(F.col(p), 6) == F.col(f"__w_{p}"),
                "inner",
            )
            .filter(
                F.expr(
                    f"(__m_{p} & shiftleft(cast(1 as bigint), "
                    f"cast({p} % 64 as int))) != 0"
                )
            )
            .drop(f"__w_{p}", f"__m_{p}", p)
        )

    return (
        fact.join(dim, fact.l_orderkey == dim.o_orderkey)
        .groupBy("o_month")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        )
    )


# Order-invariant table checksum: SUM and BIT_XOR of a portable row
# hash — commutative aggregates, so partitioning/ordering can't change
# the answer, and DuckDB computes the identical value.
_ROW_HASH = _md5_mod(
    "concat(o_orderkey, '|', o_custkey, '|', o_orderstatus)", "ck", 2**31
)

CHECKSUM_ORACLE = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM({_ROW_HASH}) AS BIGINT) AS checksum_sum,
  CAST(bit_xor({_ROW_HASH}) AS BIGINT) AS checksum_xor
FROM orders
"""


@query("table_checksum", oracle=CHECKSUM_ORACLE, category="sketch")
def table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-invariant table fingerprint (cross-environment data
    validation — the "did the migration copy every row" check): SUM +
    BIT_XOR over a portable per-row hash. Both aggregates are
    commutative, so partition count, task order, and file layout can't
    move the answer; map-side combine reduces the shuffle to one row
    per task regardless of table size."""
    o = load_table(spark, sf_dir, "orders")
    h = F.expr(_ROW_HASH).cast("bigint")
    return o.select(h.alias("h")).agg(
        F.count("*").alias("n_rows"),
        F.sum("h").alias("checksum_sum"),
        F.bit_xor("h").alias("checksum_xor"),
    )

# --- HyperLogLog distinct-count sketch, value-oracled -----------------
#
# The repo's HLL surface (`agg_approx_distinct`) is rows-only because
# Spark's approx_count_distinct registers aren't reproducible in
# DuckDB. This is its hash-checked twin: the SAME md5-polynomial hash
# family the CMS/Bloom sketches use drives a 64-register HLL whose
# every step — bucket, leading-zero rank, register max, harmonic mean,
# linear-counting small-range correction — evaluates bit-identically
# in both dialects, so the ESTIMATE ITSELF is value-oracled.
#
# Determinism notes: each register contributes 1/2^reg — an exact
# power of two, so the 64-term double sum is exact regardless of
# order (commutative map-side combine is safe). alpha·m² is injected
# as ONE repr'd literal into both programs (shared-constant rule).
# The only ln() sits in the linear-counting branch, floored at 3 dp
# with irrational inputs (ln(64/V), V integer) — never on a grid
# boundary.
#
# Scale: one groupBy(bucket) with map-side combine shrinks any input
# to ≤64 rows per task before the shuffle; the final reduce is one
# 64-row aggregate. This is the always-fits-in-memory distinct count
# for 100 TB keys (vs. the exact COUNT(DISTINCT)'s full key shuffle,
# computed here too only as the accuracy yardstick).

_HLL_M = 64
_HLL_BUCKET = _md5_mod("o_custkey", "hb", _HLL_M)
_HLL_W = _md5_mod("o_custkey", "hw", 16777216)  # 24-bit rank source
# rank of first 1-bit in the 24-bit value (1-based from the MSB);
# all-zeros -> 25. Generated once, pasted into both dialects.
_HLL_RHO = (
    "CASE "
    + " ".join(f"WHEN __w >= {2 ** (23 - k)} THEN {k + 1}" for k in range(24))
    + " ELSE 25 END"
)
_HLL_ALPHA_M2 = repr(0.709 * _HLL_M * _HLL_M)  # alpha_64 * m^2

HLL_ORACLE = f"""
WITH keys AS (
  SELECT {_HLL_BUCKET} AS bucket, {_HLL_W} AS __w FROM orders
),
regs AS (
  SELECT bucket, MAX({_HLL_RHO}) AS reg FROM keys GROUP BY bucket
),
sk AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_present,
         SUM(1.0 / power(2.0, reg)) AS s_present
  FROM regs
),
est AS (
  SELECT CAST({_HLL_M} - n_present AS BIGINT) AS n_zero_registers,
    {_HLL_ALPHA_M2} / (s_present + ({_HLL_M} - n_present) * 1.0) AS e_raw
  FROM sk
)
SELECT
  CAST(floor(CASE WHEN e_raw <= {2.5 * _HLL_M} AND n_zero_registers > 0
             THEN {_HLL_M} * ln({_HLL_M} * 1.0 / n_zero_registers)
             ELSE e_raw END * 1000) AS BIGINT) AS est_milli,
  CASE WHEN e_raw <= {2.5 * _HLL_M} AND n_zero_registers > 0
       THEN 'linear' ELSE 'raw' END AS method,
  n_zero_registers,
  (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders)
    AS exact_distinct
FROM est
"""


@query("agg_hll_portable", oracle=HLL_ORACLE, category="sketch")
def agg_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-register HyperLogLog distinct count of orders.o_custkey,
    hash-checked end-to-end (see module comment): bucket and rank come
    from the portable md5-polynomial family, registers are MAX-merged
    (commutative), the harmonic mean is an exact power-of-two sum, and
    the linear-counting correction branches on the same literals in
    both engines. Emits the estimate (milli-units), the branch taken,
    zero-register count, and the exact distinct as yardstick; the
    ±1.04/√64 ≈ 13% error bound is gated in tests/test_sketches.py."""
    o = load_table(spark, sf_dir, "orders")
    keys = o.select(
        F.expr(_HLL_BUCKET).alias("bucket"), F.expr(_HLL_W).alias("__w")
    )
    regs = keys.select("bucket", F.expr(_HLL_RHO).alias("rho")).groupBy(
        "bucket"
    ).agg(F.max("rho").alias("reg"))
    sk = regs.agg(
        F.count("*").alias("n_present"),
        F.sum(F.lit(1.0) / F.pow(F.lit(2.0), F.col("reg"))).alias("s_present"),
    )
    exact = o.agg(F.count_distinct("o_custkey").alias("exact_distinct"))
    est = sk.crossJoin(exact).select(
        (F.lit(_HLL_M) - F.col("n_present")).cast("bigint").alias(
            "n_zero_registers"
        ),
        (
            F.expr(_HLL_ALPHA_M2)
            / (F.col("s_present") + (F.lit(_HLL_M) - F.col("n_present")) * 1.0)
        ).alias("e_raw"),
        "exact_distinct",
    )
    lc = (F.col("e_raw") <= F.lit(2.5 * _HLL_M)) & (
        F.col("n_zero_registers") > 0
    )
    chosen = F.when(
        lc, F.lit(_HLL_M) * F.log(F.lit(_HLL_M * 1.0) / F.col("n_zero_registers"))
    ).otherwise(F.col("e_raw"))
    return est.select(
        F.floor(chosen * 1000).cast("bigint").alias("est_milli"),
        F.when(lc, F.lit("linear")).otherwise(F.lit("raw")).alias("method"),
        "n_zero_registers",
        "exact_distinct",
    )


# --- grouped HLL (the mergeable per-key distinct sketch) --------------

HLL_GROUPED_ORACLE = f"""
WITH keys AS (
  SELECT o_orderpriority AS grp, {_HLL_BUCKET} AS bucket, {_HLL_W} AS __w
  FROM orders
),
regs AS (
  SELECT grp, bucket, MAX({_HLL_RHO}) AS reg FROM keys GROUP BY grp, bucket
),
sk AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_present,
         SUM(1.0 / power(2.0, reg)) AS s_present
  FROM regs GROUP BY grp
),
est AS (
  SELECT grp, CAST({_HLL_M} - n_present AS BIGINT) AS n_zero,
    {_HLL_ALPHA_M2} / (s_present + ({_HLL_M} - n_present) * 1.0) AS e_raw
  FROM sk
),
exact AS (
  SELECT o_orderpriority AS grp,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
  FROM orders GROUP BY o_orderpriority
)
SELECT est.grp AS o_orderpriority,
  CAST(floor(CASE WHEN e_raw <= {2.5 * _HLL_M} AND n_zero > 0
             THEN {_HLL_M} * ln({_HLL_M} * 1.0 / n_zero)
             ELSE e_raw END * 1000) AS BIGINT) AS est_milli,
  exact.exact_distinct
FROM est JOIN exact ON est.grp = exact.grp
"""


@query("agg_hll_grouped", oracle=HLL_GROUPED_ORACLE, category="sketch")
def agg_hll_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group HLL distinct customers by order priority — the
    MERGEABLE form that makes the sketch the 100 TB distinct-count
    workhorse: register rows MAX-combine map-side, so each task ships
    at most groups x 64 rows regardless of input size, and the same
    MAX merges per-day sketches into per-month answers without
    re-reading data (the exact COUNT(DISTINCT) per group, computed
    here as the yardstick, cannot merge that way). Same portable hash
    family and branch literals as agg_hll_portable."""
    o = load_table(spark, sf_dir, "orders")
    keys = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.expr(_HLL_BUCKET).alias("bucket"),
        F.expr(_HLL_RHO.replace("__w", _HLL_W)).alias("rho"),
    )
    regs = keys.groupBy("grp", "bucket").agg(F.max("rho").alias("reg"))
    sk = regs.groupBy("grp").agg(
        F.count("*").alias("n_present"),
        F.sum(F.lit(1.0) / F.pow(F.lit(2.0), F.col("reg"))).alias("s_present"),
    )
    exact = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count_distinct("o_custkey").alias("exact_distinct")
    )
    est = sk.join(exact, "grp").select(
        "grp",
        (F.lit(_HLL_M) - F.col("n_present")).cast("bigint").alias("n_zero"),
        (
            F.expr(_HLL_ALPHA_M2)
            / (F.col("s_present") + (F.lit(_HLL_M) - F.col("n_present")) * 1.0)
        ).alias("e_raw"),
        "exact_distinct",
    )
    lc = (F.col("e_raw") <= F.lit(2.5 * _HLL_M)) & (F.col("n_zero") > 0)
    chosen = F.when(
        lc, F.lit(_HLL_M) * F.log(F.lit(_HLL_M * 1.0) / F.col("n_zero"))
    ).otherwise(F.col("e_raw"))
    return est.select(
        F.col("grp").alias("o_orderpriority"),
        F.floor(chosen * 1000).cast("bigint").alias("est_milli"),
        "exact_distinct",
    )


# --- deterministic-sample quantiles (the shuffle-free scale path) -----

_QS_HASH = _md5_mod("concat(l_orderkey, '-', l_linenumber)", "qs", 1024)
_QS_HASH_SPARK = _md5_mod_spark(
    "concat(l_orderkey, '-', l_linenumber)", "qs", 1024
)

QUANTILES_SAMPLED_ORACLE = f"""
WITH s AS (
  SELECT l_returnflag, l_quantity FROM lineitem WHERE {_QS_HASH} < 128
)
SELECT l_returnflag,
  CAST(COUNT(*) AS BIGINT) AS n_sampled,
  MEDIAN(l_quantity) AS median_qty,
  QUANTILE_CONT(l_quantity, 0.25) AS q1_qty,
  QUANTILE_CONT(l_quantity, 0.75) AS q3_qty
FROM s GROUP BY l_returnflag
"""


@query("agg_quantiles_sampled", oracle=QUANTILES_SAMPLED_ORACLE, category="sketch")
def agg_quantiles_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles over a deterministic 12.5% hash sample — the scale
    answer to exact percentiles' full-sort cost: the portable hash
    picks the SAME rows on both engines (so unlike rng-based sampling
    this stays value-oracled), the sampled partial is 8x smaller
    before any shuffle, and quantile error decays as 1/sqrt(sample).
    Accuracy vs the exact twin (agg_quantiles) is gated in
    tests/test_sketches.py. At 100 TB the filter runs in the scan
    (hash of two scan columns, no extra pass) — this is how
    percentile dashboards stay interactive on row counts where even
    percentile_approx's state gets expensive."""
    li = load_table(spark, sf_dir, "lineitem")
    s = li.filter(F.expr(_QS_HASH_SPARK) < 128)
    return s.groupBy("l_returnflag").agg(
        F.count("*").alias("n_sampled"),
        F.median("l_quantity").alias("median_qty"),
        F.percentile("l_quantity", F.lit(0.25)).alias("q1_qty"),
        F.percentile("l_quantity", F.lit(0.75)).alias("q3_qty"),
    )


def _cms_pairs_sql(key: str, table_sql: str) -> str:
    """Three (seed, bucket) rows per input row of ``table_sql``, using
    the portable polynomial hash (oracle side)."""
    b = {f"b{j}": _md5_mod(key, s, _CMS_W) for j, s in enumerate(_CMS_SEEDS)}
    return f"""
  SELECT {b['b0']} AS b0, {b['b1']} AS b1, {b['b2']} AS b2 FROM {table_sql}
"""


JOIN_CARD_ORACLE = f"""
WITH ka AS ({_cms_pairs_sql("l_partkey", "lineitem")}),
pa AS (
  SELECT 0 AS seed, b0 AS bucket FROM ka
  UNION ALL SELECT 1, b1 FROM ka
  UNION ALL SELECT 2, b2 FROM ka
),
sa AS (SELECT seed, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM pa GROUP BY seed, bucket),
kb AS ({_cms_pairs_sql("p_partkey", "part WHERE p_size >= 25")}),
pb AS (
  SELECT 0 AS seed, b0 AS bucket FROM kb
  UNION ALL SELECT 1, b1 FROM kb
  UNION ALL SELECT 2, b2 FROM kb
),
sb AS (SELECT seed, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM pb GROUP BY seed, bucket),
ip AS (
  SELECT sa.seed, SUM(CAST(sa.cnt AS HUGEINT) * sb.cnt) AS dot
  FROM sa JOIN sb ON sa.seed = sb.seed AND sa.bucket = sb.bucket
  GROUP BY sa.seed
),
est AS (SELECT CAST(MIN(dot) AS BIGINT) AS est FROM ip),
truth AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS true_n
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_size >= 25
)
SELECT est.est AS est_join_rows, truth.true_n AS true_join_rows,
  est.est - truth.true_n AS overcount
FROM est, truth
"""


@query("sketch_join_cardinality", oracle=JOIN_CARD_ORACLE, category="sketch")
def sketch_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation WITHOUT running the join (the optimizer /
    capacity-planning primitive): the inner product of two count-min
    sketches upper-bounds the equi-join cardinality, taken as the MIN
    over the d seed rows. Each side is ONE pass emitting d*w counters
    (constant shuffle regardless of input rows); the inner product and
    min are constant-size. The true join runs alongside so the
    one-sided error (est >= true, pinned in tests) is visible.

    The dot product accumulates in DECIMAL(38,0)/HUGEINT (the msum
    stance): per-bucket counter products scale as (n_a/w)*(n_b/w) and
    their sum as n_a*n_b/w, which crosses 2^63 long before real fact
    tables do — only the final MIN (the estimate itself, a join
    cardinality) casts back to BIGINT. Hash family: conv fast twin on
    Spark, the same polynomial values in the oracle."""
    bspark = {
        f"b{j}": _md5_mod_spark("k", s, _CMS_W) for j, s in enumerate(_CMS_SEEDS)
    }

    def sketch(df, key):
        keyed = df.select(F.col(key).alias("k")).select(
            *[F.expr(e).cast("bigint").alias(n) for n, e in bspark.items()]
        )
        pairs = keyed.select(
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(j).alias("seed"), F.col(f"b{j}").alias("bucket"))
                        for j in range(len(_CMS_SEEDS))
                    ]
                )
            ).alias("p")
        ).select("p.seed", "p.bucket")
        return pairs.groupBy("seed", "bucket").agg(F.count(F.lit(1)).alias("cnt"))

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    pt = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 25)
    sa = sketch(li, "l_partkey")
    sb = sketch(pt, "p_partkey").withColumnsRenamed({"cnt": "cnt_b"})
    ip = (
        sa.join(sb, ["seed", "bucket"])
        .groupBy("seed")
        .agg(
            F.sum(F.col("cnt").cast("decimal(38,0)") * F.col("cnt_b")).alias(
                "dot"
            )
        )
    )
    est = ip.agg(F.min("dot").cast("bigint").alias("est"))
    truth = (
        li.join(pt.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .agg(F.count(F.lit(1)).alias("true_n"))
    )
    return est.crossJoin(F.broadcast(truth)).select(
        F.col("est").alias("est_join_rows"),
        F.col("true_n").alias("true_join_rows"),
        (F.col("est") - F.col("true_n")).alias("overcount"),
    )


# --- HLL audience overlap (sketch union + inclusion-exclusion) -------
#
# The mergeable-sketch composition the single-set HLL above can't
# show: per-segment register vectors union by element-wise MAX (the
# property that lets 1000 executors build per-partition sketches and
# merge driver-side without re-reading data), and pairwise overlap
# falls out by inclusion-exclusion on the pinned estimates. All
# register math is integer; the only doubles are the same exact
# power-of-two harmonic sums and the shared alpha*m^2 literal the
# oracled HLLs already use, and the intersection arithmetic runs on
# the FLOORED milli integers, so it is bit-stable by construction.
# est_overlap_milli can legitimately go negative (inclusion-exclusion
# noise at 64 registers) — it is reported as-is, with the exact
# overlap beside it as the yardstick (accuracy gated in
# tests/test_sketches.py).

_OVL_BUCKET = _md5_mod("user_id", "hb", _HLL_M)
_OVL_W = _md5_mod("user_id", "hw", 16777216)
# Segment = "has a HIGH-VALUE event of this type": without the value
# gate every user hits every type in this dense fixture and all five
# audiences are the identical full user set (union == side == overlap
# — degenerate). The threshold keys on the per-event value
# distribution, whose selectivity is volume-independent (events per
# user is scale-constant in the fixture, ~60-65%% membership at
# sf0.01 AND sf0.1), so the segments stay differentiated at any SF —
# not the q11 fixed-constant class.
_OVL_VALUE_MIN = 130

HLL_OVERLAP_ORACLE = f"""
WITH keys AS (
  SELECT event_type AS grp, {_OVL_BUCKET} AS bucket, {_OVL_W} AS __w
  FROM events WHERE value > {_OVL_VALUE_MIN}
),
regs AS (
  SELECT grp, bucket, MAX({_HLL_RHO}) AS reg FROM keys GROUP BY grp, bucket
),
types AS (SELECT DISTINCT grp FROM regs),
pairs AS (
  SELECT a.grp AS ta, b.grp AS tb FROM types a JOIN types b ON a.grp < b.grp
),
ent AS (
  SELECT p.ta, p.tb, 'a' AS side, r.bucket, MAX(r.reg) AS reg
  FROM pairs p JOIN regs r ON r.grp = p.ta GROUP BY p.ta, p.tb, r.bucket
  UNION ALL
  SELECT p.ta, p.tb, 'b' AS side, r.bucket, MAX(r.reg) AS reg
  FROM pairs p JOIN regs r ON r.grp = p.tb GROUP BY p.ta, p.tb, r.bucket
  UNION ALL
  SELECT ta, tb, 'u' AS side, bucket, MAX(reg) AS reg FROM (
    SELECT p.ta, p.tb, r.bucket, r.reg
    FROM pairs p JOIN regs r ON r.grp = p.ta
    UNION ALL
    SELECT p.ta, p.tb, r.bucket, r.reg
    FROM pairs p JOIN regs r ON r.grp = p.tb
  ) u GROUP BY ta, tb, bucket
),
sk AS (
  SELECT ta, tb, side, CAST(COUNT(*) AS BIGINT) AS n_present,
    SUM(1.0 / power(2.0, reg)) AS s_present
  FROM ent GROUP BY ta, tb, side
),
est AS (
  SELECT ta, tb, side,
    CAST({_HLL_M} - n_present AS BIGINT) AS nz,
    {_HLL_ALPHA_M2} / (s_present + ({_HLL_M} - n_present) * 1.0) AS e_raw
  FROM sk
),
pin AS (
  SELECT ta, tb, side,
    CAST(floor(CASE WHEN e_raw <= {2.5 * _HLL_M} AND nz > 0
               THEN {_HLL_M} * ln({_HLL_M} * 1.0 / nz)
               ELSE e_raw END * 1000) AS BIGINT) AS est_milli
  FROM est
),
wide AS (
  SELECT ta AS type_a, tb AS type_b,
    MAX(CASE WHEN side = 'a' THEN est_milli END) AS est_a_milli,
    MAX(CASE WHEN side = 'b' THEN est_milli END) AS est_b_milli,
    MAX(CASE WHEN side = 'u' THEN est_milli END) AS est_union_milli
  FROM pin GROUP BY ta, tb
),
ut AS (SELECT DISTINCT user_id, event_type FROM events
      WHERE value > {_OVL_VALUE_MIN}),
ex AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
    CAST(COUNT(*) AS BIGINT) AS exact_overlap
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT w.type_a, w.type_b, w.est_a_milli, w.est_b_milli, w.est_union_milli,
  w.est_a_milli + w.est_b_milli - w.est_union_milli AS est_overlap_milli,
  COALESCE(e.exact_overlap, 0) AS exact_overlap
FROM wide w LEFT JOIN ex e ON e.type_a = w.type_a AND e.type_b = w.type_b
ORDER BY w.type_a, w.type_b
"""


@query("sketch_hll_overlap", oracle=HLL_OVERLAP_ORACLE, category="sketch")
def sketch_hll_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between high-value event-type segments (users
    with an event of that type above _OVL_VALUE_MIN — see the constant
    comment for why the dense fixture needs the gate) from MERGED HLL
    sketches: per-type 64-register vectors (same portable md5 family
    as agg_hll_portable), pairwise union by register-wise MAX — the
    mergeability that makes HLL the 100 TB distinct counter — and
    |A∩B| by inclusion-exclusion on the floor-pinned milli estimates
    (integer arithmetic after the pin, so cross-engine stable; can go
    negative at this register count, reported as-is with the exact
    overlap yardstick).

    Scale: one linear pass builds per-(type, bucket) registers with
    map-side combine (<= 64 rows per type survive the shuffle);
    everything after operates on constant-size frames (types bounded
    by the event-type domain, 64 registers, 10 pairs). The exact
    yardstick is the only corpus-scaled extra: distinct (user, type)
    then a per-user self-join bounded by <= 5 types/user."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value") > _OVL_VALUE_MIN
    )
    keys = ev.select(
        F.col("event_type").alias("grp"),
        F.expr(_OVL_BUCKET).alias("bucket"),
        F.expr(_OVL_W).alias("__w"),
    )
    regs = (
        keys.select("grp", "bucket", F.expr(_HLL_RHO).alias("rho"))
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("reg"))
        # CONSTANT-size (<= n_types x 64 rows) but referenced by every
        # side below — without materialization the plan rescans events
        # and re-runs the md5 register build once per reference
        # (measured 14 FileScans of events in the executed plan);
        # localCheckpoint is the documented tool for constant-size
        # reuse frames and cuts the corpus passes to two (registers +
        # the exact-yardstick distinct)
        .localCheckpoint(eager=True)
    )
    types = regs.select("grp").distinct()
    pairs = (
        types.select(F.col("grp").alias("ta"))
        .join(types.select(F.col("grp").alias("tb")))
        .filter(F.col("ta") < F.col("tb"))
    )
    side_a = pairs.join(regs, pairs.ta == regs.grp).select(
        "ta", "tb", F.lit("a").alias("side"), "bucket", "reg"
    )
    side_b = pairs.join(regs, pairs.tb == regs.grp).select(
        "ta", "tb", F.lit("b").alias("side"), "bucket", "reg"
    )
    side_u = (
        side_a.select("ta", "tb", "bucket", "reg")
        .unionAll(side_b.select("ta", "tb", "bucket", "reg"))
        .groupBy("ta", "tb", "bucket")
        .agg(F.max("reg").alias("reg"))
        .select("ta", "tb", F.lit("u").alias("side"), "bucket", "reg")
    )
    ent = side_a.unionAll(side_b).unionAll(side_u)
    sk = ent.groupBy("ta", "tb", "side").agg(
        F.count("*").alias("n_present"),
        F.sum(F.lit(1.0) / F.pow(F.lit(2.0), F.col("reg"))).alias("s_present"),
    )
    est = sk.select(
        "ta", "tb", "side",
        (F.lit(_HLL_M) - F.col("n_present")).cast("bigint").alias("nz"),
        (
            F.expr(_HLL_ALPHA_M2)
            / (F.col("s_present") + (F.lit(_HLL_M) - F.col("n_present")) * 1.0)
        ).alias("e_raw"),
    )
    lc = (F.col("e_raw") <= F.lit(2.5 * _HLL_M)) & (F.col("nz") > 0)
    pin = est.select(
        "ta", "tb", "side",
        F.floor(
            F.when(
                lc, F.lit(_HLL_M) * F.log(F.lit(_HLL_M * 1.0) / F.col("nz"))
            ).otherwise(F.col("e_raw"))
            * 1000
        )
        .cast("bigint")
        .alias("est_milli"),
    )
    wide = pin.groupBy(
        F.col("ta").alias("type_a"), F.col("tb").alias("type_b")
    ).agg(
        F.max(F.when(F.col("side") == "a", F.col("est_milli"))).alias(
            "est_a_milli"
        ),
        F.max(F.when(F.col("side") == "b", F.col("est_milli"))).alias(
            "est_b_milli"
        ),
        F.max(F.when(F.col("side") == "u", F.col("est_milli"))).alias(
            "est_union_milli"
        ),
    )
    ut = ev.select("user_id", "event_type").distinct()
    ex = (
        ut.select("user_id", F.col("event_type").alias("type_a"))
        .join(
            ut.select("user_id", F.col("event_type").alias("type_b")),
            "user_id",
        )
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("exact_overlap"))
    )
    return (
        wide.join(ex, ["type_a", "type_b"], "left")
        .select(
            "type_a", "type_b", "est_a_milli", "est_b_milli",
            "est_union_milli",
            (
                F.col("est_a_milli")
                + F.col("est_b_milli")
                - F.col("est_union_milli")
            ).alias("est_overlap_milli"),
            F.coalesce(F.col("exact_overlap"), F.lit(0)).alias(
                "exact_overlap"
            ),
        )
        .orderBy("type_a", "type_b")
    )
