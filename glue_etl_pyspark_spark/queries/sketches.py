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


_CMS_W = 256
_CMS_SEEDS = ("s0", "s1", "s2")

_CMS_BUCKETS = {
    f"b{j}": _md5_mod("l_partkey", s, _CMS_W) for j, s in enumerate(_CMS_SEEDS)
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
        *[F.expr(frag).cast("bigint").alias(b) for b, frag in _CMS_BUCKETS.items()],
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
    "p0": _md5_mod("l_orderkey", "bf0", _BLOOM_M),
    "p1": _md5_mod("l_orderkey", "bf1", _BLOOM_M),
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
    positions = {f"p{i}": _md5_mod(key, f"bf{i}", m) for i in range(2)}
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
    without shuffling them. No false negatives ⇒ the final exact
    (broadcast) join returns exactly the plain-join result — the
    oracle is that plain join. The pass-rate (pruning power) is pinned
    in tests/test_plans.py."""
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
        fact.join(F.broadcast(dim), fact.l_orderkey == dim.o_orderkey)
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
