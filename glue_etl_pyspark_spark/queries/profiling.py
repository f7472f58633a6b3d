"""Data-engineering maintenance queries (round 5, late): ANALYZE-style
column profiling, snapshot diffing, and zone-map scan pruning.

These are the ops a production lake runs BETWEEN pipelines: collect
table statistics for the optimizer / data catalog, validate a
migration or CDC replication by diffing two snapshots, and skip data
at scan time from coarse per-chunk min/max stats (the parquet
row-group / Iceberg manifest discipline, made explicit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..io import load_table
from ..registry import query

# ---------------------------------------------------------------------------
# ANALYZE-style per-column profile
# ---------------------------------------------------------------------------

# (name, spark normalization expr, duckdb normalization expr, render)
# Numeric/temporal columns are normalized to exact BIGINT first
# (cents / epoch seconds) so min/max/ndv agree bit-for-bit across
# engines; the rendered min/max are strings so one stack() column can
# carry every type.
_PROFILE_COLS = (
    ("o_orderkey", "o_orderkey", "o_orderkey", "int"),
    ("o_custkey", "o_custkey", "o_custkey", "int"),
    (
        "o_totalprice",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)",
        "int",
    ),
    (
        "o_orderdate",
        "CAST(unix_timestamp(o_orderdate) AS BIGINT)",
        "CAST(floor(epoch(o_orderdate)) AS BIGINT)",
        "int",
    ),
    ("o_orderstatus", "o_orderstatus", "o_orderstatus", "str"),
    ("o_orderpriority", "o_orderpriority", "o_orderpriority", "str"),
)


def _profile_oracle() -> str:
    parts = []
    for name, _, dexpr, _render in _PROFILE_COLS:
        parts.append(
            f"""
SELECT '{name}' AS col_name,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COUNT(*) - COUNT({dexpr}) AS BIGINT) AS n_null,
  CAST(COUNT(DISTINCT {dexpr}) AS BIGINT) AS n_distinct,
  CAST(MIN({dexpr}) AS VARCHAR) AS min_repr,
  CAST(MAX({dexpr}) AS VARCHAR) AS max_repr
FROM orders"""
        )
    return " UNION ALL ".join(parts)


@query("profile_table_stats", oracle=_profile_oracle(), category="profiling")
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE-style one-pass column profile of ``orders``:
    per column, row count, null count, exact NDV, and min/max — the
    stats a catalog (Glue Data Catalog / Iceberg) stores for CBO and
    data discovery. ONE Spark aggregation computes every column's
    stats (count-distinct expand is width x rows, still one shuffle);
    the oracle recomputes per column. Doubles/timestamps normalize to
    exact BIGINT (cents / epoch seconds) before min/max/NDV so both
    engines agree exactly; min/max render as strings so a single
    stack() reshapes the wide stats row to one row per column.
    At 100 TB exact NDV is the one non-linear stat — swap in the
    mergeable HLL sketch (`agg_hll_grouped`) per this repo's sketch
    family; everything else is algebraic (one map-side-combined pass).
    """
    o = load_table(spark, sf_dir, "orders")
    aggs, stack_args = [], []
    aggs.append(F.count("*").cast("bigint").alias("__nr"))
    for name, sexpr, _, _render in _PROFILE_COLS:
        c = F.expr(sexpr)
        aggs.append((F.count("*") - F.count(c)).cast("bigint").alias(f"__nn_{name}"))
        aggs.append(F.min(c).cast("string").alias(f"__mn_{name}"))
        aggs.append(F.max(c).cast("string").alias(f"__mx_{name}"))
        stack_args.append(f"'{name}', __nr, __nn_{name}, __mn_{name}, __mx_{name}")
    wide = o.agg(*aggs)
    base = wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {', '.join(stack_args)}) AS "
        "(col_name, n_rows, n_null, min_repr, max_repr)"
    )
    # Exact NDV per column as its own slim two-level aggregate
    # (map-side-combined distinct, then a count). Folding the
    # distincts into the stats agg instead triggers Spark's
    # multi-distinct Expand — 7x the rows through ONE shuffle carrying
    # the wide min/max strings: measured 15-21 s vs 1.6-2.1 s for this
    # shape at a 1.5M-row probe. The slim aggs also run as parallel
    # jobs over column-pruned scans (columnar I/O reads each column
    # once either way).
    ndv = None
    for name, sexpr, _, _render in _PROFILE_COLS:
        d = (
            o.select(F.expr(sexpr).alias("v"))
            .groupBy("v")
            .agg(F.lit(1).alias("__one"))
            .agg(F.count("*").cast("bigint").alias("n_distinct"))
            .select(F.lit(name).alias("col_name"), "n_distinct")
        )
        ndv = d if ndv is None else ndv.unionAll(d)
    return base.join(ndv, "col_name").select(
        "col_name", "n_rows", "n_null", "n_distinct", "min_repr", "max_repr"
    )


# ---------------------------------------------------------------------------
# Snapshot diff (migration / CDC-replication validation)
# ---------------------------------------------------------------------------

# Two deterministic snapshots derived from orders: the "old" snapshot
# is missing keys divisible by 97, the "new" one is missing keys
# divisible by 89 and has rewritten status on keys divisible by 13 —
# so the diff exercises added + removed + changed + unchanged.
_DIFF_ROWHASH = "md5(concat({status}, '|', CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)))"

SNAPSHOT_DIFF_ORACLE = f"""
WITH old AS (
  SELECT o_orderkey,
    {_DIFF_ROWHASH.format(status="o_orderstatus")} AS rh
  FROM orders WHERE o_orderkey % 97 <> 0
), new AS (
  SELECT o_orderkey,
    {_DIFF_ROWHASH.format(status="CASE WHEN o_orderkey % 13 = 0 THEN 'U' ELSE o_orderstatus END")} AS rh
  FROM orders WHERE o_orderkey % 89 <> 0
), d AS (
  SELECT
    CASE
      WHEN o.o_orderkey IS NULL THEN 'added'
      WHEN n.o_orderkey IS NULL THEN 'removed'
      WHEN o.rh <> n.rh THEN 'changed'
      ELSE 'unchanged'
    END AS change_type,
    COALESCE(o.o_orderkey, n.o_orderkey) AS k
  FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
)
SELECT change_type, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(k) AS BIGINT) AS key_sum
FROM d GROUP BY change_type
"""


@query("snapshot_diff", oracle=SNAPSHOT_DIFF_ORACLE, category="profiling")
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-snapshot table diff (replication / migration validation):
    full outer join on the primary key, rows classified
    added/removed/changed/unchanged by comparing an md5 row hash of
    the tracked payload (status + exact integer cents — both engines
    md5 the identical string). Output is the per-class count plus a
    key checksum, the summary a validator alerts on. Scale: the join
    shuffles on the primary key only, row hashes are constant-width,
    and the payload hash means wide rows never travel twice — the
    same discipline as `table_checksum`, keyed per row."""
    o = load_table(spark, sf_dir, "orders")
    rh_old = F.expr(_DIFF_ROWHASH.format(status="o_orderstatus"))
    rh_new = F.expr(
        _DIFF_ROWHASH.format(
            status="CASE WHEN o_orderkey % 13 = 0 THEN 'U' ELSE o_orderstatus END"
        )
    )
    old = o.filter("o_orderkey % 97 <> 0").select(
        F.col("o_orderkey").alias("k_old"), rh_old.alias("rh_old")
    )
    new = o.filter("o_orderkey % 89 <> 0").select(
        F.col("o_orderkey").alias("k_new"), rh_new.alias("rh_new")
    )
    d = old.join(new, old.k_old == new.k_new, "full_outer").select(
        F.when(F.col("k_old").isNull(), "added")
        .when(F.col("k_new").isNull(), "removed")
        .when(F.col("rh_old") != F.col("rh_new"), "changed")
        .otherwise("unchanged")
        .alias("change_type"),
        F.coalesce("k_old", "k_new").alias("k"),
    )
    return d.groupBy("change_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("k").cast("bigint").alias("key_sum"),
    )


# ---------------------------------------------------------------------------
# Zone-map pruned scan (data skipping)
# ---------------------------------------------------------------------------

_ZONE_SPAN = 500  # event_id div span — one "zone" ~ a parquet row group
_TS_LO = "2024-01-10 00:00:00"
_TS_HI = "2024-01-12 00:00:00"

ZONEMAP_ORACLE = f"""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
FROM events
WHERE ts >= TIMESTAMP '{_TS_LO}' AND ts < TIMESTAMP '{_TS_HI}'
GROUP BY event_type
"""


@query("scan_zonemap_prune", oracle=ZONEMAP_ORACLE, category="profiling")
def scan_zonemap_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map data skipping, made explicit: build per-zone (id-range
    chunk = stand-in for a parquet row group / Iceberg manifest entry)
    min/max timestamp stats, select only zones whose [min,max] overlaps
    the predicate interval, and evaluate the real filter on just those
    zones' rows. The oracle is the plain full-scan filter — proving
    pruning loses nothing (zone stats are conservative). events' ts is
    ~perfectly correlated with event_id (ingestion order), so the zone
    filter skips ~93% of zones here; `tests/test_llm_ops.py` pins the
    selectivity. In production the stats table is computed at WRITE
    time (parquet already stores it per row group — this op is how an
    engine exploits the same idea for any chunking the storage layer
    didn't index); the runtime cost is a broadcast semi-join of zone
    ids, never a second full scan."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "__zone", F.expr(f"event_id div {_ZONE_SPAN}")
    )
    zones = e.groupBy("__zone").agg(
        F.min("ts").alias("zmin"), F.max("ts").alias("zmax")
    )
    lo = F.lit(_TS_LO).cast("timestamp_ntz")
    hi = F.lit(_TS_HI).cast("timestamp_ntz")
    live = zones.filter((F.col("zmax") >= lo) & (F.col("zmin") < hi)).select("__zone")
    pruned = e.join(broadcast(live), "__zone", "left_semi")
    return (
        pruned.filter((F.col("ts") >= lo) & (F.col("ts") < hi))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"))
            .cast("bigint")
            .alias("cents"),
        )
    )


def zone_selectivity(spark: SparkSession, sf_dir: str) -> tuple[int, int]:
    """(zones kept, zones total) for the pruned scan — test hook."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "__zone", F.expr(f"event_id div {_ZONE_SPAN}")
    )
    zones = e.groupBy("__zone").agg(
        F.min("ts").alias("zmin"), F.max("ts").alias("zmax")
    )
    lo = F.lit(_TS_LO).cast("timestamp_ntz")
    hi = F.lit(_TS_HI).cast("timestamp_ntz")
    kept = zones.filter((F.col("zmax") >= lo) & (F.col("zmin") < hi)).count()
    return kept, zones.count()


JOIN_SKEW_ORACLE = """
WITH k AS (
  SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders GROUP BY o_custkey
),
stats AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS total_rows,
    CAST(COUNT(*) AS BIGINT) AS n_keys,
    CAST(MAX(cnt) AS BIGINT) AS max_cnt
  FROM k
)
SELECT k.key, k.cnt,
  CAST((CAST(k.cnt AS HUGEINT) * 1000000) // s.total_rows AS BIGINT)
    AS share_ppm,
  CAST((CAST(s.max_cnt AS HUGEINT) * s.n_keys * 1000000) // s.total_rows
       AS BIGINT) AS skew_factor_ppm,
  CAST(CAST(s.max_cnt AS HUGEINT) * s.n_keys // s.total_rows + 1 AS BIGINT)
    AS suggested_salt
FROM k, stats s
ORDER BY k.cnt DESC, k.key
LIMIT 10
"""


@query("dq_join_skew_report", oracle=JOIN_SKEW_ORACLE, category="profiling")
def dq_join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic (what you run BEFORE a big join
    misbehaves): the 10 heaviest keys with their row share, the
    overall skew factor (max key count vs the uniform expectation,
    ppm), and the salt fan-out that would level the heaviest key —
    all exact integer math from one map-side-combined key-count
    aggregate. The max_cnt*n_keys*1e6 product runs in
    DECIMAL(38,0)/HUGEINT: it scales as rows*skew*1e6 (a 6e11-row
    fact table with a 1e3-hot key already crosses 2^63), while the
    quotients themselves — a ppm ratio and a salt fan-out — always
    fit BIGINT. The skew_salted_join operator consumes exactly this
    suggestion; AQE's runtime skew split is the safety net when the
    report wasn't run."""
    o = load_table(spark, sf_dir, "orders")
    k = o.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stats = k.agg(
        F.sum("cnt").cast("bigint").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
    )
    return (
        k.crossJoin(F.broadcast(stats))
        .select(
            "key",
            "cnt",
            # cnt*1e6 promoted to DECIMAL(38,0)/HUGEINT like the
            # adjacent skew product — a single key past ~9.2e12 rows
            # would overflow the int64 form (same audited class).
            F.expr("(CAST(cnt AS DECIMAL(38,0)) * 1000000) DIV total_rows")
            .cast("bigint")
            .alias("share_ppm"),
            F.expr(
                "(CAST(max_cnt AS DECIMAL(38,0)) * n_keys * 1000000)"
                " DIV total_rows"
            )
            .cast("bigint")
            .alias("skew_factor_ppm"),
            F.expr("CAST(max_cnt AS DECIMAL(38,0)) * n_keys DIV total_rows + 1")
            .cast("bigint")
            .alias("suggested_salt"),
        )
        .orderBy(F.col("cnt").desc(), "key")
        .limit(10)
    )


CDC_EXTRACT_ORACLE = """
WITH old AS (
  SELECT o_orderkey, o_orderstatus,
    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % 97 <> 0
), new AS (
  SELECT o_orderkey,
    CASE WHEN o_orderkey % 11 = 0 THEN 'X' ELSE o_orderstatus END
      AS o_orderstatus,
    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % 89 <> 0
)
SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
  CASE WHEN o.o_orderkey IS NULL THEN 'I'
       WHEN n.o_orderkey IS NULL THEN 'D'
       ELSE 'U' END AS op,
  n.o_orderstatus AS new_status, n.cents AS new_cents,
  o.o_orderstatus AS old_status, o.cents AS old_cents
FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
   OR o.o_orderstatus <> n.o_orderstatus OR o.cents <> n.cents
"""


@query("cdc_extract_changes", oracle=CDC_EXTRACT_ORACLE, category="profiling")
def cdc_extract_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC EXTRACTION — the inverse of cdc_upsert_merge: derive the
    I/U/D change feed from two table snapshots (old = keys % 97 != 0;
    new = keys % 89 != 0 with every 11th status mutated), emitting
    old and new images per changed key — what a snapshot-based
    replication pipeline publishes downstream. Unchanged rows are
    filtered INSIDE the full-outer join's projection, so the output
    is change-sized, not table-sized.

    Scale: one keyed full-outer join (both sides shuffle once on the
    PK); image comparison is row-local. Exact integer cents."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    old = o.filter(F.col("o_orderkey") % 97 != 0).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("old_status"),
        cents.alias("old_cents"),
    )
    new = o.filter(F.col("o_orderkey") % 89 != 0).select(
        F.col("o_orderkey").alias("k2"),
        F.when(F.col("o_orderkey") % 11 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("new_status"),
        cents.alias("new_cents"),
    )
    j = old.join(new, old.k == new.k2, "full_outer")
    return j.filter(
        F.col("k").isNull()
        | F.col("k2").isNull()
        | (F.col("old_status") != F.col("new_status"))
        | (F.col("old_cents") != F.col("new_cents"))
    ).select(
        F.coalesce("k", "k2").alias("o_orderkey"),
        F.when(F.col("k").isNull(), "I")
        .when(F.col("k2").isNull(), "D")
        .otherwise("U")
        .alias("op"),
        "new_status",
        "new_cents",
        "old_status",
        "old_cents",
    )


CROSSTAB_ORACLE = """
SELECT o_orderstatus AS o_orderstatus_o_orderpriority,
  CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS "1-URGENT",
  CAST(COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS BIGINT) AS "2-HIGH",
  CAST(COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS BIGINT) AS "3-MEDIUM",
  CAST(COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS BIGINT)
    AS "4-NOT SPECIFIED",
  CAST(COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS BIGINT) AS "5-LOW"
FROM orders GROUP BY o_orderstatus
"""


@query("profile_crosstab", oracle=CROSSTAB_ORACLE, category="profiling")
def profile_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``df.stat.crosstab`` (pair-wise frequency / contingency table):
    order-status × order-priority counts. Exact and deterministic —
    unlike freqItems/sampleBy, crosstab is a plain pivoted COUNT, so
    the oracle is the FILTER-pivot of the same GROUP BY (first output
    column is Spark's joined "col1_col2" name; value columns are named
    by the observed o_orderpriority domain, fixed by TPC-H at every
    SF). Scale shape: one partial-aggregated shuffle on the pair key,
    then a pivot over |priority domain| = 5 columns — output is
    |status domain| = 3 rows at any SF. Crosstab collects the DISTINCT
    col2 values to name columns, so it is for fixed-domain pairs only
    (a data-scaled column domain would make a data-wide row)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.stat.crosstab("o_orderstatus", "o_orderpriority")
