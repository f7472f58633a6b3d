"""Event-analytics queries: conversion funnel and cohort retention.

The shapes a clickstream warehouse runs daily: both are one shuffle on
user_id (funnel: two window passes over the same partitioning;
retention: first-seen aggregate joined back), then a small final
aggregate. Fully deterministic, hash-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import query

FUNNEL_ORACLE = """
WITH per_user AS (
  SELECT user_id,
    MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view
  FROM events GROUP BY user_id
), step2 AS (
  SELECT p.user_id, p.first_view,
    MIN(CASE WHEN e.event_type = 'click' AND e.ts >= p.first_view
             THEN e.ts END) AS first_click
  FROM per_user p JOIN events e ON e.user_id = p.user_id
  GROUP BY p.user_id, p.first_view
), step3 AS (
  SELECT s.user_id, s.first_view, s.first_click,
    MIN(CASE WHEN e.event_type = 'purchase' AND e.ts >= s.first_click
             THEN e.ts END) AS first_purchase
  FROM step2 s JOIN events e ON e.user_id = s.user_id
  GROUP BY s.user_id, s.first_view, s.first_click
)
SELECT stage, CAST(stage_idx AS INT) AS stage_idx,
  CAST(n_users AS BIGINT) AS n_users
FROM (
  SELECT
    CAST(COUNT(first_view) AS BIGINT) AS viewed,
    CAST(COUNT(first_click) AS BIGINT) AS clicked,
    CAST(COUNT(first_purchase) AS BIGINT) AS purchased
  FROM step3
) UNPIVOT (n_users FOR stage IN (viewed, clicked, purchased))
JOIN (VALUES ('viewed', 1), ('clicked', 2), ('purchased', 3))
  t(stage, stage_idx) USING (stage)
"""


@query("events_funnel", oracle=FUNNEL_ORACLE, category="analytics")
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: each
    stage's timestamp must be >= the previous stage's (a click before
    the first view doesn't convert). Spark computes all three stage
    timestamps with chained window minimums over ONE user_id
    partitioning — a single shuffle, no self-joins (the oracle uses
    the equivalent join-per-stage formulation). Output: users
    remaining at each stage."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    # Chained stage minimums: each references the previous stage's
    # column, so each is staged in its own withColumn (lateral-alias
    # rule) — all three windows share one partitioning => one shuffle.
    staged = (
        ev.withColumn(
            "first_view",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "first_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") >= F.col("first_view")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "first_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("first_click")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.first("first_view").alias("first_view"),
        F.first("first_click").alias("first_click"),
        F.first("first_purchase").alias("first_purchase"),
    )
    counts = per_user.agg(
        F.count("first_view").alias("viewed"),
        F.count("first_click").alias("clicked"),
        F.count("first_purchase").alias("purchased"),
    )
    tall = counts.selectExpr(
        "stack(3, 'viewed', viewed, 1, 'clicked', clicked, 2, "
        "'purchased', purchased, 3) AS (stage, n_users, stage_idx)"
    )
    return tall.select(
        "stage", F.col("stage_idx").cast("int").alias("stage_idx"),
        F.col("n_users").cast("bigint").alias("n_users"),
    )


RETENTION_ORACLE = """
WITH firsts AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
), active AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
    CAST(datediff('day', f.cohort_week, date_trunc('week', e.ts)) // 7 AS INT)
      AS week_offset
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT CAST(cohort_week AS DATE) AS cohort_week, week_offset,
  CAST(COUNT(*) AS BIGINT) AS n_users
FROM active
GROUP BY cohort_week, week_offset
"""


@query("retention_cohort", oracle=RETENTION_ORACLE, category="analytics")
def retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users are cohorted by the
    ISO week of their first event; each (cohort_week, week_offset)
    cell counts distinct users from that cohort active that many
    weeks later. One aggregate for first-seen, a join back (the
    cohort frame is users-sized — broadcastable when small, shuffle
    co-partitioned on user_id otherwise), then a distinct+count."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .distinct()
    )
    return active.groupBy(
        F.col("cohort_week").cast("date").alias("cohort_week"), "week_offset"
    ).agg(F.count(F.lit(1)).alias("n_users"))


COOCCUR_ORACLE = """
WITH pairs AS (
  SELECT a.l_orderkey, a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT part_a, part_b, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM pairs GROUP BY part_a, part_b
ORDER BY n_orders DESC, part_a, part_b
LIMIT 25
"""


@query("cooccurrence_part_pairs", oracle=COOCCUR_ORACLE, category="analytics")
def cooccurrence_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs appearing in the same
    order, top-25 by support — the candidate-generation step of
    association mining / co-purchase recommenders. The self-join keys
    on l_orderkey, so pair blowup is bounded by per-order basket size
    (~4 here; real baskets need a per-key cap or a frequency
    prefilter, same playbook as the dedup prefix filter); one shuffle
    on orderkey + the pair aggregation, top-k via
    TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(25)
    )


# Fixed bins over o_totalprice: lo=0, width 25000, 20 bins + overflow.
# Both engines bucket with the same floor arithmetic (no width_bucket
# in DuckDB; Spark's width_bucket matches floor((x-lo)/w)+1 in-range).
HISTOGRAM_ORACLE = """
SELECT CAST(least(floor(o_totalprice / 25000.0), 20) AS BIGINT) AS bin,
  CAST(COUNT(*) AS BIGINT) AS n,
  floor(MIN(o_totalprice) * 100) / 100 AS bin_min,
  floor(MAX(o_totalprice) * 100) / 100 AS bin_max
FROM orders
GROUP BY CAST(least(floor(o_totalprice / 25000.0), 20) AS BIGINT)
"""


@query("agg_histogram", oracle=HISTOGRAM_ORACLE, category="aggregation")
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (20 bins of 25k + an
    overflow bin): the profiling primitive behind DQ dashboards and
    skew diagnosis. One map-side-combined aggregation — 21 output
    rows regardless of table size."""
    o = load_table(spark, sf_dir, "orders")
    bin_col = F.least(F.floor(F.col("o_totalprice") / 25000.0), F.lit(20)).cast(
        "bigint"
    )
    return (
        o.withColumn("bin", bin_col)
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            (F.floor(F.min("o_totalprice") * 100) / 100).alias("bin_min"),
            (F.floor(F.max("o_totalprice") * 100) / 100).alias("bin_max"),
        )
    )


WINSORIZE_ORACLE = """
WITH ranked AS (
  SELECT event_type, value,
    ROW_NUMBER() OVER (
      PARTITION BY event_type ORDER BY value, event_id) AS r,
    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM events
),
cuts AS (
  SELECT event_type, n,
    greatest(1, n // 100) AS lo_r,
    n - greatest(1, n // 100) + 1 AS hi_r
  FROM ranked GROUP BY event_type, n
)
SELECT c.event_type, c.n,
  MAX(CASE WHEN r.r = c.lo_r THEN r.value END) AS p01,
  MAX(CASE WHEN r.r = c.hi_r THEN r.value END) AS p99,
  CAST(SUM(CASE WHEN r.r < c.lo_r THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
  CAST(SUM(CASE WHEN r.r > c.hi_r THEN 1 ELSE 0 END) AS BIGINT) AS n_above
FROM ranked r JOIN cuts c ON r.event_type = c.event_type
GROUP BY c.event_type, c.n
"""


@query("events_winsorize_bounds", oracle=WINSORIZE_ORACLE, category="analytics")
def events_winsorize_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based winsorization bounds per event type: the exact
    1st/99th-percentile clip values (value at integer ranks
    max(1, n div 100) and n - that + 1 — picked order statistics, not
    interpolated, so no cross-engine float interpolation drift) plus
    the count of rows each tail would clip — the outlier-clipping
    prelude to feature normalization. Ties broken by event_id so the
    picked statistic is unique.

    Scale (r17 rework): the old shape ranked EVERY row through one
    window per event_type — a 5-value domain that capped the stage at
    5 tasks and shuffled the full table at every scale (the r17 100x
    labeled-stage probe measured a 118 MB / 4-task window stage). The
    targets are just two order statistics per type, so: (1) per-type
    counts collect as a driver literal (domain-bounded, 5 rows — the
    packing-bases discipline); (2) ascending and descending rank
    windows are pruned map-side by the LITERAL bound B = max(lo_r)
    (filter rn <= B compiles to partial WindowGroupLimit, the
    topk_per_group shape), so each window shuffles <= B rows per type
    per task instead of the whole table; (3) the asc rank lo_r row is
    p01, the desc rank lo_r row is p99 (rank-from-top of asc-rank
    hi_r = n - hi_r + 1 = lo_r — the exact inverse permutation, ties
    inverted too); (4) n_below = n_above = lo_r - 1 are identities of
    dense row_number ranks, emitted from the literal frame. Values
    identical by construction; the oracle keeps the full-rank shape
    as a genuinely different evaluation."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select("event_type", "value", "event_id")
    cnts = base.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n")
    ).collect()
    rows = [
        (r["event_type"], int(r["n"]), max(1, int(r["n"]) // 100))
        for r in cnts
    ]
    bound = max((lo for _, _, lo in rows), default=1)
    lit = spark.createDataFrame(
        rows, "event_type string, n bigint, lo_r bigint"
    )
    wa = Window.partitionBy("event_type").orderBy("value", "event_id")
    wd = Window.partitionBy("event_type").orderBy(
        F.desc("value"), F.desc("event_id")
    )
    lo = (
        base.withColumn("r", F.row_number().over(wa))
        .filter(F.col("r") <= bound)
        .join(F.broadcast(lit.select("event_type", "lo_r")), "event_type")
        .filter(F.col("r") == F.col("lo_r"))
        .select("event_type", F.col("value").alias("p01"))
    )
    hi = (
        base.withColumn("r", F.row_number().over(wd))
        .filter(F.col("r") <= bound)
        .join(F.broadcast(lit.select("event_type", "lo_r")), "event_type")
        .filter(F.col("r") == F.col("lo_r"))
        .select("event_type", F.col("value").alias("p99"))
    )
    return (
        lit.join(lo, "event_type")
        .join(hi, "event_type")
        .select(
            "event_type",
            "n",
            "p01",
            "p99",
            (F.col("lo_r") - 1).cast("bigint").alias("n_below"),
            (F.col("lo_r") - 1).cast("bigint").alias("n_above"),
        )
    )


_TRANS_TOPK = 20

TRANSITIONS_ORACLE = f"""
WITH seq AS (
  SELECT user_id, event_type,
    LAG(event_type) OVER (
      PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type,
  CAST(COUNT(*) AS BIGINT) AS n_trans
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
ORDER BY n_trans DESC, prev_type, next_type
LIMIT {_TRANS_TOPK}
"""


@query("events_markov_transitions", oracle=TRANSITIONS_ORACLE, category="analytics")
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event-type transition pairs (first-order Markov edges) per
    user journey — the session-flow statistic behind funnel design
    and next-action models. One lag window per user (ordered by
    (ts, event_id) — unique key, so the sequence is deterministic),
    one transition-count shuffle with map-side combine, top-k via
    TakeOrderedAndProject. The window partitions by user_id: at
    100 TB the key is high-cardinality and AQE handles any hot-user
    skew; no global ordering is ever required."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    return (
        seq.groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n_trans"))
        .orderBy(F.desc("n_trans"), "prev_type", "next_type")
        .limit(_TRANS_TOPK)
    )


EQUIDEPTH_ORACLE = """
WITH t AS (
  SELECT o_totalprice,
    NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
  FROM orders
)
SELECT CAST(bucket AS BIGINT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
  floor(MIN(o_totalprice) * 100) / 100 AS lo,
  floor(MAX(o_totalprice) * 100) / 100 AS hi
FROM t GROUP BY bucket
"""


@query("agg_histogram_equidepth", oracle=EQUIDEPTH_ORACLE, category="aggregation")
def agg_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile-bucketed) histogram of order totals:
    NTILE(10) over the totally-ordered values (o_orderkey tie-break
    makes the bucketing deterministic — NTILE's floor-division fill
    is SQL-standard on both engines), then per-bucket count and
    2-dp-floored bounds. The complement of agg_histogram's fixed-width
    bins: this is how optimizers and DQ monitors summarize skewed
    distributions. The global NTILE is a single total sort — fine for
    profiling output sizes; a 100 TB profile first reduces per
    partition (approx quantiles or sampled sort) as SCALING.md's
    global-order note prescribes."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select("o_totalprice", F.ntile(10).over(w).alias("bucket"))
        .groupBy(F.col("bucket").cast("bigint").alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            (F.floor(F.min("o_totalprice") * 100) / 100).alias("lo"),
            (F.floor(F.max("o_totalprice") * 100) / 100).alias("hi"),
        )
    )


MAD_ORACLE = """
WITH ranked AS (
  SELECT event_type, event_id, value,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS r,
    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM events
),
med AS (
  SELECT event_type, MAX(CASE WHEN r = (n + 1) // 2 THEN value END) AS med
  FROM ranked GROUP BY event_type
),
devs AS (
  SELECT r.event_type, r.event_id, r.value, m.med,
    abs(r.value - m.med) AS dev,
    ROW_NUMBER() OVER (PARTITION BY r.event_type
                       ORDER BY abs(r.value - m.med), r.event_id) AS dr,
    CAST(COUNT(*) OVER (PARTITION BY r.event_type) AS BIGINT) AS n
  FROM ranked r JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, med,
    MAX(CASE WHEN dr = (n + 1) // 2 THEN dev END) AS mad
  FROM devs GROUP BY event_type, med
)
SELECT d.event_type, m.med, m.mad,
  CAST(SUM(CASE WHEN d.dev > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
    AS n_outliers,
  CAST(COUNT(*) AS BIGINT) AS n
FROM devs d JOIN mad m USING (event_type)
GROUP BY d.event_type, m.med, m.mad
"""


@query("dq_outliers_mad", oracle=MAD_ORACLE, category="governance")
def dq_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type via median absolute
    deviation: median and MAD are PICKED order statistics (value at
    integer rank (n+1) div 2, ties broken by event_id — no
    interpolation, no accumulation, so every number is an exact input
    value or an exact subtraction both engines compute identically),
    then the classic |v - med| > 3*MAD rule counts outliers. Two rank
    windows per type group + one conditional aggregate; the same
    rank-statistic discipline as events_winsorize_bounds, resistant
    to the very outliers z-scores get skewed by."""
    ev = load_table(spark, sf_dir, "events")
    wv = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = ev.select("event_type", "event_id", "value").withColumn(
        "r", F.row_number().over(wv)
    ).withColumn("n", F.count("*").over(wn).cast("bigint"))
    med = ranked.groupBy("event_type").agg(
        F.max(
            F.when(F.col("r") == F.expr("(n + 1) div 2"), F.col("value"))
        ).alias("med")
    )
    devs = ranked.join(med, "event_type").withColumn(
        "dev", F.abs(F.col("value") - F.col("med"))
    )
    wd = Window.partitionBy("event_type").orderBy("dev", "event_id")
    devs = devs.withColumn("dr", F.row_number().over(wd))
    mad = devs.groupBy("event_type", "med").agg(
        F.max(
            F.when(F.col("dr") == F.expr("(n + 1) div 2"), F.col("dev"))
        ).alias("mad")
    )
    return (
        devs.join(mad.select("event_type", "mad"), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.sum(
                F.when(F.col("dev") > 3 * F.col("mad"), 1).otherwise(0)
            ).cast("bigint").alias("n_outliers"),
            F.count("*").alias("n"),
        )
    )


# --- seasonal baseline + spike detection ------------------------------

SEASONAL_ORACLE = """
WITH hourly AS (
  SELECT event_type, CAST(ts AS DATE) AS day, hour(ts) AS hour,
    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      AS hourly_cents
  FROM events GROUP BY event_type, CAST(ts AS DATE), hour(ts)
),
profile AS (
  SELECT event_type, hour,
    CAST(CAST(SUM(hourly_cents) AS BIGINT) // COUNT(*) AS BIGINT)
      AS profile_cents,
    CAST(COUNT(*) AS BIGINT) AS n_days
  FROM hourly GROUP BY event_type, hour
)
SELECT h.event_type, h.day, CAST(h.hour AS BIGINT) AS hour,
  h.hourly_cents, p.profile_cents, p.n_days,
  CASE WHEN h.hourly_cents > 2 * p.profile_cents THEN 1 ELSE 0 END
    AS is_spike
FROM hourly h JOIN profile p
  ON h.event_type = p.event_type AND h.hour = p.hour
"""


@query("events_seasonal_baseline", oracle=SEASONAL_ORACLE, category="analytics")
def events_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal baseline with spike flags — the ops-metrics
    anomaly screen: per (type, calendar hour) hourly totals, a profile
    of the mean hourly total at that clock hour, and a 2x-over-profile
    spike flag. All arithmetic is exact integer cents (floor(v*100+.5)
    — msum discipline) with an integer-division mean, so the whole
    chain is order-invariant and value-oracled; values are positive,
    so Spark's truncating div and DuckDB's flooring // agree.

    Scale: two map-side-combined aggregates (hourly grain, then
    24-row-per-type profile) and a broadcast join back — no raw-event
    shuffle beyond the hourly rollup; at 100 TB the hourly grain IS
    the pre-reduction (types x days x 24 rows)."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("bigint")
    hourly = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        F.hour("ts").alias("hour"),
    ).agg(F.sum(cents).cast("bigint").alias("hourly_cents"))
    profile = hourly.groupBy("event_type", "hour").agg(
        F.expr("sum(hourly_cents) div count(*)")
        .cast("bigint")
        .alias("profile_cents"),
        F.count("*").alias("n_days"),
    )
    return (
        hourly.join(F.broadcast(profile), ["event_type", "hour"])
        .select(
            "event_type",
            "day",
            F.col("hour").cast("bigint").alias("hour"),
            "hourly_cents",
            "profile_cents",
            "n_days",
            (F.col("hourly_cents") > 2 * F.col("profile_cents"))
            .cast("int")
            .alias("is_spike"),
        )
    )


# ---------------------------------------------------------------------------
# Time-decayed popularity (trending score)
# ---------------------------------------------------------------------------

# Exponential decay 0.9^d, integer-scaled to 1e6 at build time and
# injected as the SAME literal CASE fragment into both engines (repo
# shared-constant rule) — the decay weights are exact integers, so the
# weighted sum is pure BIGINT arithmetic: order-invariant, engine-
# exact, no pow()/exp() drift. Horizon 30 days; older events weigh 0.
_DECAY_CASE = "CASE " + " ".join(
    f"WHEN {d} THEN {round(0.9 ** d * 1_000_000)}" for d in range(30)
) + " ELSE 0 END"

DECAYED_POP_ORACLE = f"""
WITH mx AS (SELECT MAX(CAST(ts AS DATE)) AS mxd FROM events),
w AS (
  SELECT event_type,
    CAST(floor(value * 100 + 0.5) AS BIGINT)
      * (CASE date_diff('day', CAST(ts AS DATE), mxd) {_DECAY_CASE.replace("CASE ", "", 1)}) AS wc
  FROM events, mx
)
SELECT event_type,
  CAST(SUM(wc) AS BIGINT) AS decayed_cents_millionths,
  CAST(COUNT(*) AS BIGINT) AS n
FROM w GROUP BY event_type
"""


@query("events_decayed_popularity", oracle=DECAYED_POP_ORACLE, category="analytics")
def events_decayed_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed popularity per event type (the
    trending-score shape: recent activity counts more). The decay
    weight 0.9^days_ago is pre-scaled to an exact 1e6 integer per day
    offset and injected as an identical literal CASE into both
    engines, so the weighted sum is exact BIGINT arithmetic —
    order-invariant (no double pow/exp anywhere). The corpus max date
    is a broadcast one-row aggregate. At 100 TB the weighted sum is a
    single map-side-combined aggregation; the BIGINT accumulator holds
    to ~2e5 rows x 5e10/row — beyond that swap the sum buffer to
    DECIMAL(38,0) exactly as `functions.money.msum` does."""
    e = load_table(spark, sf_dir, "events")
    mx = e.agg(F.max(F.to_date("ts")).alias("mxd"))
    weight = F.expr(f"CASE date_diff(mxd, to_date(ts)) {_DECAY_CASE.replace('CASE ', '', 1)}")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    return (
        e.crossJoin(F.broadcast(mx))
        .select("event_type", (cents * weight).alias("wc"))
        .groupBy("event_type")
        .agg(
            F.sum("wc").cast("bigint").alias("decayed_cents_millionths"),
            F.count("*").cast("bigint").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# Last-touch attribution
# ---------------------------------------------------------------------------

ATTRIBUTION_ORACLE = """
WITH touched AS (
  SELECT event_type, value,
    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS channel0
  FROM events
)
SELECT COALESCE(channel0, 'direct') AS channel,
  CAST(COUNT(*) AS BIGINT) AS n_purchases,
  CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
FROM touched WHERE event_type = 'purchase'
GROUP BY COALESCE(channel0, 'direct')
"""


@query("events_attribution_last_touch", oracle=ATTRIBUTION_ORACLE, category="analytics")
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase is credited to
    the user's most recent preceding non-purchase event type (the
    'channel'); purchases with no prior touch are 'direct'. One
    user_id-partitioned window with a unique (ts, event_id) ordering
    carries the last touch forward (last_value IGNORE NULLS — the
    same pattern as the as-of join twin); revenue is exact integer
    cents. Scale: one shuffle on user_id, per-user windows are
    session-sized; the final channel rollup is algebraic."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    return (
        e.select("event_type", cents.alias("cents"), touch.alias("channel0"))
        .filter(F.col("event_type") == "purchase")
        .select(F.coalesce("channel0", F.lit("direct")).alias("channel"), "cents")
        .groupBy("channel")
        .agg(
            F.count("*").cast("bigint").alias("n_purchases"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
    )


# ---------------------------------------------------------------------------
# Record linkage (Glue FindMatches shape): blocking + edit distance
# ---------------------------------------------------------------------------

LINKAGE_ORACLE = """
WITH dirty AS (
  SELECT c_custkey AS d_key, c_nationkey, c_mktsegment,
    substr(c_name, 1, 3) || substr(c_name, 5) AS d_name
  FROM customer WHERE c_custkey % 7 = 0
), pairs AS (
  SELECT c.c_custkey AS clean_key, d.d_key AS dirty_key,
    CAST(levenshtein(c.c_name, d.d_name) AS BIGINT) AS dist
  FROM customer c JOIN dirty d
    ON c.c_nationkey = d.c_nationkey AND c.c_mktsegment = d.c_mktsegment
)
SELECT clean_key, dirty_key, dist FROM pairs WHERE dist <= 1
"""


@query("linkage_fuzzy_match", oracle=LINKAGE_ORACLE, category="analytics")
def linkage_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage in the Glue FindMatches shape: a deterministic
    'dirty' feed (every 7th customer, one character dropped from the
    name) is matched back to the clean master and candidate pairs are
    scored with exact Levenshtein edit distance — both engines
    implement levenshtein identically over identical strings, so the
    whole linkage is VALUE-oracled (integer distances, no ML drift).

    Candidate generation is SYMMETRIC-DELETE (SymSpell) blocking, not
    a coarse-block self-join: each name emits itself plus every
    delete-one-character variant (L+1 short keys per record), and
    candidates are records sharing a variant within the same
    (nation, segment) block. For levenshtein <= 1 this is provably
    COMPLETE — equal strings share the full key, a substitution pair
    shares the variant deleting the differing position, an
    insert/delete pair shares the shorter string itself — so the
    result set is bit-identical to the quadratic block join the
    DuckDB oracle runs (the oracle keeps the n^2/blocks form: it
    mirrors semantics, not plan). Cost is n*(L+1) keys and
    near-singleton variant buckets instead of block_size^2 pairs: the
    r11 10x probe measured the coarse-block form at 77 s (70x for 10x
    data, pairs ~ n^2/125 with only 25 nations x 5 segments of
    blocking); variant keys scale linearly with rows. Names are
    bounded-length (L~18), so the per-position substring loop is
    O(L^2) on a constant L — not the unbounded-document n-gram trap.
    Candidates are DISTINCT'd on the pair key before the single
    levenshtein verify per pair."""
    c = load_table(spark, sf_dir, "customer")
    clean = c.select(
        F.col("c_custkey").alias("clean_key"),
        "c_nationkey",
        "c_mktsegment",
        F.col("c_name").alias("c_name"),
    )
    dirty = c.filter("c_custkey % 7 = 0").select(
        F.col("c_custkey").alias("d_key"),
        "c_nationkey",
        "c_mktsegment",
        F.expr("substr(c_name, 1, 3) || substr(c_name, 5)").alias("d_name"),
    )

    def with_variants(df: DataFrame, name_col: str) -> DataFrame:
        # i = 0 keeps the string; i >= 1 deletes character i.
        # sequence(0, length) is never descending (length >= 0), and
        # the generator sits alone in its select item (no nesting).
        return df.select(
            "*",
            F.explode(
                F.sequence(F.lit(0), F.length(F.col(name_col)))
            ).alias("__i"),
        ).withColumn(
            "__variant",
            F.when(F.col("__i") == 0, F.col(name_col)).otherwise(
                F.concat(
                    F.expr(f"substr({name_col}, 1, __i - 1)"),
                    F.expr(f"substr({name_col}, __i + 1)"),
                )
            ),
        )

    cand = (
        with_variants(clean, "c_name")
        .join(
            with_variants(dirty, "d_name"),
            ["c_nationkey", "c_mktsegment", "__variant"],
        )
        .select("clean_key", "d_key", "c_name", "d_name")
        .distinct()
    )
    return cand.select(
        "clean_key",
        F.col("d_key").alias("dirty_key"),
        F.levenshtein("c_name", "d_name").cast("bigint").alias("dist"),
    ).filter(F.col("dist") <= 1)


# ---------------------------------------------------------------------------
# Rolling active users (DAU / trailing-7-day WAU)
# ---------------------------------------------------------------------------

DAU_WAU_ORACLE = """
WITH ud AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
), dau AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day
), ex AS (
  SELECT day + CAST(o AS INTEGER) AS rday, user_id
  FROM ud, unnest(range(0, 7)) AS u(o)
), wau AS (
  SELECT rday AS day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
  FROM ex GROUP BY rday
)
SELECT d.day, d.dau, w.wau FROM dau d JOIN wau w ON d.day = w.day
"""


@query("events_dau_wau", oracle=DAU_WAU_ORACLE, category="analytics")
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily and trailing-7-day distinct active users (the DAU/WAU
    board metric). Spark has no COUNT(DISTINCT) over a sliding frame;
    the scalable shape is: pre-reduce to distinct (user, day) pairs —
    the 100 TB move, collapsing raw events to at most users x days —
    then fan each pair out to the 7 report days it supports (narrow
    explode) and count distinct users per report day. The inner join
    with the DAU side drops trailing ghost days past the observed
    range. Both aggregations are exact; no HLL needed at this grain
    (user-days, not events)."""
    e = load_table(spark, sf_dir, "events")
    ud = e.select(F.to_date("ts").alias("day"), "user_id").distinct()
    dau = ud.groupBy("day").agg(F.count("*").cast("bigint").alias("dau"))
    ex = ud.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"), "day", "user_id"
    ).select(F.expr("date_add(day, off)").alias("day"), "user_id")
    wau = ex.groupBy("day").agg(
        F.countDistinct("user_id").cast("bigint").alias("wau")
    )
    return dau.join(wau, "day").select("day", "dau", "wau")


# ---------------------------------------------------------------------------
# Data drift monitor: Population Stability Index between two periods
# ---------------------------------------------------------------------------

_PSI_SPLIT = "2024-01-15 00:00:00"
_PSI_BINS = 10
_PSI_WIDTH = 50          # value in [0, 500) -> 10 fixed bins
_PSI_SMOOTH = 1          # add-one smoothing; denominator adds BINS

# Per-bin PSI term (p1-p2)*ln(p1/p2) with identical expression shape
# on both engines: the probabilities divide exact BIGINTs in double
# (deterministic per operand pair), the ln argument is ONE exact
# integer ratio, and each term floors to the 1e-9 grid before an exact
# BIGINT sum — the order-invariant ln-accumulation discipline
# text_bigram_lm_score pinned (Python-reference equality test).
_PSI_TERM = (
    "floor((((n1 + {S}) / (t1 + {S} * {B})) - ((n2 + {S}) / (t2 + {S} * {B})))"
    " * ln(((n1 + {S}) * (t2 + {S} * {B})) / ((n2 + {S}) * (t1 + {S} * {B})))"
    " * 1000000000)"
).format(S=_PSI_SMOOTH, B=_PSI_BINS)

DRIFT_PSI_ORACLE = f"""
WITH binned AS (
  SELECT event_type,
    CAST(least(floor(value / {_PSI_WIDTH}), {_PSI_BINS - 1}) AS BIGINT) AS bin,
    CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT}' THEN 1 ELSE 2 END AS period
  FROM events
), grid AS (
  SELECT t.event_type, b.bin
  FROM (SELECT DISTINCT event_type FROM events) t,
       (SELECT unnest(range(0, {_PSI_BINS})) AS bin) b
), counts AS (
  SELECT g.event_type, g.bin,
    CAST(COALESCE(SUM(CASE WHEN period = 1 THEN 1 END), 0) AS DOUBLE) AS n1,
    CAST(COALESCE(SUM(CASE WHEN period = 2 THEN 1 END), 0) AS DOUBLE) AS n2
  FROM grid g LEFT JOIN binned x
    ON x.event_type = g.event_type AND x.bin = g.bin
  GROUP BY g.event_type, g.bin
), tot AS (
  SELECT event_type, SUM(n1) AS t1, SUM(n2) AS t2 FROM counts GROUP BY event_type
)
SELECT c.event_type,
  CAST(t.t1 AS BIGINT) AS n_before,
  CAST(t.t2 AS BIGINT) AS n_after,
  CAST(SUM({_PSI_TERM}) AS BIGINT) AS psi_e9
FROM counts c JOIN tot t ON c.event_type = t.event_type
GROUP BY c.event_type, t.t1, t.t2
"""


@query("events_drift_psi", oracle=DRIFT_PSI_ORACLE, category="analytics")
def events_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type between two halves of
    the month — the standard production drift monitor for a feature
    distribution (PSI < 0.1 stable, > 0.25 action). Fixed bins with
    add-one smoothing keep every term finite on a dense
    (type x bin) grid (empty bins matter: they ARE drift). Each PSI
    term floors to the 1e-9 grid before an exact BIGINT sum, so the
    aggregate is order-invariant; probabilities and the single-ratio
    ln argument are computed with the identical expression shape on
    both engines. Scale: one map-side-combined count pass, a
    types x bins (tiny) grid join, algebraic rollup."""
    e = load_table(spark, sf_dir, "events")
    binned = e.select(
        "event_type",
        F.expr(f"CAST(least(floor(value / {_PSI_WIDTH}), {_PSI_BINS - 1}) AS BIGINT)").alias("bin"),
        F.expr(
            f"CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT}' THEN 1 ELSE 2 END"
        ).alias("period"),
    )
    grid = (
        e.select("event_type")
        .distinct()
        .crossJoin(
            e.sparkSession.range(_PSI_BINS).select(F.col("id").cast("bigint").alias("bin"))
        )
    )
    counts = (
        grid.join(binned, ["event_type", "bin"], "left")
        .groupBy("event_type", "bin")
        .agg(
            F.coalesce(F.sum(F.when(F.col("period") == 1, 1)), F.lit(0))
            .cast("double")
            .alias("n1"),
            F.coalesce(F.sum(F.when(F.col("period") == 2, 1)), F.lit(0))
            .cast("double")
            .alias("n2"),
        )
    )
    wt = Window.partitionBy("event_type")
    withtot = counts.withColumn("t1", F.sum("n1").over(wt)).withColumn(
        "t2", F.sum("n2").over(wt)
    )
    return withtot.groupBy("event_type").agg(
        F.max("t1").cast("bigint").alias("n_before"),
        F.max("t2").cast("bigint").alias("n_after"),
        F.sum(F.expr(_PSI_TERM)).cast("bigint").alias("psi_e9"),
    )


# ---------------------------------------------------------------------------
# Rate-based bot / abuse detection (burst profile per user)
# ---------------------------------------------------------------------------

_BURST_WINDOW_US = 3_600_000_000  # trailing 1 hour, in microseconds
_BURST_BOT = 3                    # >= this many events in-window -> flag

BOT_BURST_ORACLE = f"""
WITH w AS (
  SELECT user_id,
    COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
      RANGE BETWEEN {_BURST_WINDOW_US} PRECEDING AND CURRENT ROW) AS c
  FROM events
)
SELECT user_id,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(MAX(c) AS BIGINT) AS burst_max_1h,
  CAST(CASE WHEN MAX(c) >= {_BURST_BOT} THEN 1 ELSE 0 END AS INTEGER) AS is_flagged
FROM w GROUP BY user_id
"""


@query("events_bot_burst_detect", oracle=BOT_BURST_ORACLE, category="analytics")
def events_bot_burst_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-based abuse detection: each user's maximum trailing-1-hour
    event burst, flagged when it crosses the bot threshold — the
    rate-limit rule every ingestion pipeline screens with. The burst
    is an exact RANGE frame over epoch MICROseconds (epoch seconds
    would truncate sub-second spacing differently than DuckDB's
    fractional epoch — frames must bound identical row sets on both
    engines); RANGE frames are value-bounded, so tied timestamps get
    identical counts regardless of partition order. One user_id
    shuffle; per-user windows are account-history-sized, and a 100 TB
    deployment pre-buckets to (user, hour) counts first (the DAU/WAU
    pre-reduction) when sub-window precision isn't needed."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.expr("unix_micros(cast(ts AS timestamp))"))
        .rangeBetween(-_BURST_WINDOW_US, 0)
    )
    c = e.select("user_id", F.count("*").over(w).alias("c"))
    return c.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.max("c").cast("bigint").alias("burst_max_1h"),
        F.when(F.max("c") >= _BURST_BOT, 1).otherwise(0).cast("int").alias("is_flagged"),
    )


# ---------------------------------------------------------------------------
# Rolling median smoother (order statistic over a sliding frame)
# ---------------------------------------------------------------------------

ROLLING_MEDIAN_ORACLE = """
WITH base AS (
  SELECT event_id, event_type,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents, ts
  FROM events
), framed AS (
  SELECT event_id, event_type, cents,
    list(cents) OVER (PARTITION BY event_type ORDER BY ts, event_id
      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS frame
  FROM base
)
SELECT event_id, event_type, cents,
  CAST(list_sort(frame)[(len(frame) + 1) // 2] AS BIGINT)
    AS rolling_median_cents
FROM framed
"""


@query("events_rolling_median", oracle=ROLLING_MEDIAN_ORACLE, category="analytics")
def events_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median denoiser: each event's value smoothed by the
    exact median of its trailing-5-row frame per type — the
    outlier-robust smoothing a metrics pipeline applies before
    alerting (a rolling MEAN chases the spike; the median ignores
    it). Neither engine has a median window function with compatible
    interpolation, so both materialize the 5-element frame
    (collect_list over ROWS / list() OVER), sort it, and PICK the
    lower-median element — an exact integer-cents order statistic,
    no interpolation to drift. Short frames at partition starts take
    the same picked-rank rule. Scale: frame width is constant (5), so
    state per row is O(1); one event_type shuffle with a unique
    (ts, event_id) ordering."""
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
        "ts",
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    framed = base.withColumn("frame", F.collect_list("cents").over(w))
    return framed.select(
        "event_id",
        "event_type",
        "cents",
        F.expr("CAST(sort_array(frame)[CAST((size(frame) + 1) div 2 AS INT) - 1] AS BIGINT)")
        .alias("rolling_median_cents"),
    )


# ---------------------------------------------------------------------------
# User-flow path mining (top event-type trigrams)
# ---------------------------------------------------------------------------

PATH_TRIGRAM_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
    lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p1,
    lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p2
  FROM events
)
SELECT p2 || '>' || p1 || '>' || event_type AS path,
  CAST(COUNT(*) AS BIGINT) AS n
FROM seq WHERE p2 IS NOT NULL
GROUP BY p2 || '>' || p1 || '>' || event_type
ORDER BY n DESC, path
LIMIT 15
"""


@query("events_path_trigrams", oracle=PATH_TRIGRAM_ORACLE, category="analytics")
def events_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-flow path mining: the 15 most common 3-step event-type
    sequences across all users (the edges of a product-flow sankey /
    the candidate set for funnel design). Two lag windows over ONE
    user_id partitioning with the unique (ts, event_id) ordering, a
    path-string aggregate, TakeOrderedAndProject top-k. Generalizes
    `events_markov_transitions` (bigrams) one order higher — at
    100 TB the trigram key space stays tiny (|event types|^3), so the
    aggregate combines map-side into almost nothing."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    )
    return (
        seq.filter(F.col("p2").isNotNull())
        .select(
            F.concat_ws(">", "p2", "p1", "event_type").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# Cross-table amount reconciliation (fact-to-fact audit)
# ---------------------------------------------------------------------------

RECONCILE_ORACLE = """
WITH li AS (
  SELECT l_orderkey,
    CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      AS li_cents
  FROM lineitem GROUP BY l_orderkey
), o AS (
  SELECT o_orderkey, o_orderstatus,
    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS o_cents
  FROM orders
), j AS (
  SELECT o.o_orderstatus,
    CASE WHEN li.l_orderkey IS NULL THEN 'no_lineitems'
         WHEN li.li_cents = o.o_cents THEN 'exact'
         ELSE 'mismatch' END AS status,
    COALESCE(abs(li.li_cents - o.o_cents), 0) AS adiff
  FROM o LEFT JOIN li ON o.o_orderkey = li.l_orderkey
)
SELECT o_orderstatus, status,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(adiff) AS BIGINT) AS total_abs_diff_cents
FROM j GROUP BY o_orderstatus, status
"""


@query("dq_reconcile_amounts", oracle=RECONCILE_ORACLE, category="governance")
def dq_reconcile_amounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact amount reconciliation: per order, does the
    lineitem extendedprice total match the order header's total? The
    migration/replication audit every finance pipeline runs
    (`table_checksum` proves table identity; this localizes WHERE two
    related tables disagree). Exact integer cents on both sides, a
    single orderkey-partitioned aggregate + left join, and the
    per-(status, class) rollup with the total absolute discrepancy —
    at 100 TB both sides pre-aggregate before the join, so the
    shuffle carries one row per order, not per lineitem."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
            )
            .cast("bigint")
            .alias("li_cents")
        )
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint").alias("o_cents"),
    )
    j = o.join(li, o.o_orderkey == li.l_orderkey, "left").select(
        "o_orderstatus",
        F.when(F.col("l_orderkey").isNull(), "no_lineitems")
        .when(F.col("li_cents") == F.col("o_cents"), "exact")
        .otherwise("mismatch")
        .alias("status"),
        F.coalesce(F.abs(F.col("li_cents") - F.col("o_cents")), F.lit(0)).alias("adiff"),
    )
    return j.groupBy("o_orderstatus", "status").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("adiff").cast("bigint").alias("total_abs_diff_cents"),
    )


# ---------------------------------------------------------------------------
# Change-point detection: CUSUM on daily event rates
# ---------------------------------------------------------------------------

# Deviation from the per-type mean daily count, kept EXACT by scaling
# through: dev_day = n_day * D - N (D = days observed for the type,
# N = total events of the type), so sum over any prefix is integer and
# the running CUSUM needs no division anywhere.
CUSUM_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), tot AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS d_days,
    CAST(SUM(n) AS BIGINT) AS n_total
  FROM daily GROUP BY event_type
), cum AS (
  SELECT d.event_type, d.day,
    CAST(SUM(d.n * t.d_days - t.n_total) OVER (
      PARTITION BY d.event_type ORDER BY d.day
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cusum_scaled
  FROM daily d JOIN tot t ON d.event_type = t.event_type
), ranked AS (
  SELECT event_type, day, cusum_scaled,
    row_number() OVER (PARTITION BY event_type
      ORDER BY abs(cusum_scaled) DESC, day) AS rn
  FROM cum
)
SELECT event_type, CAST(day AS DATE) AS shift_day,
  cusum_scaled AS peak_cusum_scaled,
  CAST(CASE WHEN cusum_scaled >= 0 THEN 1 ELSE -1 END AS INTEGER) AS direction
FROM ranked WHERE rn = 1
"""


@query("events_cusum_shift", oracle=CUSUM_ORACLE, category="analytics")
def events_cusum_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection on daily event rates: the running
    sum of deviations from the period mean peaks (in absolute value)
    at the most likely rate-shift day — the classic single-change-point
    estimator, and the op a metrics platform runs behind "did traffic
    step-change, and when?". The mean never becomes a double: deviations
    scale through by the day count (n*D - N), so the whole CUSUM path
    is exact BIGINT and the argmax day is deterministic (unique day
    tie-break). Scale: daily pre-aggregation first (the 100 TB
    reduction — the window runs over days-per-type, never events);
    one type-partitioned window."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("bigint").alias("n"))
    tot = daily.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("d_days"),
        F.sum("n").cast("bigint").alias("n_total"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        daily.join(F.broadcast(tot), "event_type")
        .withColumn(
            "cusum_scaled",
            F.sum(
                F.col("n") * F.col("d_days") - F.col("n_total")
            ).over(w).cast("bigint"),
        )
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.desc(F.abs(F.col("cusum_scaled"))), "day"
    )
    return (
        cum.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").cast("date").alias("shift_day"),
            F.col("cusum_scaled").alias("peak_cusum_scaled"),
            F.when(F.col("cusum_scaled") >= 0, 1).otherwise(-1).cast("int").alias("direction"),
        )
    )


# ---------------------------------------------------------------------------
# Percent-of-parent contribution (BI hierarchy share)
# ---------------------------------------------------------------------------

SHARE_ORACLE = """
WITH rev AS (
  SELECT r.r_name AS region, n.n_name AS nation,
    CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      AS cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, n.n_name
), tot AS (
  SELECT region, CAST(SUM(cents) AS BIGINT) AS region_cents
  FROM rev GROUP BY region
)
SELECT rev.region, rev.nation, rev.cents, tot.region_cents,
  CAST(CAST(rev.cents AS HUGEINT) * 1000000 // tot.region_cents AS BIGINT)
    AS share_ppm
FROM rev JOIN tot ON rev.region = tot.region
"""


@query("revenue_share_of_region", oracle=SHARE_ORACLE, category="analytics")
def revenue_share_of_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent contribution: each nation's share of its
    region's revenue — the BI drill-down ratio behind every treemap.
    Revenue is exact integer cents and the share is integer ppm
    (cents*1e6 div region_cents, with the product in
    DECIMAL(38,0)/HUGEINT — a 100 TB region's revenue is ~1e16 cents,
    so the int64 product dies while the ppm quotient always fits) so
    both engines agree at every boundary; only the fixed-cardinality
    nation/region dims are hinted (customer is SF-scaled — AQE picks
    its strategy), one fact aggregation, then a groups-sized
    self-aggregate join (no window over the fact)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    tot = rev.groupBy("region").agg(
        F.sum("cents").cast("bigint").alias("region_cents")
    )
    return rev.join(tot, "region").select(
        "region",
        "nation",
        "cents",
        "region_cents",
        F.expr("CAST(cents AS DECIMAL(38,0)) * 1000000 div region_cents")
        .cast("bigint")
        .alias("share_ppm"),
    )


_SKY_SPAN = 1000  # cents per bucket: bucket count = price DOMAIN / span

SKYLINE_ORACLE = """
WITH p AS (
  SELECT p_partkey,
    CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents,
    CAST(p_size AS BIGINT) AS psize
  FROM part
), w AS (
  SELECT p_partkey, price_cents, psize,
    MAX(psize) OVER (ORDER BY price_cents
      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_lt,
    MAX(psize) OVER (ORDER BY price_cents
      RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS max_eq
  FROM p
)
SELECT p_partkey, price_cents, psize,
  psize > COALESCE(max_lt, -1) AND psize = max_eq AS on_frontier
FROM w
"""


@query("skyline_parts_frontier", oracle=SKYLINE_ORACLE, category="analytics")
def skyline_parts_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) classification: flag every part
    that is NOT dominated on (cheaper price, larger size) — the
    "best tradeoff" operator behind product recommendations and
    multi-objective candidate pruning.

    The oracle states the textbook global-window form. The Spark plan
    is the SCALE-SAFE two-phase shape instead (a global ORDER BY
    window is one task at 100 TB): per-bucket maxima (map-side
    combined groupBy over cents DIV span; bucket count = price
    DOMAIN / span, bounded by the value range, not the row count) are
    collected and prefix-maxed on the driver (bounded-literal
    precedent), then re-broadcast so each row needs only its bucket's
    base plus a WITHIN-bucket running max — window parallelism =
    bucket count. Frame semantics: RANGE ... 1 PRECEDING = strictly
    cheaper, RANGE CURRENT ROW = price peers; a row is on the
    frontier iff it beats every strictly-cheaper size and is the max
    of its price group (identical twins stay, per skyline
    convention). Both windows share one (bucket, cents) sort."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("price_cents"),
        F.col("p_size").cast("bigint").alias("psize"),
    ).withColumn("__bkt", F.expr(f"price_cents DIV {_SKY_SPAN}"))

    bmax = (
        p.groupBy("__bkt").agg(F.max("psize").alias("m")).collect()
    )
    run, bases = -1, []
    for r in sorted(bmax, key=lambda r: r["__bkt"]):
        bases.append((r["__bkt"], run))  # max over strictly earlier buckets
        run = max(run, r["m"])
    base_df = spark.createDataFrame(bases, schema="__bkt bigint, base bigint")

    w_lt = (
        Window.partitionBy("__bkt")
        .orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_eq = (
        Window.partitionBy("__bkt")
        .orderBy("price_cents")
        .rangeBetween(Window.currentRow, Window.currentRow)
    )
    flagged = (
        p.join(F.broadcast(base_df), "__bkt")
        .withColumn(
            "max_lt",
            F.greatest(F.coalesce(F.max("psize").over(w_lt), F.lit(-1)), "base"),
        )
        .withColumn("max_eq", F.max("psize").over(w_eq))
    )
    return flagged.select(
        "p_partkey",
        "price_cents",
        "psize",
        (
            (F.col("psize") > F.col("max_lt"))
            & (F.col("psize") == F.col("max_eq"))
        ).alias("on_frontier"),
    )


_AR_MINSUP = 2
_AR_TOPK = 50

ASSOC_ORACLE = f"""
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_baskets FROM orders),
ic AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_item FROM b GROUP BY l_partkey),
pc AS (
  SELECT a.l_partkey AS pa, b2.l_partkey AS pb, CAST(COUNT(*) AS BIGINT) AS n_pair
  FROM b a JOIN b b2
    ON a.l_orderkey = b2.l_orderkey AND a.l_partkey < b2.l_partkey
  GROUP BY a.l_partkey, b2.l_partkey
  HAVING COUNT(*) >= {_AR_MINSUP}
),
rules AS (
  SELECT pa AS antecedent, pb AS consequent, n_pair FROM pc
  UNION ALL
  SELECT pb AS antecedent, pa AS consequent, n_pair FROM pc
),
scored AS (
  SELECT r.antecedent, r.consequent, r.n_pair,
    CAST((r.n_pair * 1000000) // ia.n_item AS BIGINT) AS conf_ppm,
    CAST(floor(CAST(r.n_pair AS DOUBLE) * t.n_baskets
               / ia.n_item / ic2.n_item * 1000000) AS BIGINT) AS lift_ppm
  FROM rules r
  JOIN ic ia ON r.antecedent = ia.l_partkey
  JOIN ic ic2 ON r.consequent = ic2.l_partkey
  CROSS JOIN t
)
SELECT antecedent, consequent, n_pair, conf_ppm, lift_ppm
FROM scored
ORDER BY lift_ppm DESC, antecedent, consequent
LIMIT {_AR_TOPK}
"""


@query("basket_association_rules", oracle=ASSOC_ORACLE, category="analytics")
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets: for every
    co-purchased part pair above minimum support, both directed rules
    with exact-integer support/confidence (ppm via integer division —
    no doubles in the keyed math) and floor-pinned lift (the one
    division chain that must stay double is a fixed IEEE expression
    tree, identical in both engines; the integer product n_pair *
    n_baskets * 1e6 would overflow int64 at 100 TB, so the double
    form IS the scale-correct one). Top-50 by (lift, antecedent,
    consequent) — unique tie-break, TakeOrdered, never a global sort.

    Scale: baskets are bounded (TPC-H orders hold <= 7 lines; real
    basket data is capped upstream), so pair generation is IN-ARRAY —
    one groupBy collapses each order to its sorted distinct item set,
    and a nested-transform explode emits the a<b pairs per basket
    (O(basket^2) per order, linear in orders) with NO self-join and
    no second corpus shuffle. Counts are map-side combined; the
    item-count joins run on the already-aggregated pair frame."""
    from pyspark import StorageLevel

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = load_table(spark, sf_dir, "orders")
    # one shuffle to basket grain; read twice (pairs + item counts)
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("items"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_baskets = o.agg(F.count(F.lit(1)).alias("n_baskets"))
    ic = baskets.select(F.explode("items").alias("l_partkey")).groupBy(
        "l_partkey"
    ).agg(F.count(F.lit(1)).alias("n_item"))
    # sorted array + j > i slice => pa < pb by construction
    pc = (
        baskets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        "items",
                        # length = size(items): slice clamps to the array
                        # end, so every j > i partner is emitted — a
                        # literal cap here would silently undercount
                        # pairs for baskets wider than the cap ("no
                        # silent caps"); size() is O(1) per element.
                        lambda a, i: F.transform(
                            F.slice("items", i + 2, F.size("items")),
                            lambda pb: F.struct(a.alias("pa"), pb.alias("pb")),
                        ),
                    )
                )
            ).alias("pr")
        )
        .groupBy(F.col("pr.pa").alias("pa"), F.col("pr.pb").alias("pb"))
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= _AR_MINSUP)
    )
    rules = pc.select(
        F.col("pa").alias("antecedent"), F.col("pb").alias("consequent"), "n_pair"
    ).unionAll(
        pc.select(
            F.col("pb").alias("antecedent"), F.col("pa").alias("consequent"), "n_pair"
        )
    )
    ia = ic.select(F.col("l_partkey").alias("antecedent"), F.col("n_item").alias("n_a"))
    icn = ic.select(F.col("l_partkey").alias("consequent"), F.col("n_item").alias("n_c"))
    scored = (
        rules.join(ia, "antecedent")
        .join(icn, "consequent")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            "n_pair",
            F.expr("(n_pair * 1000000) DIV n_a").cast("bigint").alias("conf_ppm"),
            F.floor(
                F.col("n_pair").cast("double")
                * F.col("n_baskets")
                / F.col("n_a")
                / F.col("n_c")
                * 1000000
            )
            .cast("bigint")
            .alias("lift_ppm"),
        )
    )
    return scored.orderBy(
        F.col("lift_ppm").desc(), "antecedent", "consequent"
    ).limit(_AR_TOPK)


LINEAR_ATTR_ORACLE = """
WITH ev AS (
  SELECT user_id, event_id, ts, event_type,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
    COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seg
  FROM events
  WHERE event_type <> 'error'
), touches AS (
  SELECT user_id, seg, event_type AS channel FROM ev
  WHERE event_type <> 'purchase'
), seg_n AS (
  SELECT user_id, seg, CAST(COUNT(*) AS BIGINT) AS n FROM touches
  GROUP BY user_id, seg
), chan_cnt AS (
  SELECT user_id, seg, channel, CAST(COUNT(*) AS BIGINT) AS cnt FROM touches
  GROUP BY user_id, seg, channel
), purchases AS (
  SELECT user_id, seg, cents FROM ev WHERE event_type = 'purchase'
), credited AS (
  SELECT c.channel, c.cnt,
    c.cnt * ((p.cents * 1000000) // s.n) AS credit_micro
  FROM purchases p
  JOIN seg_n s ON p.user_id = s.user_id AND p.seg = s.seg
  JOIN chan_cnt c ON p.user_id = c.user_id AND p.seg = c.seg
), direct AS (
  SELECT 'direct' AS channel, CAST(COUNT(*) AS BIGINT) AS n_credits,
    CAST(SUM(p.cents) * 1000000 AS BIGINT) AS credit_micro
  FROM purchases p LEFT JOIN seg_n s
    ON p.user_id = s.user_id AND p.seg = s.seg
  WHERE s.n IS NULL
)
SELECT channel, CAST(SUM(cnt) AS BIGINT) AS n_credits,
  CAST(SUM(credit_micro) AS BIGINT) AS credit_micro
FROM credited GROUP BY channel
UNION ALL
SELECT channel, n_credits, credit_micro FROM direct
"""


@query(
    "events_attribution_linear", oracle=LINEAR_ATTR_ORACLE, category="analytics"
)
def events_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase's revenue is
    split EQUALLY across every touch (view/click/signup) since the
    user's previous purchase — the multi-touch complement of
    events_attribution_last_touch. Conversion segments come from one
    user-partitioned window (count of purchases strictly before, so
    touches attach to their NEXT purchase); per-touch credit is
    floor(cents * 1e6 / n) micro-cents, exact integer math (the
    unallocated floor remainder is by-design). Purchases with no
    preceding touch roll up as 'direct' at full value.

    Scale: one shuffle on user_id for the window; the credit joins
    run at (user, segment) grain — already aggregated, purchases-
    sized, never event-sized fan-out."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") != "error"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ev = e.select(
        "user_id",
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
        F.coalesce(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).over(w),
            F.lit(0),
        ).alias("seg"),
    )
    touches = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", "seg", F.col("event_type").alias("channel")
    )
    seg_n = touches.groupBy("user_id", "seg").agg(F.count(F.lit(1)).alias("n"))
    chan_cnt = touches.groupBy("user_id", "seg", "channel").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "seg", "cents"
    )
    credited = (
        purchases.join(seg_n, ["user_id", "seg"])
        .join(chan_cnt, ["user_id", "seg"])
        .select(
            "channel",
            "cnt",
            (F.col("cnt") * F.expr("(cents * 1000000) DIV n")).alias(
                "credit_micro"
            ),
        )
        .groupBy("channel")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_credits"),
            F.sum("credit_micro").cast("bigint").alias("credit_micro"),
        )
    )
    direct = (
        purchases.join(seg_n, ["user_id", "seg"], "left")
        .filter(F.col("n").isNull())
        .agg(
            F.lit("direct").alias("channel"),
            F.count(F.lit(1)).alias("n_credits"),
            (F.sum("cents") * 1000000).cast("bigint").alias("credit_micro"),
        )
    )
    return credited.unionAll(direct)


# Selectivity-estimation demo: a 21-bin equi-width histogram on exact
# integer cents, probed with a deliberately bin-UNALIGNED range so the
# boundary interpolation (the uniform-within-bin assumption every
# optimizer makes) is visible against the true count.
_SEL_BIN_CENTS = 2_500_000            # 25k in cents
_SEL_LO_CENTS = 3_100_000             # 31k — cuts bin 1 mid-way
_SEL_HI_CENTS = 21_700_000            # 217k — cuts bin 8 mid-way

HIST_SELECTIVITY_ORACLE = f"""
WITH c AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders
), h AS (
  SELECT CAST(least(cents // {_SEL_BIN_CENTS}, 20) AS BIGINT) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM c GROUP BY 1
), parts AS (
  SELECT bin, n,
    CASE WHEN bin * {_SEL_BIN_CENTS} >= {_SEL_LO_CENTS}
          AND (bin + 1) * {_SEL_BIN_CENTS} <= {_SEL_HI_CENTS} THEN n
         WHEN (bin + 1) * {_SEL_BIN_CENTS} <= {_SEL_LO_CENTS}
           OR bin * {_SEL_BIN_CENTS} >= {_SEL_HI_CENTS} THEN 0
         ELSE (n * (least((bin + 1) * {_SEL_BIN_CENTS}, {_SEL_HI_CENTS})
                    - greatest(bin * {_SEL_BIN_CENTS}, {_SEL_LO_CENTS})))
              // {_SEL_BIN_CENTS}
    END AS contrib
  FROM h WHERE bin < 20
), est AS (
  SELECT CAST(SUM(contrib) AS BIGINT) AS est_rows FROM parts
), truth AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS true_rows FROM c
  WHERE cents >= {_SEL_LO_CENTS} AND cents < {_SEL_HI_CENTS}
)
SELECT est.est_rows, truth.true_rows,
  est.est_rows - truth.true_rows AS err_rows
FROM est, truth
"""


@query(
    "hist_range_selectivity", oracle=HIST_SELECTIVITY_ORACLE, category="analytics"
)
def hist_range_selectivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-based range-selectivity estimation (the optimizer's
    cardinality model, made inspectable): a 21-bin equi-width
    histogram over exact order-total cents answers a bin-UNALIGNED
    range predicate by summing interior bins and linearly
    interpolating the two boundary bins — entirely in integer
    arithmetic (overlap_width * n DIV bin_width). The true count runs
    alongside so the uniform-within-bin error is visible.

    Scale: the histogram is one map-side-combined aggregate (21 rows
    out regardless of input); estimation is constant-size math. The
    companion sketch_join_cardinality covers join sizes; this covers
    range predicates."""
    o = load_table(spark, sf_dir, "orders")
    c = o.select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint").alias("cents")
    )
    h = (
        c.select(
            F.least(F.expr(f"cents DIV {_SEL_BIN_CENTS}"), F.lit(20))
            .cast("bigint")
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("bin") < 20)
    )
    lo, hi, w = _SEL_LO_CENTS, _SEL_HI_CENTS, _SEL_BIN_CENTS
    contrib = (
        F.when(
            (F.col("bin") * w >= lo) & ((F.col("bin") + 1) * w <= hi), F.col("n")
        )
        .when(((F.col("bin") + 1) * w <= lo) | (F.col("bin") * w >= hi), F.lit(0))
        .otherwise(
            F.expr(
                f"(n * (least((bin + 1) * {w}, {hi})"
                f" - greatest(bin * {w}, {lo}))) DIV {w}"
            )
        )
    )
    est = h.select(contrib.alias("contrib")).agg(
        F.sum("contrib").cast("bigint").alias("est_rows")
    )
    truth = c.filter((F.col("cents") >= lo) & (F.col("cents") < hi)).agg(
        F.count(F.lit(1)).alias("true_rows")
    )
    return est.crossJoin(F.broadcast(truth)).select(
        "est_rows",
        "true_rows",
        (F.col("est_rows") - F.col("true_rows")).alias("err_rows"),
    )


_TTC_BUCKET_US = 1_800_000_000  # 30 minutes in microseconds
_TTC_CAP = 48                   # cap at 24h

TTC_ORACLE = f"""
WITH per_user AS (
  SELECT user_id,
    MIN(CASE WHEN event_type IN ('view', 'click', 'signup')
             THEN epoch_us(ts) END) AS first_touch_us,
    MIN(CASE WHEN event_type = 'purchase'
             THEN epoch_us(ts) END) AS first_purchase_us
  FROM events GROUP BY user_id
), lat AS (
  SELECT user_id,
    (first_purchase_us - first_touch_us) AS lat_us
  FROM per_user
  WHERE first_touch_us IS NOT NULL AND first_purchase_us IS NOT NULL
    AND first_purchase_us >= first_touch_us
)
SELECT CAST(least(lat_us // {_TTC_BUCKET_US}, {_TTC_CAP}) AS BIGINT)
    AS bucket_30m,
  CAST(COUNT(*) AS BIGINT) AS n_users,
  CAST(MIN(lat_us) AS BIGINT) AS min_lat_us,
  CAST(MAX(lat_us) AS BIGINT) AS max_lat_us
FROM lat
GROUP BY least(lat_us // {_TTC_BUCKET_US}, {_TTC_CAP})
"""


@query("events_time_to_conversion", oracle=TTC_ORACLE, category="analytics")
def events_time_to_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-conversion distribution: latency from each user's FIRST
    touch (view/click/signup) to their FIRST purchase, bucketed into
    30-minute bins capped at 24h — the funnel-latency histogram
    growth teams read daily. All arithmetic in exact epoch
    MICROseconds (the bot-burst discipline: epoch seconds would be
    fractional doubles) with integer DIV bucketing.

    Scale: one map-side-combined per-user aggregate (two conditional
    MINs — never a window), then a constant-size bucket rollup."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(
            F.when(
                F.col("event_type").isin("view", "click", "signup"),
                F.expr("unix_micros(cast(ts AS timestamp))"),
            )
        ).alias("first_touch_us"),
        F.min(
            F.when(
                F.col("event_type") == "purchase",
                F.expr("unix_micros(cast(ts AS timestamp))"),
            )
        ).alias("first_purchase_us"),
    )
    lat = per_user.filter(
        F.col("first_touch_us").isNotNull()
        & F.col("first_purchase_us").isNotNull()
        & (F.col("first_purchase_us") >= F.col("first_touch_us"))
    ).select(
        (F.col("first_purchase_us") - F.col("first_touch_us")).alias("lat_us")
    )
    return (
        lat.groupBy(
            F.least(
                F.expr(f"lat_us DIV {_TTC_BUCKET_US}"), F.lit(_TTC_CAP)
            )
            .cast("bigint")
            .alias("bucket_30m")
        )
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.min("lat_us").cast("bigint").alias("min_lat_us"),
            F.max("lat_us").cast("bigint").alias("max_lat_us"),
        )
    )


ROLLING_CORR_ORACLE = """
WITH v AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
  FROM events WHERE event_type = 'view' GROUP BY CAST(ts AS DATE)
), p AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
  FROM events WHERE event_type = 'purchase' GROUP BY CAST(ts AS DATE)
), d AS (
  SELECT COALESCE(v.day, p.day) AS day,
    COALESCE(v.x, 0) AS x, COALESCE(p.y, 0) AS y
  FROM v FULL OUTER JOIN p ON v.day = p.day
), w AS (
  SELECT day, x, y,
    CAST(COUNT(*) OVER win AS BIGINT) AS n,
    CAST(SUM(x) OVER win AS BIGINT) AS sx,
    CAST(SUM(y) OVER win AS BIGINT) AS sy,
    CAST(SUM(x * y) OVER win AS BIGINT) AS sxy,
    CAST(SUM(x * x) OVER win AS BIGINT) AS sxx,
    CAST(SUM(y * y) OVER win AS BIGINT) AS syy
  FROM d
  WINDOW win AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT day, x, y, n,
  CAST(n * sxy - sx * sy AS BIGINT) AS corr_num,
  CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
       THEN CAST(floor(
         CAST(n * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
            * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
         * 1000000) AS BIGINT)
  END AS corr_ppm
FROM w WHERE n = 7
"""


@query("events_rolling_correlation", oracle=ROLLING_CORR_ORACLE, category="analytics")
def events_rolling_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling Pearson correlation between daily view and
    purchase volumes — the co-movement monitor behind funnel-health
    dashboards. All window sums are exact BIGINTs over the DAILY
    aggregate (rows bounded by the calendar, not the data volume, so
    the single ordered window is domain-bounded by construction); the
    one unavoidable double — num / (sqrt(denx) * sqrt(deny)) — is a
    fixed IEEE expression over exact integers, floor-pinned at ppm.
    The two variance terms are cast to DOUBLE and square-rooted
    SEPARATELY so no denx*deny BIGINT product (daily_count^4 — over
    2^63 once daily counts reach ~1e4) is ever formed; the remaining
    integer terms (n*sxx etc., daily_count^2-scale) stay exact to
    ~1.1e9 events/day. Degenerate (zero-variance) windows emit
    NULL."""
    e = load_table(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").groupBy(
        F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    p = e.filter(F.col("event_type") == "purchase").groupBy(
        F.col("ts").cast("date").alias("day2")
    ).agg(F.count(F.lit(1)).alias("y"))
    d = v.join(p, v.day == p.day2, "full").select(
        F.coalesce("day", "day2").alias("day"),
        F.coalesce("x", F.lit(0)).alias("x"),
        F.coalesce("y", F.lit(0)).alias("y"),
    )
    win = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    w = d.select(
        "day",
        "x",
        "y",
        F.count(F.lit(1)).over(win).cast("bigint").alias("n"),
        F.sum("x").over(win).cast("bigint").alias("sx"),
        F.sum("y").over(win).cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(win).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(win).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(win).cast("bigint").alias("syy"),
    ).filter(F.col("n") == 7)
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return w.select(
        "day",
        "x",
        "y",
        "n",
        num.cast("bigint").alias("corr_num"),
        F.when(
            (denx > 0) & (deny > 0),
            F.floor(
                num.cast("double")
                / (F.sqrt(denx.cast("double")) * F.sqrt(deny.cast("double")))
                * 1000000
            ).cast("bigint"),
        ).alias("corr_ppm"),
    )


COHORT_LTV_ORACLE = """
WITH firsts AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
), rev AS (
  SELECT f.cohort_week,
    CAST(datediff('day', f.cohort_week, date_trunc('week', e.ts)) // 7 AS BIGINT)
      AS week_offset,
    CAST(SUM(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events e JOIN firsts f ON e.user_id = f.user_id
  WHERE e.event_type = 'purchase'
  GROUP BY f.cohort_week,
    datediff('day', f.cohort_week, date_trunc('week', e.ts)) // 7
), sized AS (
  SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS n_buyers FROM firsts
  GROUP BY cohort_week
)
SELECT CAST(r.cohort_week AS DATE) AS cohort_week, r.week_offset,
  r.cents AS week_cents,
  CAST(SUM(r.cents) OVER (PARTITION BY r.cohort_week ORDER BY r.week_offset
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS cum_cents,
  s.n_buyers,
  CAST(CAST(SUM(r.cents) OVER (PARTITION BY r.cohort_week ORDER BY r.week_offset
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    // s.n_buyers AS BIGINT) AS ltv_cents_per_buyer
FROM rev r JOIN sized s ON r.cohort_week = s.cohort_week
"""


@query("cohort_ltv_curve", oracle=COHORT_LTV_ORACLE, category="analytics")
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves — the revenue companion to the
    retention triangle: buyers cohort by the week of their FIRST
    purchase; each (cohort, week-offset) cell carries that week's
    exact purchase cents, the running cumulative, and cumulative LTV
    per buyer (integer DIV). The table every growth model reads to
    project payback windows.

    Scale: first-purchase frame is buyers-sized; the revenue rollup
    pre-aggregates to (cohort, offset) grain BEFORE the cumulative
    window, so the window runs over the cohort-calendar grid (domain-
    bounded), never over purchases."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    firsts = purchases.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    rev = (
        purchases.join(firsts, "user_id")
        .select(
            "cohort_week",
            F.expr(
                "CAST(datediff(date_trunc('week', ts), cohort_week) DIV 7"
                " AS BIGINT)"
            ).alias("week_offset"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("c"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.sum("c").cast("bigint").alias("week_cents"))
    )
    sized = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_buyers")
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        rev.join(sized, "cohort_week")
        .select(
            F.col("cohort_week").cast("date").alias("cohort_week"),
            "week_offset",
            "week_cents",
            F.sum("week_cents").over(w).cast("bigint").alias("cum_cents"),
            "n_buyers",
        )
        .withColumn(
            "ltv_cents_per_buyer",
            F.expr("cum_cents DIV n_buyers").cast("bigint"),
        )
    )
