"""Data-governance queries: a Glue-Data-Quality-style expectation
suite and an SCD Type 2 dimension build.

Both are declarative single-pipeline shapes: the DQ suite computes
every rule metric in ONE pass over each table (conditional
aggregation — no per-rule scans), and the SCD2 build derives validity
intervals from a change feed with two window functions over one
shuffle. Oracles mirror the exact SQL semantics, so both are
hash-checked end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import query

# Thresholds are part of the rule definitions (metric >= threshold
# passes). All metrics are exact-integer ratios — count/count division
# of identical BIGINTs is bit-identical across engines, no rounding.
_DQ_RULES = (
    ("completeness_o_custkey", 1.0),
    ("uniqueness_o_orderkey", 1.0),
    ("referential_orders_customer", 1.0),
    ("range_o_totalprice_0_1m", 0.99),
    ("set_o_orderstatus", 1.0),
    ("range_c_acctbal_min", 0.95),
)

DQ_ORACLE = """
WITH o AS (
  SELECT
    CAST(COUNT(*) AS DOUBLE) AS n,
    CAST(COUNT(o_custkey) AS DOUBLE) AS n_custkey,
    CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE) AS n_uniq,
    CAST(SUM(CASE WHEN o_totalprice > 0 AND o_totalprice < 1000000
                  THEN 1 ELSE 0 END) AS DOUBLE) AS n_range,
    CAST(SUM(CASE WHEN o_orderstatus IN ('F', 'O', 'P')
                  THEN 1 ELSE 0 END) AS DOUBLE) AS n_status
  FROM orders
), ri AS (
  SELECT CAST(SUM(CASE WHEN c.c_custkey IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
           AS n_matched
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
), c AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS cn,
    CAST(SUM(CASE WHEN c_acctbal >= -1000 THEN 1 ELSE 0 END) AS DOUBLE)
      AS cn_bal
  FROM customer
), metrics AS (
  SELECT rule, metric, threshold FROM (
    SELECT
      o.n_custkey / o.n AS completeness_o_custkey,
      o.n_uniq / o.n AS uniqueness_o_orderkey,
      ri.n_matched / o.n AS referential_orders_customer,
      o.n_range / o.n AS range_o_totalprice_0_1m,
      o.n_status / o.n AS set_o_orderstatus,
      c.cn_bal / c.cn AS range_c_acctbal_min
    FROM o, ri, c
  ) UNPIVOT (metric FOR rule IN (
    completeness_o_custkey, uniqueness_o_orderkey,
    referential_orders_customer, range_o_totalprice_0_1m,
    set_o_orderstatus, range_c_acctbal_min))
  JOIN (VALUES
    ('completeness_o_custkey', 1.0), ('uniqueness_o_orderkey', 1.0),
    ('referential_orders_customer', 1.0), ('range_o_totalprice_0_1m', 0.99),
    ('set_o_orderstatus', 1.0), ('range_c_acctbal_min', 0.95)
  ) t(rule, threshold) USING (rule)
)
SELECT rule, metric, CAST(threshold AS DOUBLE) AS threshold,
  metric >= threshold AS passed
FROM metrics
"""


@query("dq_expectations", oracle=DQ_ORACLE, category="governance")
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite (the Glue Data Quality / DQDL
    shape: Completeness, Uniqueness, ReferentialIntegrity,
    ColumnValues-in-range, ColumnValues-in-set): every orders-side
    rule metric comes from ONE conditional-aggregation pass, the
    referential check from one left join against the (broadcastable)
    customer keys, and the tall (rule, metric, threshold, passed)
    report from stack() — rules never fan out into per-rule scans, so
    the suite costs two scans total at any data size."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    o = orders.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.count("o_custkey").cast("double").alias("n_custkey"),
        F.countDistinct("o_orderkey").cast("double").alias("n_uniq"),
        F.sum(
            F.when((F.col("o_totalprice") > 0) & (F.col("o_totalprice") < 1000000), 1)
            .otherwise(0)
        ).cast("double").alias("n_range"),
        F.sum(
            F.when(F.col("o_orderstatus").isin("F", "O", "P"), 1).otherwise(0)
        ).cast("double").alias("n_status"),
    )
    ri = (
        orders.join(
            customer.select("c_custkey"),
            orders["o_custkey"] == F.col("c_custkey"),
            "left",
        )
        .agg(
            F.sum(F.when(F.col("c_custkey").isNotNull(), 1).otherwise(0))
            .cast("double")
            .alias("n_matched")
        )
    )
    c = customer.agg(
        F.count(F.lit(1)).cast("double").alias("cn"),
        F.sum(F.when(F.col("c_acctbal") >= -1000, 1).otherwise(0))
        .cast("double")
        .alias("cn_bal"),
    )
    wide = (
        o.crossJoin(ri)
        .crossJoin(c)
        .select(
            (F.col("n_custkey") / F.col("n")).alias("completeness_o_custkey"),
            (F.col("n_uniq") / F.col("n")).alias("uniqueness_o_orderkey"),
            (F.col("n_matched") / F.col("n")).alias("referential_orders_customer"),
            (F.col("n_range") / F.col("n")).alias("range_o_totalprice_0_1m"),
            (F.col("n_status") / F.col("n")).alias("set_o_orderstatus"),
            (F.col("cn_bal") / F.col("cn")).alias("range_c_acctbal_min"),
        )
    )
    stack_expr = "stack({}, {}) AS (rule, metric, threshold)".format(
        len(_DQ_RULES),
        ", ".join(f"'{r}', {r}, CAST({t} AS DOUBLE)" for r, t in _DQ_RULES),
    )
    tall = wide.selectExpr(stack_expr)
    return tall.select(
        "rule", "metric", "threshold",
        (F.col("metric") >= F.col("threshold")).alias("passed"),
    )


SCD2_ORACLE = """
WITH feed AS (
  SELECT o_custkey AS custkey, o_orderdate AS eff_ts,
         o_orderpriority AS priority, o_orderkey AS change_id
  FROM orders
), ordered AS (
  SELECT custkey, eff_ts, priority, change_id,
    lag(priority) OVER w AS prev_priority
  FROM feed
  WINDOW w AS (PARTITION BY custkey ORDER BY eff_ts, change_id)
), changes AS (
  SELECT custkey, eff_ts, priority, change_id
  FROM ordered
  WHERE prev_priority IS NULL OR priority <> prev_priority
)
SELECT custkey, priority, eff_ts AS valid_from,
  lead(eff_ts) OVER w AS valid_to,
  CAST(row_number() OVER w AS BIGINT) AS version,
  lead(eff_ts) OVER w IS NULL AS is_current
FROM changes
WINDOW w AS (PARTITION BY custkey ORDER BY eff_ts, change_id)
"""


@query("scd2_dimension_history", oracle=SCD2_ORACLE, category="governance")
def scd2_dimension_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 dimension build from a change feed (orders as the
    feed: each order re-states its customer's priority attribute):
    collapse consecutive identical values to change points (lag), then
    derive [valid_from, valid_to) intervals, version numbers, and the
    is_current flag (lead). Two window passes over the SAME
    (custkey | eff_ts, change_id) ordering = one shuffle; determinism
    comes from change_id (unique) ending every window ORDER BY. This
    is the nightly dimension-maintenance shape of every warehouse
    load that must answer "what was this attribute on date X"."""
    feed = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").alias("eff_ts"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderkey").alias("change_id"),
    )
    w = Window.partitionBy("custkey").orderBy("eff_ts", "change_id")
    changes = (
        feed.withColumn("prev_priority", F.lag("priority").over(w))
        .filter(
            F.col("prev_priority").isNull()
            | (F.col("priority") != F.col("prev_priority"))
        )
        .drop("prev_priority")
    )
    return changes.select(
        "custkey",
        "priority",
        F.col("eff_ts").alias("valid_from"),
        F.lead("eff_ts").over(w).alias("valid_to"),
        F.row_number().over(w).cast("bigint").alias("version"),
        F.lead("eff_ts").over(w).isNull().alias("is_current"),
    )


# Deterministic "forget set": ~2% of customers by the folded Knuth
# hash (the repo-standard reproducible selector — pure function of the
# key, so membership never needs RNG state or a seed table).
_FORGET_THR = 85899345  # floor(0.02 * 2^32)
_FORGET_HASH_SQL = (
    "(({k} % 1000000007) * 2654435761) % 4294967296"
)

GDPR_ORACLE = f"""
WITH po AS (
  SELECT o_orderkey FROM orders
  WHERE {_FORGET_HASH_SQL.format(k="o_custkey")} < {_FORGET_THR}
)
SELECT 'customer' AS entity,
  CAST(SUM(CASE WHEN {_FORGET_HASH_SQL.format(k="c_custkey")} < {_FORGET_THR}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_purged,
  CAST(SUM(CASE WHEN {_FORGET_HASH_SQL.format(k="c_custkey")} < {_FORGET_THR}
                THEN 0 ELSE 1 END) AS BIGINT) AS n_retained
FROM customer
UNION ALL
SELECT 'orders' AS entity,
  CAST(SUM(CASE WHEN {_FORGET_HASH_SQL.format(k="o_custkey")} < {_FORGET_THR}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_purged,
  CAST(SUM(CASE WHEN {_FORGET_HASH_SQL.format(k="o_custkey")} < {_FORGET_THR}
                THEN 0 ELSE 1 END) AS BIGINT) AS n_retained
FROM orders
UNION ALL
SELECT 'lineitem' AS entity,
  CAST(SUM(CASE WHEN po.o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_purged,
  CAST(SUM(CASE WHEN po.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_retained
FROM lineitem l LEFT JOIN po ON l.l_orderkey = po.o_orderkey
"""


@query("gdpr_erasure_cascade", oracle=GDPR_ORACLE, category="governance")
def gdpr_erasure_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten impact audit: cascade a deterministic
    ~2% customer forget-set through orders and lineitem, reporting
    purged vs retained row counts per table (the report a pipeline
    emits before executing the actual deletes).

    Scale design: customer and orders classify at SCAN level — forget
    membership is a pure function of the custkey, so no join, no
    shuffle, just a conditional aggregate. Only lineitem needs the
    genuine cascade join (it has no custkey): a keyed LEFT join
    against the ~2% purged-order keys, which AQE broadcasts at small
    sf and shuffles on o_orderkey at 100 TB. One pass per table,
    all aggregation map-side combined."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")

    def forget(k):
        return (
            ((F.col(k) % F.lit(1000000007)) * F.lit(2654435761))
            % F.lit(4294967296)
            < _FORGET_THR
        )

    def audit(df, entity, flag):
        return df.agg(
            F.lit(entity).alias("entity"),
            F.sum(F.when(flag, 1).otherwise(0)).cast("bigint").alias("n_purged"),
            F.sum(F.when(flag, 0).otherwise(1)).cast("bigint").alias("n_retained"),
        )

    purged_orders = o.filter(forget("o_custkey")).select("o_orderkey")
    li_flagged = li.join(
        purged_orders, li.l_orderkey == purged_orders.o_orderkey, "left"
    )
    return (
        audit(c, "customer", forget("c_custkey"))
        .unionAll(audit(o, "orders", forget("o_custkey")))
        .unionAll(
            audit(li_flagged, "lineitem", F.col("o_orderkey").isNotNull())
        )
    )


_K_ANON = 10

K_ANON_ORACLE = f"""
SELECT CAST(c_nationkey AS BIGINT) AS nationkey, c_mktsegment AS segment,
  CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS balance_band,
  CAST(COUNT(*) AS BIGINT) AS group_size,
  COUNT(*) < {_K_ANON} AS at_risk
FROM customer
GROUP BY c_nationkey, c_mktsegment, floor(c_acctbal / 2000.0)
"""


@query("dq_k_anonymity", oracle=K_ANON_ORACLE, category="governance")
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over quasi-identifiers (nation, market
    segment, account-balance band): every equivalence class with its
    size and an at-risk flag when fewer than k=10 records share the
    class — the privacy gate run before releasing a dataset, telling
    the publisher which classes need suppression or coarser bands.

    The balance band uses explicit floor() BEFORE any cast (the
    division-as-key rule: DuckDB CAST(double AS BIGINT) rounds
    half-even while Spark truncates). One map-side-combined groupBy;
    at 100 TB the class-count aggregate is the same shuffle shape as
    any low-cardinality profile."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy(
        F.col("c_nationkey").cast("bigint").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / 2000.0).cast("bigint").alias("balance_band"),
    ).agg(
        F.count(F.lit(1)).alias("group_size"),
        (F.count(F.lit(1)) < _K_ANON).alias("at_risk"),
    )


SCD3_ORACLE = """
WITH feed AS (
  SELECT o_custkey AS custkey, o_orderdate AS eff_ts,
         o_orderpriority AS priority, o_orderkey AS change_id
  FROM orders
), ordered AS (
  SELECT custkey, eff_ts, priority, change_id,
    lag(priority) OVER w AS prev_priority
  FROM feed
  WINDOW w AS (PARTITION BY custkey ORDER BY eff_ts, change_id)
), changes AS (
  SELECT custkey, eff_ts, priority, change_id
  FROM ordered
  WHERE prev_priority IS NULL OR priority <> prev_priority
)
SELECT custkey,
  priority AS current_priority,
  lag(priority) OVER w AS previous_priority,
  eff_ts AS changed_at,
  CAST(row_number() OVER w AS BIGINT) AS n_changes
FROM changes
WINDOW w AS (PARTITION BY custkey ORDER BY eff_ts, change_id)
QUALIFY row_number() OVER (PARTITION BY custkey
                           ORDER BY eff_ts DESC, change_id DESC) = 1
"""


@query("scd3_previous_value", oracle=SCD3_ORACLE, category="governance")
def scd3_previous_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 3 — current + previous attribute in ONE row per key
    (the limited-history alternative to the Type 2 interval table):
    collapse the change feed to change points (the scd2 machinery),
    then keep each key's LATEST change carrying the lagged prior
    value and the total change count. Same single (custkey | eff_ts,
    change_id) shuffle as scd2; the latest-row cut is a QUALIFY over
    the same partitioning."""
    feed = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").alias("eff_ts"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderkey").alias("change_id"),
    )
    w = Window.partitionBy("custkey").orderBy("eff_ts", "change_id")
    changes = (
        feed.withColumn("prev_priority", F.lag("priority").over(w))
        .filter(
            F.col("prev_priority").isNull()
            | (F.col("priority") != F.col("prev_priority"))
        )
        .drop("prev_priority")
    )
    wd = Window.partitionBy("custkey").orderBy(
        F.col("eff_ts").desc(), F.col("change_id").desc()
    )
    annotated = changes.select(
        "custkey",
        F.col("priority").alias("current_priority"),
        F.lag("priority").over(w).alias("previous_priority"),
        F.col("eff_ts").alias("changed_at"),
        F.row_number().over(w).cast("bigint").alias("n_changes"),
        F.row_number().over(wd).alias("__latest"),
    )
    return annotated.filter(F.col("__latest") == 1).drop("__latest")
