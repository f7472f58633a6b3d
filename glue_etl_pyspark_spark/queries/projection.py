"""Projection / column-op queries (SURVEY.md §2.2) exercising the
operators in ``operators.columns``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators import (
    apply_mapping,
    drop_null_fields,
    fill_missing,
    glue_join,
    resolve_choice,
)
from ..registry import query

# ---------------------------------------------------------------------------

APPLY_MAPPING_ORACLE = """
SELECT
  o_orderkey AS order_id,
  o_custkey AS customer_id,
  o_totalprice AS total_usd,
  CAST(o_orderdate AS DATE) AS order_date,
  o_orderstatus AS status
FROM orders
WHERE o_totalprice > 400000
"""


@query("apply_mapping_orders", oracle=APPLY_MAPPING_ORACLE, category="column")
def apply_mapping_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ApplyMapping: select+rename+cast in one projection; the filter
    must still push through it to the parquet scan."""
    orders = load_table(spark, sf_dir, "orders")
    mapped = apply_mapping(
        orders,
        [
            ("o_orderkey", "bigint", "order_id", "bigint"),
            ("o_custkey", "bigint", "customer_id", "bigint"),
            ("o_totalprice", "double", "total_usd", "double"),
            ("o_orderdate", "timestamp_ntz", "order_date", "date"),
            ("o_orderstatus", "string", "status", "string"),
        ],
    )
    return mapped.filter(F.col("total_usd") > 400000)


# ---------------------------------------------------------------------------

_MIXED = "CASE WHEN event_id % 3 = 0 THEN CAST(event_id AS STRING) ELSE event_type END"
_MIXED_DUCK = "CASE WHEN event_id % 3 = 0 THEN CAST(event_id AS VARCHAR) ELSE event_type END"

RESOLVE_CAST_ORACLE = f"""
SELECT event_id, TRY_CAST({_MIXED_DUCK} AS BIGINT) AS mixed
FROM events
"""


@query("resolve_choice_cast", oracle=RESOLVE_CAST_ORACLE, category="column")
def resolve_choice_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ResolveChoice(cast): a mixed int/string column is coerced with
    try_cast — unparseable values become NULL, like Glue's cast."""
    ev = load_table(spark, sf_dir, "events")
    mixed = ev.select("event_id", F.expr(_MIXED).alias("mixed"))
    return resolve_choice(mixed, [("mixed", "cast:bigint")])


RESOLVE_MAKE_COLS_ORACLE = f"""
SELECT
  event_id,
  TRY_CAST({_MIXED_DUCK} AS BIGINT) AS mixed_bigint,
  CASE WHEN TRY_CAST({_MIXED_DUCK} AS BIGINT) IS NULL THEN {_MIXED_DUCK} END AS mixed_string
FROM events
"""


@query("resolve_choice_make_cols", oracle=RESOLVE_MAKE_COLS_ORACLE, category="column")
def resolve_choice_make_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ResolveChoice(make_cols): mixed column split into one column
    per type, Glue-style."""
    ev = load_table(spark, sf_dir, "events")
    mixed = ev.select("event_id", F.expr(_MIXED).alias("mixed"))
    return resolve_choice(mixed, [("mixed", "make_cols:bigint")])


# ---------------------------------------------------------------------------

FILLNA_ORACLE = """
SELECT
  c.c_custkey,
  c.c_name,
  CAST(COALESCE(o.order_cnt, 0) AS BIGINT) AS order_cnt,
  COALESCE(o.total_spent, 0.0) AS total_spent
FROM customer c
LEFT JOIN (
  SELECT o_custkey, COUNT(*) AS order_cnt, SUM(o_totalprice) AS total_spent
  FROM orders GROUP BY o_custkey
) o ON c.c_custkey = o.o_custkey
"""


@query("fill_missing_left_join", oracle=FILLNA_ORACLE, category="column")
def fill_missing_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FillMissingValues over a LEFT JOIN: customers with no orders get
    0 counts instead of NULLs."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("order_cnt"),
        F.sum("o_totalprice").alias("total_spent"),
    )
    joined = glue_join(
        customer.select("c_custkey", "c_name"), per_cust,
        keys1=["c_custkey"], keys2=["o_custkey"], how="left",
    ).drop("o_custkey")
    return fill_missing(fill_missing(joined, {"order_cnt": 0}), {"total_spent": 0.0})


# ---------------------------------------------------------------------------

DROP_NULL_FIELDS_ORACLE = """
SELECT event_id, event_type, value FROM events
"""


@query("drop_null_fields_events", oracle=DROP_NULL_FIELDS_ORACLE, category="column")
def drop_null_fields_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DropNullFields: an injected all-NULL column disappears; if the
    operator failed, the extra column would break the schema check."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    with_ghost = ev.withColumn("ghost", F.lit(None).cast("string"))
    return drop_null_fields(with_ghost)
