"""Filter / predicate queries (SURVEY.md §2.3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import query

COMPOUND_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_extendedprice
FROM lineitem
WHERE l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
  AND l_returnflag IN ('A', 'R')
  AND NOT (l_linestatus = 'O')
"""


@query("filter_compound", oracle=COMPOUND_ORACLE, category="filter")
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/NOT/IN/BETWEEN compound predicate; every conjunct is pushed
    to the parquet scan (PushedFilters)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
        & F.col("l_returnflag").isin("A", "R")
        & ~(F.col("l_linestatus") == "O")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_extendedprice")


PATTERN_ORACLE = """
SELECT p_partkey, p_name, p_brand, p_type
FROM part
WHERE (p_name LIKE '%red%' OR regexp_matches(p_name, '(bolt|gear)$'))
  AND p_brand IS NOT NULL
  AND p_type <> 'PROMO'
"""


@query("filter_string_pattern", oracle=PATTERN_ORACLE, category="filter")
def filter_string_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / rlike / IS NOT NULL predicates on strings."""
    part = load_table(spark, sf_dir, "part")
    return part.filter(
        (F.col("p_name").like("%red%") | F.col("p_name").rlike("(bolt|gear)$"))
        & F.col("p_brand").isNotNull()
        & (F.col("p_type") != "PROMO")
    ).select("p_partkey", "p_name", "p_brand", "p_type")


NULL_SAFE_ORACLE = """
SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS cnt
FROM lineitem
WHERE NULLIF(l_returnflag, 'N') IS NOT DISTINCT FROM NULLIF(l_linestatus, 'O')
GROUP BY l_returnflag, l_linestatus
"""


@query("filter_null_safe_eq", oracle=NULL_SAFE_ORACLE, category="filter")
def filter_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (<=>): NULL <=> NULL is true, unlike =."""
    li = load_table(spark, sf_dir, "lineitem")
    lhs = F.nullif(F.col("l_returnflag"), F.lit("N"))
    rhs = F.nullif(F.col("l_linestatus"), F.lit("O"))
    return (
        li.filter(lhs.eqNullSafe(rhs))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


SUBQUERY_API_ORACLE = """
SELECT c.c_custkey, c.c_mktsegment,
       (SELECT MAX(o_totalprice) FROM orders) AS global_max_total
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
"""


@query("filter_subquery_api", oracle=SUBQUERY_API_ORACLE, category="filter")
def filter_subquery_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.exists()`` + ``DataFrame.scalar()`` (Spark 4.0
    subquery-expression APIs): customers with >= 1 urgent order
    (correlated EXISTS — Catalyst plans the same left-semi join as the
    SQL form in tpch_q4) carrying an uncorrelated scalar subquery
    (global max order value — planned as a broadcast one-row
    aggregate, evaluated ONCE at any SF, not per row). Both doubles
    are projected verbatim — exact cross-engine."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.where(
        (F.col("o_custkey") == F.col("c_custkey").outer())
        & (F.col("o_orderpriority") == "1-URGENT")
    )
    return customer.where(urgent.exists()).select(
        "c_custkey",
        "c_mktsegment",
        orders.select(F.max("o_totalprice")).scalar().alias("global_max_total"),
    )
