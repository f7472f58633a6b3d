"""Sort / limit / set-operation queries (SURVEY.md §2.7)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import query


def _custkeys_in_year(orders: DataFrame, year: int) -> DataFrame:
    return orders.filter(F.year("o_orderdate") == year).select("o_custkey")


SETOPS_ORACLE = """
(SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
 INTERSECT
 SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
EXCEPT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
"""


@query("setops_intersect_except", oracle=SETOPS_ORACLE, category="setop")
def setops_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT then EXCEPT (set semantics): customers active in both
    1995 and 1996 but not 1997."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        _custkeys_in_year(orders, 1995)
        .intersect(_custkeys_in_year(orders, 1996))
        .exceptAll(_custkeys_in_year(orders, 1997).distinct())
    )


UNION_ALL_ORACLE = """
SELECT o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
UNION ALL
SELECT o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'P'
"""


@query("setops_union_all", oracle=UNION_ALL_ORACLE, category="setop")
def setops_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional UNION ALL (bag semantics)."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey", "o_totalprice")
    p = orders.filter(F.col("o_orderstatus") == "P").select("o_custkey", "o_totalprice")
    return f.union(p)


UNION_BY_NAME_ORACLE = """
SELECT o_custkey, o_totalprice FROM orders WHERE year(o_orderdate) = 1995
UNION ALL BY NAME
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
"""


@query("setops_union_by_name", oracle=UNION_BY_NAME_ORACLE, category="setop")
def setops_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with a missing column null-filled (Glue frames are
    schema-flexible; this is the DataFrame equivalent)."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.year("o_orderdate") == 1995).select("o_custkey", "o_totalprice")
    b = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return a.unionByName(b, allowMissingColumns=True)


SORT_LIMIT_OFFSET_ORACLE = """
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20 OFFSET 5
"""


@query("sort_limit_offset", oracle=SORT_LIMIT_OFFSET_ORACLE, category="setop")
def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global multi-key sort with LIMIT/OFFSET pagination."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(5)
        .limit(20)
    )
