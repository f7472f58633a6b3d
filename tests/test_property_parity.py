"""Property-based Spark-vs-DuckDB agreement (SURVEY.md §5.3 optional
layer): hypothesis generates small dirty frames (nulls, duplicates,
negative numbers, empty strings) and asserts both engines agree on
composed filter/aggregate pipelines — the generic guarantee behind
the hand-written oracles."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

rows_strategy = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000)),
        st.sampled_from(["a", "b", "c", ""]),
        st.one_of(st.none(), st.floats(min_value=-100, max_value=100,
                                       allow_nan=False, allow_infinity=False)),
    ),
    min_size=0,
    max_size=50,
)


def _norm(rows):
    out = []
    for r in rows:
        out.append(tuple(round(v, 6) if isinstance(v, float) else v for v in r))
    return sorted(out, key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=rows_strategy)
def test_filter_groupby_agreement(spark, rows):
    pdf = pd.DataFrame(rows, columns=["n", "s", "x"]).astype(
        {"n": "Int64", "s": "string", "x": "float64"}
    )
    sdf = spark.createDataFrame(pdf.astype(object).where(pdf.notna(), None),
                                "n bigint, s string, x double")
    from pyspark.sql import functions as F

    got = sdf.filter("n IS NULL OR n > -500").groupBy("s").agg(
        F.count("n").alias("cnt_n"), F.sum("x").alias("sum_x")
    ).collect()
    spark_rows = [(r.s, r.cnt_n, r.sum_x) for r in got]

    con = duckdb.connect()
    con.register("t", pdf)
    duck_rows = con.execute(
        """
        SELECT s, CAST(COUNT(n) AS BIGINT) AS cnt_n, SUM(x) AS sum_x
        FROM t WHERE n IS NULL OR n > -500 GROUP BY s
        """
    ).fetchall()
    con.close()
    assert _norm(spark_rows) == _norm(duck_rows)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=rows_strategy)
def test_distinct_orderby_agreement(spark, rows):
    pdf = pd.DataFrame(rows, columns=["n", "s", "x"]).astype(
        {"n": "Int64", "s": "string", "x": "float64"}
    )
    sdf = spark.createDataFrame(pdf.astype(object).where(pdf.notna(), None),
                                "n bigint, s string, x double")
    spark_rows = [(r.s, r.n) for r in sdf.select("s", "n").distinct().collect()]

    con = duckdb.connect()
    con.register("t", pdf)
    duck_rows = con.execute("SELECT DISTINCT s, n FROM t").fetchall()
    con.close()
    assert _norm(spark_rows) == _norm(duck_rows)
