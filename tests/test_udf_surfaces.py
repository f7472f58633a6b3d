"""Unit pins for the later-r16 §2.11/relational API surfaces.

The parity suite already hash-checks the three queries against DuckDB
at sf0.01; these tests pin the edges the real data may never hit:

- cogrouped applyInPandas MUST fire for keys present on only ONE side
  (the outer semantics the query's docstring claims) — at sf0.01 every
  user has both purchases and clicks, so only a constructed frame
  proves it;
- applyInArrow single-row groups and exact int64 micro accumulation;
- transpose column naming from index-column VALUES (schema is
  data-dependent — pin it).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def test_cogroup_fires_on_one_sided_keys(spark):
    left = spark.createDataFrame(
        [(1, 2.5), (1, 3.5), (2, 1.0)], "user_id long, value double"
    )
    right = spark.createDataFrame([(2, 9.0), (3, 0.25)], "user_id long, value double")

    def reconcile(key, l, r):  # noqa: E741 - mirrors the query's shape
        import numpy as np

        def micro(pdf):
            if len(pdf) == 0:
                return 0
            return int(np.floor(pdf["value"].to_numpy() * 1e6).astype("int64").sum())

        return pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_left": [len(l)],
                "n_right": [len(r)],
                "left_micro": [micro(l)],
                "right_micro": [micro(r)],
            }
        )

    out = (
        left.groupBy("user_id")
        .cogroup(right.groupBy("user_id"))
        .applyInPandas(
            reconcile,
            schema=(
                "user_id long, n_left long, n_right long, "
                "left_micro long, right_micro long"
            ),
        )
    )
    rows = {r["user_id"]: r.asDict() for r in out.collect()}
    # key 1: left-only — right frame arrived EMPTY, function still fired
    assert rows[1] == {
        "user_id": 1, "n_left": 2, "n_right": 0,
        "left_micro": 6_000_000, "right_micro": 0,
    }
    # key 2: both sides
    assert rows[2] == {
        "user_id": 2, "n_left": 1, "n_right": 1,
        "left_micro": 1_000_000, "right_micro": 9_000_000,
    }
    # key 3: right-only
    assert rows[3] == {
        "user_id": 3, "n_left": 0, "n_right": 1,
        "left_micro": 0, "right_micro": 250_000,
    }


def test_applyinarrow_exact_stats_and_single_row_groups(spark):
    df = spark.createDataFrame(
        [(10, 100, 1.000001), (10, 101, 2.0), (20, 200, 0.5)],
        "user_id long, event_id long, value double",
    )

    # identical shape to udf_grouped_applyinarrow (un-annotated: see the
    # query's NOTE on the Spark 4.1.2 hint-inference bug)
    def stats(key, tbl):
        micro = pc.cast(pc.floor(pc.multiply(tbl.column("value"), 1e6)), pa.int64())
        mm = pc.min_max(tbl.column("event_id"))
        return pa.table(
            {
                "user_id": pa.array([key[0].as_py()], pa.int64()),
                "n": pa.array([tbl.num_rows], pa.int64()),
                "v_micro": pa.array([pc.sum(micro).as_py()], pa.int64()),
                "min_id": pa.array([mm["min"].as_py()], pa.int64()),
                "max_id": pa.array([mm["max"].as_py()], pa.int64()),
            }
        )

    out = df.groupBy("user_id").applyInArrow(
        stats, schema="user_id long, n long, v_micro long, min_id long, max_id long"
    )
    rows = {r["user_id"]: r.asDict() for r in out.collect()}
    # floor(1.000001 * 1e6) = floor(1000000.9999999999) = 1000000: the
    # double product rounds DOWN here — the floor of the IEEE product,
    # not of the decimal value, on BOTH engines (why micro-scaling is
    # exact cross-engine); 2.0 -> 2000000 exactly
    assert rows[10] == {
        "user_id": 10, "n": 2, "v_micro": 3_000_000, "min_id": 100, "max_id": 101,
    }
    assert rows[20] == {
        "user_id": 20, "n": 1, "v_micro": 500_000, "min_id": 200, "max_id": 200,
    }


def test_transpose_columns_come_from_index_values(spark):
    df = spark.createDataFrame(
        [("F", 10, 100), ("O", 20, 200), ("P", 30, 300)],
        "status string, n_orders long, total_micro long",
    )
    t = df.transpose()
    assert t.columns == ["key", "F", "O", "P"]
    rows = {r["key"]: (r["F"], r["O"], r["P"]) for r in t.collect()}
    assert rows == {"n_orders": (10, 20, 30), "total_micro": (100, 200, 300)}


def test_transpose_query_schema_stable_at_smoke_scale(spark, smoke_dir):
    """The query's output COLUMNS come from the o_orderstatus domain —
    assert the full TPC-H {F,O,P} domain is present even at sf0.001 so
    the driver's schema compare can never see a data-dependent column
    set."""
    from glue_etl_pyspark_spark.queries.extras import relational_transpose

    out = relational_transpose(spark, smoke_dir)
    assert sorted(out.columns) == ["F", "O", "P", "key"]
    assert out.count() == 2


def test_duplicate_index_values_make_duplicate_columns(spark):
    """transpose does NOT reject duplicate index values — it silently
    emits DUPLICATE column names (probed on 4.1.2), which would crash
    the driver's column-sorted compare. Pins why relational_transpose
    must aggregate (groupBy guarantees distinct index values) before
    transposing; if Spark ever starts raising here, this test fails
    and the docstring caveat can be dropped."""
    df = spark.createDataFrame([("F", 1), ("F", 2)], "status string, n long")
    t = df.transpose()
    assert t.columns == ["key", "F", "F"]


def test_self_cogroup_distinct_names(spark, sf_dir):
    """Regression pin for the self-cogroup column-pruning trap: both
    sides derived from ONE events scan, cogrouped per user. With
    same-name value columns the right frame plan-sensitively arrived
    with its value column pruned (['user_id'] only) at sf0.1 under
    the default 32-partition session; distinct per-side names make
    the collision impossible. The query-shaped counts must equal the
    plain filtered GROUP BY."""
    from pyspark.sql import functions as F

    from glue_etl_pyspark_spark.io import load_table
    from glue_etl_pyspark_spark.queries.udfs import udf_cogrouped_stats

    out = udf_cogrouped_stats(spark, sf_dir).select(
        "user_id", "n_purchase", "n_click"
    )
    ev = load_table(spark, sf_dir, "events")
    exp = (
        ev.groupBy("user_id")
        .agg(
            F.sum((F.col("event_type") == "purchase").cast("long")).alias("n_purchase"),
            F.sum((F.col("event_type") == "click").cast("long")).alias("n_click"),
        )
    )
    assert out.exceptAll(exp).count() == 0 and exp.exceptAll(out).count() == 0
