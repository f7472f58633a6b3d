"""Unit tests for the Glue-shaped operators on tiny inline frames
(FIXTURES.md 'dirty input' guidance)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from glue_etl_pyspark_spark.operators import (
    apply_mapping,
    asof_join,
    drop_null_fields,
    fill_missing,
    range_join,
    resolve_choice,
    split_fields,
    split_rows,
)


def test_apply_mapping(spark):
    df = spark.createDataFrame([(1, "2.5")], "a int, b string")
    out = apply_mapping(df, [("a", "int", "x", "bigint"), ("b", "string", "y", "double")])
    assert out.columns == ["x", "y"]
    row = out.collect()[0]
    assert row.x == 1 and row.y == 2.5


def test_resolve_choice_cast_and_make_cols(spark):
    df = spark.createDataFrame([("123",), ("abc",), (None,)], "v string")
    casted = resolve_choice(df, [("v", "cast:int")]).collect()
    assert [r.v for r in casted] == [123, None, None]

    mc = resolve_choice(df, [("v", "make_cols:int")])
    rows = {(r.v_int, r.v_string) for r in mc.collect()}
    assert rows == {(123, None), (None, "abc"), (None, None)}

    proj = resolve_choice(df, [("v", "project:int")]).collect()
    assert sorted([r.v for r in proj], key=lambda x: (x is None, x)) == [123, None]


def test_drop_null_fields_and_fill(spark):
    df = spark.createDataFrame(
        [(1, None, None), (2, "x", None)], "a int, b string, c string"
    )
    out = drop_null_fields(df)
    assert out.columns == ["a", "b"]
    filled = fill_missing(out, {"b": "?"})
    assert {r.b for r in filled.collect()} == {"?", "x"}


def test_split_rows_partitions_exactly(spark):
    df = spark.createDataFrame([(1,), (2,), (None,)], "a int")
    yes, no = split_rows(df, F.col("a") > 1)
    # NULL predicate rows land in the 'no' side: outputs partition input
    assert yes.count() + no.count() == df.count()
    assert [r.a for r in yes.collect()] == [2]


def test_split_fields(spark):
    df = spark.createDataFrame([(1, "a", True)], "x int, y string, z boolean")
    left, right = split_fields(df, ["x"])
    assert left.columns == ["x"] and right.columns == ["y", "z"]


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_backward_and_forward(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00"), "p1"), (1, _ts("2024-01-01T12:00"), "p2"),
         (2, _ts("2024-01-01T09:00"), "p3")],
        "user_id int, ts timestamp_ntz, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00"), 5.0), (1, _ts("2024-01-01T11:00"), 7.0),
         (3, _ts("2024-01-01T01:00"), 9.0)],
        "user_id int, ts timestamp_ntz, score double",
    )
    back = asof_join(left, right, on="ts", by=["user_id"], value_cols=["score"])
    got = {r.tag: r.score for r in back.collect()}
    # p1: right row at exactly 10:00 is visible (inclusive); p2 takes 11:00;
    # p3: user 2 has no right rows -> NULL
    assert got == {"p1": 5.0, "p2": 7.0, "p3": None}

    fwd = asof_join(left, right, on="ts", by=["user_id"], value_cols=["score"],
                    direction="forward")
    got_f = {r.tag: r.score for r in fwd.collect()}
    assert got_f == {"p1": 5.0, "p2": None, "p3": None}


def test_asof_join_tie_break_deterministic(spark):
    """Multiple right rows sharing (by, on) violate the uniqueness
    precondition; tie_break appended to the window order makes the
    winner deterministic: largest tie_break value, both directions."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00"), "p1")],
        "user_id int, ts timestamp_ntz, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:00"), 10, 1.0), (1, _ts("2024-01-01T09:00"), 30, 3.0),
         (1, _ts("2024-01-01T09:00"), 20, 2.0)],
        "user_id int, ts timestamp_ntz, seq int, score double",
    )
    back = asof_join(left, right, on="ts", by=["user_id"], value_cols=["score"],
                     tie_break="seq")
    assert [r.score for r in back.collect()] == [3.0]
    fwd = asof_join(left, right.withColumn("ts", F.expr("ts + INTERVAL 2 HOURS")),
                    on="ts", by=["user_id"], value_cols=["score"],
                    direction="forward", tie_break="seq")
    assert [r.score for r in fwd.collect()] == [3.0]


def test_range_join_bucket_boundaries(spark):
    points = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00")), (2, _ts("2024-01-03T12:00")),
         (3, _ts("2024-01-08T00:00"))],
        "id int, ts timestamp_ntz",
    )
    intervals = spark.createDataFrame(
        [(_ts("2024-01-01T00:00"), _ts("2024-01-08T00:00"), "w1"),
         (_ts("2024-01-08T00:00"), _ts("2024-01-15T00:00"), "w2")],
        "start timestamp_ntz, end timestamp_ntz, label string",
    )
    out = range_join(points, intervals, point="ts", start="start", end="end",
                     bucket_seconds=86400)
    got = {(r.id, r.label) for r in out.collect()}
    # end bound exclusive: id=3 falls in w2, not w1; no duplicates from
    # intervals spanning multiple buckets
    assert got == {(1, "w1"), (2, "w1"), (3, "w2")}
    assert out.count() == 3


def test_approx_count_distinct_tolerance(spark, sf_dir):
    from glue_etl_pyspark_spark.registry import load_all

    df = load_all()["agg_approx_distinct"].fn(spark, sf_dir)
    for r in df.collect():
        assert abs(r.approx_orders - r.exact_orders) / r.exact_orders < 0.06


def test_resolve_choice_make_struct(spark):
    df = spark.createDataFrame([("123",), ("abc",), (None,)], "v string")
    out = resolve_choice(df, [("v", "make_struct:int")])
    rows = {(r.v.int, r.v.string) for r in out.collect()}
    assert rows == {(123, None), (None, "abc"), (None, None)}


def test_glue_map_and_filter(spark):
    from glue_etl_pyspark_spark.operators.record_ops import glue_filter, glue_map

    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "n int, s string")
    kept = glue_filter(df, lambda r: r["n"] % 2 == 1)
    mapped = glue_map(kept, lambda r: {"n2": r["n"] * 10, "s": r["s"].upper()},
                      schema="n2 int, s string")
    assert {(r.n2, r.s) for r in mapped.collect()} == {(10, "A"), (30, "C")}


def test_salted_join_matches_plain_join(spark, sf_dir):
    from glue_etl_pyspark_spark.io import load_table
    from glue_etl_pyspark_spark.operators.skew import salted_agg_count, salted_join

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    plain = ev.join(cust, "user_id").groupBy("c_mktsegment").count()
    salted = (
        salted_join(ev, cust, on="user_id", salt_cols=["event_id"], buckets=8)
        .groupBy("c_mktsegment")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

    plain_counts = ev.groupBy("user_id").count().withColumnRenamed("count", "cnt")
    salted_counts = salted_agg_count(ev, "user_id", salt_cols=["event_id"], buckets=8)
    assert sorted(map(tuple, plain_counts.collect())) == sorted(
        map(tuple, salted_counts.collect())
    )


def test_asof_join_null_payload_not_mixed(spark):
    """The nearest right row must be attached ATOMICALLY: a NULL in
    one of its columns must not be back-filled from an older row."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T12:00"), "p")], "user_id int, ts timestamp_ntz, tag string"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00"), 1.0, None),
         (1, _ts("2024-01-01T11:00"), None, 2.0)],
        "user_id int, ts timestamp_ntz, a double, b double",
    )
    out = asof_join(left, right, on="ts", by=["user_id"], value_cols=["a", "b"])
    row = out.collect()[0]
    # nearest row is 11:00 -> (a=NULL, b=2.0); per-column fill would
    # wrongly produce (a=1.0, b=2.0)
    assert (row.a, row.b) == (None, 2.0)


def test_func_spark_only_spot_values(spark, sf_dir):
    """Spot checks for the functions DuckDB can't oracle."""
    from glue_etl_pyspark_spark.registry import load_all

    rows = {r.o_orderkey: r for r in load_all()["func_spark_only"].fn(spark, sf_dir).collect()}
    r = rows[min(rows)]
    assert r.head_title == r.head_title.title() or r.head_title[0].isupper()
    assert r.conv_255 == "255"
    assert r.tag == f"order-{min(rows):06d}"
    assert r.price_k % 1000 == 0  # bround to -3 digits
    assert isinstance(r.xx, int) and r.crc >= 0


def test_arrowdocs_push_filters_partitioning():
    """The custom connector accepts flat comparison filters (applied
    via pyarrow against row-group stats) and yields everything else
    back to Spark."""
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, IsNull, StringStartsWith

    from glue_etl_pyspark_spark.sources.pyds import ArrowDocsReader

    r = ArrowDocsReader({"path": "/root/testdata/sf0.001/documents.parquet"})
    leftover = list(r.pushFilters([
        EqualTo(("lang",), "en"),
        GreaterThanOrEqual(("doc_id",), 100),
        IsNull(("source",)),                  # not pushable here
        StringStartsWith(("text",), "the"),   # not pushable here
    ]))
    assert [type(f).__name__ for f in leftover] == ["IsNull", "StringStartsWith"]
    assert r.pushed == [("lang", "==", "en"), ("doc_id", ">=", 100)]
    # the pushed filters actually prune rows at read time
    rows = [b.num_rows for p in r.partitions() for b in r.read(p)]
    import pyarrow.parquet as pq
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    import pyarrow.compute as pc
    want = t.filter((pc.field("lang") == "en") & (pc.field("doc_id") >= 100)).num_rows
    assert sum(rows) == want and want > 0


def test_observe_quality_metrics_ride_the_action(spark):
    """observe() metrics are computed during the consuming action — no
    second scan; counts must reflect the frame at the observe point
    (pre-filter rows observed even though the action only sees the
    post-filter output)."""
    from glue_etl_pyspark_spark.operators import observe_quality

    df = spark.createDataFrame(
        [(1, None), (2, "b"), (3, None), (4, "d")], "k int, v string"
    )
    inst, obs = observe_quality(df, "pre_filter", {
        "rows": F.count(F.lit(1)),
        "null_v": F.count_if(F.col("v").isNull()),
    })
    out = inst.filter(F.col("v").isNotNull()).collect()
    assert len(out) == 2
    assert obs.get == {"rows": 4, "null_v": 2}


def test_stratified_sample_fractions(spark, sf_dir):
    """sampleBy must keep every 1.0-fraction stratum intact, drop
    unlisted strata entirely, and downsample 'en' to roughly 25%."""
    from glue_etl_pyspark_spark.io import load_table
    from glue_etl_pyspark_spark.registry import load_all

    out = {r.lang: r.n for r in
           load_all()["sample_stratified"].fn(spark, sf_dir).collect()}
    full = {r.lang: r.n for r in
            load_table(spark, sf_dir, "documents").groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert out["de"] == full["de"]
    assert set(out) == {"en", "de"}
    assert 0.05 <= out["en"] / full["en"] <= 0.6  # Bernoulli around 0.25


def test_arrowdocs_row_group_partitioning(spark, tmp_path):
    """With a multi-row-group file the connector must plan one
    partition per row group and reassemble the full table."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from glue_etl_pyspark_spark.sources.pyds import (
        ArrowDocsReader,
        _RowGroupPartition,
        register_python_sources,
    )

    src = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "docs_rg.parquet")
    pq.write_table(src, path, row_group_size=100)  # 500 rows -> 5 groups

    r = ArrowDocsReader({"path": path})
    parts = r.partitions()
    assert len(parts) == 5 and all(isinstance(p, _RowGroupPartition) for p in parts)

    register_python_sources(spark)
    df = spark.read.format("arrowdocs").option("path", path).load()
    assert df.count() == src.num_rows
    assert df.rdd.getNumPartitions() == 5


def test_arrowdocs_directory_table(spark, tmp_path):
    """Directory-shaped tables (what every Spark/Iceberg writer
    produces — the only layout that exists at scale) must plan one
    partition per (part-file, row-group) and reassemble the full
    table; pushed filters still prune. Caught by the r11 10x probe:
    the single-file connector raised AnalysisException on its first
    directory input."""
    import pyarrow.parquet as pq

    from glue_etl_pyspark_spark.io import load_table
    from glue_etl_pyspark_spark.sources.pyds import (
        ArrowDocsReader,
        _FileRowGroupPartition,
        register_python_sources,
    )

    path = str(tmp_path / "docs_dir.parquet")
    src = load_table(spark, "/root/testdata/sf0.001", "documents")
    src.repartition(4).write.parquet(path)

    r = ArrowDocsReader({"path": path})
    parts = r.partitions()
    assert len(parts) >= 4
    assert all(isinstance(p, _FileRowGroupPartition) for p in parts)

    register_python_sources(spark)
    df = spark.read.format("arrowdocs").option("path", path).load()
    assert df.count() == src.count()
    assert df.rdd.getNumPartitions() == len(parts)
    # pushdown reaches every part file
    want = src.filter("lang = 'en'").count()
    got = df.filter(F.col("lang") == "en").count()
    assert got == want and want > 0
    # empty directory is a loud error, not a silent empty scan
    import pytest as _pytest

    empty = tmp_path / "empty_dir"
    empty.mkdir()
    with _pytest.raises(ValueError, match="no .parquet part files"):
        ArrowDocsReader({"path": str(empty)}).partitions()


def test_arrowdocs_single_file_directory_keeps_parallelism(spark, tmp_path):
    """A directory holding ONE single-row-group part file must reuse
    the single-file row-range planning (numPartitions slices), not
    collapse to 1 partition (ADVICE r11) — and the repointed path must
    survive the driver->executor reader serialization."""
    import pyarrow.parquet as pq

    from glue_etl_pyspark_spark.io import load_table
    from glue_etl_pyspark_spark.sources.pyds import (
        ArrowDocsReader,
        _RowRangePartition,
        register_python_sources,
    )

    path = str(tmp_path / "docs_one.parquet")
    src = load_table(spark, "/root/testdata/sf0.001", "documents")
    src.coalesce(1).write.parquet(path)

    r = ArrowDocsReader({"path": path, "numPartitions": "4"})
    parts = r.partitions()
    assert len(parts) == 4
    assert all(isinstance(p, _RowRangePartition) for p in parts)

    register_python_sources(spark)
    df = spark.read.format("arrowdocs").option("path", path) \
        .option("numPartitions", "4").load()
    assert df.count() == src.count()
    assert df.rdd.getNumPartitions() == 4


def test_jsonldir_writer_two_phase_commit(spark, tmp_path):
    """The custom sink's commit protocol: a successful write leaves
    only manifest-listed final files (no _tmp_ leftovers); a failing
    write aborts — no _SUCCESS, no visible data."""
    import json
    import os

    from glue_etl_pyspark_spark.sources.pyds import register_python_sources

    register_python_sources(spark)
    out = str(tmp_path / "sink_ok")
    df = spark.range(100).selectExpr("id", "id * 2 AS v").repartition(4)
    df.write.format("jsonldir").option("path", out).mode("append").save()
    names = sorted(os.listdir(out))
    assert "_SUCCESS" in names
    assert not any(n.startswith("_tmp_") for n in names)
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    listed = {f["file"] for f in manifest["files"]}
    assert listed == {n for n in names if n != "_SUCCESS"}
    assert sum(f["rows"] for f in manifest["files"]) == 100
    back = spark.read.schema("id bigint, v bigint").json(
        [os.path.join(out, n) for n in listed]
    )
    assert back.count() == 100 and back.agg({"v": "sum"}).collect()[0][0] == 9900

    # failing write: one task raises -> abort path, nothing visible
    out_bad = str(tmp_path / "sink_bad")
    from pyspark.sql import functions as F

    @F.udf("long")
    def boom(x):
        if x == 42:
            raise ValueError("boom")
        return x

    bad = spark.range(100).repartition(4).select(boom("id").alias("id"))
    import pytest as _pytest

    with _pytest.raises(Exception):
        bad.write.format("jsonldir").option("path", out_bad).mode("append").save()
    leftover = [
        n for n in (os.listdir(out_bad) if os.path.isdir(out_bad) else [])
        if not n.startswith("_tmp_")
    ]
    assert "_SUCCESS" not in leftover


def test_jdbc_roundtrip_partitioned_scan(spark, sf_dir):
    """The JDBC read in sink_jdbc_roundtrip must be a genuinely
    parallel scan: partition count == numPartitions, and the pushdown
    predicate filters at the database."""
    from glue_etl_pyspark_spark.sources.formats import read_jdbc, write_jdbc
    from glue_etl_pyspark_spark.sources.formats import scratch_dir
    from glue_etl_pyspark_spark.io import load_table

    url = f"jdbc:derby:{scratch_dir('jdbc_derby_test')};create=true"
    drv = "org.apache.derby.jdbc.EmbeddedDriver"
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    write_jdbc(orders, url, "t_part", mode="overwrite", driver=drv)
    back = read_jdbc(
        spark, url, "t_part", driver=drv,
        partition_column="o_orderkey", lower_bound=0,
        upper_bound=1_000_000, num_partitions=4,
        push_down_predicate='"o_custkey" >= 100',
    )
    assert back.rdd.getNumPartitions() == 4
    expect = orders.filter("o_custkey >= 100").count()
    assert back.count() == expect


def test_ewma_literal_recursion_matches_recursive_sql(spark, sf_dir):
    """events_ewma_control now runs the recursion on the driver over
    the collected (types x days) daily frame (the endorsed literal
    re-ship pattern) — it must stay BIT-IDENTICAL to the WITH
    RECURSIVE program (`_EWMA_SQL`, still the oracle), including
    across shuffle widths (literal data can't vary with the plan)."""
    from glue_etl_pyspark_spark.io import register_views
    from glue_etl_pyspark_spark.queries.extras import _EWMA_SQL
    from glue_etl_pyspark_spark.registry import load_all

    register_views(spark, sf_dir, "events")
    want = sorted(map(tuple, spark.sql(_EWMA_SQL).collect()))
    fn = load_all()["events_ewma_control"].fn
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for parts in ("2", "32", "200"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            got = sorted(map(tuple, fn(spark, sf_dir).collect()))
            assert got == want, f"diverged at width {parts}"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)


def test_manifest_pruned_read_skips_files_and_matches_full_scan(spark, sf_dir):
    """The manifest layout's min/max file skipping must (a) actually
    prune — the pruned reader's inputFiles() is a strict subset of the
    16-file layout — and (b) be invisible to results: pruned scan ==
    full scan + filter, row for row. Also pins the empty-overlap path
    (a window outside every file's range reads zero files, keeps
    schema)."""
    import datetime

    from glue_etl_pyspark_spark.io import load_table
    from glue_etl_pyspark_spark.sources.formats import scratch_dir
    from glue_etl_pyspark_spark.sources.manifest import (
        manifest_pruned_read,
        read_manifest,
        write_manifest_table,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    path = scratch_dir("orders_manifest_test")
    m = write_manifest_table(orders, path, "o_orderdate", 16)
    assert len(m["files"]) >= 8
    assert read_manifest(path)["stat_col"] == "o_orderdate"

    lo, hi = datetime.date(1996, 1, 1), datetime.date(1996, 12, 31)
    pruned = manifest_pruned_read(spark, path, lo, hi)
    n_read = len(pruned.inputFiles())
    assert 0 < n_read < len(m["files"]), (
        f"expected a strict file subset, read {n_read} of {len(m['files'])} "
        "— range clustering or stat pruning is broken"
    )

    full = orders.filter(F.col("o_orderdate").between(lo, hi))
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, full.collect())
    )

    empty = manifest_pruned_read(
        spark, path, datetime.date(2190, 1, 1), datetime.date(2190, 12, 31)
    )
    assert empty.count() == 0
    assert set(empty.columns) == set(orders.columns)

    # Boundary pin on this layout: lo exactly on a file's max.
    boundary = datetime.datetime.fromisoformat(
        m["files"][len(m["files"]) // 2]["max"]
    ).date()
    b_pruned = manifest_pruned_read(spark, path, boundary, boundary)
    b_full = orders.filter(F.col("o_orderdate") == F.lit(boundary))
    got_b = sorted(map(tuple, b_pruned.collect()))
    assert got_b == sorted(map(tuple, b_full.collect()))
    assert got_b, "a file's max date must have rows — boundary file was pruned"


def test_manifest_date_stats_lo_boundary_not_pruned(spark, sf_dir):
    """ADVICE r9 (high): with DATE-typed stats the manifest min/max
    render as 10-char ISO dates; a lo bound widened to a day-start
    datetime string-compares GREATER than its own date (the date is a
    strict prefix), so `max < lo_k` wrongly pruned the file whose max
    equals lo and silently dropped its rows. Lo must stay unwidened
    — this test builds a layout whose stats ARE dates and puts lo
    exactly on a file's max."""
    import datetime

    from glue_etl_pyspark_spark.io import load_table
    from glue_etl_pyspark_spark.sources.formats import scratch_dir
    from glue_etl_pyspark_spark.sources.manifest import (
        manifest_pruned_read,
        write_manifest_table,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("o_orderdate")
    )
    path = scratch_dir("orders_manifest_datestats")
    m = write_manifest_table(orders, path, "o_orderdate", 8)
    assert all(
        len(e["max"]) == 10 for e in m["files"]
    ), "stats must be 10-char ISO dates for this pin"

    lo = datetime.date.fromisoformat(m["files"][3]["max"])
    hi = lo + datetime.timedelta(days=30)
    pruned = manifest_pruned_read(spark, path, lo, hi)
    full = orders.filter(F.col("o_orderdate").between(lo, hi))
    got = sorted(map(tuple, pruned.collect()))
    assert got == sorted(map(tuple, full.collect()))
    assert any(r[1] == lo for r in got), (
        "rows at lo (a file's exact max) are missing — the boundary "
        "file was wrongly pruned"
    )


def test_manifest_pruning_int_stat_col(spark, sf_dir):
    """Mixed-type behavior pin (VERDICT r9 item 7): an INT tracked
    column stores native JSON ints in the manifest and the pruner
    compares them numerically (same-typed compares only — ISO
    strings for dates, ints for ints), so integer clustering prunes
    exactly like date clustering."""
    from glue_etl_pyspark_spark.io import load_table
    from glue_etl_pyspark_spark.sources.formats import scratch_dir
    from glue_etl_pyspark_spark.sources.manifest import (
        manifest_pruned_read,
        write_manifest_table,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    path = scratch_dir("orders_manifest_int")
    m = write_manifest_table(orders, path, "o_orderkey", 8)
    assert all(isinstance(e["min"], int) for e in m["files"])

    keys = sorted(e["max"] for e in m["files"])
    lo, hi = m["files"][0]["min"], keys[2]  # spans ~3 of 8 files
    pruned = manifest_pruned_read(spark, path, lo, hi)
    assert 0 < len(pruned.inputFiles()) < len(m["files"])
    full = orders.filter(F.col("o_orderkey").between(lo, hi))
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, full.collect())
    )
