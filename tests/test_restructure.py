"""Unit tests for nested-data restructuring operators."""

from __future__ import annotations

from glue_etl_pyspark_spark.operators import relationalize, unbox, unnest_frame


def test_unnest_frame_recursive(spark):
    df = spark.sql(
        "SELECT 1 AS id, named_struct('a', 2, 'b', named_struct('c', 3)) AS s"
    )
    flat = unnest_frame(df, sep="_")
    assert flat.columns == ["id", "s_a", "s_b_c"]
    row = flat.collect()[0]
    assert (row.id, row.s_a, row.s_b_c) == (1, 2, 3)


def test_relationalize_arrays_and_structs(spark):
    df = spark.sql(
        """SELECT 1 AS id, 'x' AS name,
                  array(named_struct('v', 10), named_struct('v', 20)) AS items,
                  array('t1', 't2') AS tags"""
    )
    tables = relationalize(df, "root", key_cols=["id"])
    assert set(tables) == {"root", "root_items", "root_tags"}
    assert tables["root"].columns == ["id", "name"]
    items = {(r.id, r.pos, r.val_v) for r in tables["root_items"].collect()}
    assert items == {(1, 0, 10), (1, 1, 20)}
    tags = {(r.pos, r.val) for r in tables["root_tags"].collect()}
    assert tags == {(0, "t1"), (1, "t2")}


def test_unbox_csv(spark):
    df = spark.createDataFrame([("a,1",), ("b,2",)], "line string")
    out = unbox(df, "line", fmt="csv", schema="name STRING, n INT")
    rows = {(r.line.name, r.line.n) for r in out.collect()}
    assert rows == {("a", 1), ("b", 2)}


def test_avro_roundtrip_via_bundled_classes(spark, tmp_path):
    """Avro end-to-end: the short name needs the external spark-avro
    jar, but Spark 4.1 bundles the connector classes in spark-sql —
    the wrapper falls back to the fully-qualified AvroFileFormat and
    the round trip must be lossless (types + values)."""
    import os

    from glue_etl_pyspark_spark.sources.formats import read_avro, write_avro

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.25), (3, None, 0.0)],
        "id bigint, s string, v double",
    )
    write_avro(df, str(tmp_path / "avro"))
    assert any(
        f.endswith(".avro") for f in os.listdir(tmp_path / "avro")
    ), "expected .avro part files"
    back = read_avro(spark, str(tmp_path / "avro"))
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_jdbc_options_contract():
    """No RDBMS exists here, so the JDBC surface is a validated option
    builder: the partitioned-read quartet is all-or-nothing (a partial
    spec silently single-threads the scan in Spark), predicates become
    a pushdown subquery, and everything stringifies."""
    import pytest

    from glue_etl_pyspark_spark.sources.formats import jdbc_options

    opts = jdbc_options(
        "jdbc:postgresql://db:5432/shop",
        "public.orders",
        user="etl",
        password="pw",
        driver="org.postgresql.Driver",
        partition_column="o_orderkey",
        lower_bound=1,
        upper_bound=6_000_000,
        num_partitions=32,
        push_down_predicate="o_orderdate >= DATE '1997-01-01'",
    )
    assert opts["partitionColumn"] == "o_orderkey"
    assert (opts["lowerBound"], opts["upperBound"], opts["numPartitions"]) == (
        "1", "6000000", "32",
    )
    assert opts["dbtable"].startswith("(SELECT * FROM public.orders WHERE")
    assert all(isinstance(v, str) for v in opts.values())
    # partial partition spec must refuse, not silently single-thread
    with pytest.raises(ValueError, match="ALL of partition_column"):
        jdbc_options("jdbc:x", "t", partition_column="id", num_partitions=8)
    # unpartitioned spec stays minimal
    plain = jdbc_options("jdbc:x", "t")
    assert "partitionColumn" not in plain and plain["dbtable"] == "t"
