"""Streaming semantics: each stream drain must agree with its oracled
batch twin; dedup must halve the duplicated stream; stateful counts
must match a batch aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from glue_etl_pyspark_spark.io import load_table
from glue_etl_pyspark_spark.registry import load_all


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _run(spark, sf_dir, name):
    return load_all()[name].fn(spark, sf_dir)


def test_stream_tumbling_matches_batch(spark, smoke_dir):
    stream = _run(spark, smoke_dir, "stream_tumbling")
    batch = _run(spark, smoke_dir, "window_tumbling_batch")
    cols = ["window_start", "event_type", "n"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_stream_sliding_matches_batch(spark, smoke_dir):
    stream = _run(spark, smoke_dir, "stream_sliding")
    batch = _run(spark, smoke_dir, "window_sliding_batch")
    cols = ["window_start", "n"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_stream_session_matches_batch(spark, smoke_dir):
    stream = _run(spark, smoke_dir, "stream_session")
    batch = _run(spark, smoke_dir, "window_session_batch")
    cols = ["user_id", "session_start", "session_end", "n_events"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_stream_dedup_halves_duplicates(spark, smoke_dir):
    out = _run(spark, smoke_dir, "stream_dedup")
    n_events = load_table(spark, smoke_dir, "events").count()
    assert out.count() == n_events
    assert out.select("event_id").distinct().count() == n_events


def test_stream_static_join_matches_batch(spark, smoke_dir):
    stream = _run(spark, smoke_dir, "stream_static_join")
    batch = _run(spark, smoke_dir, "stream_static_join_batch")
    cols = ["c_mktsegment", "n"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_stream_stateful_counts_match_batch(spark, smoke_dir):
    out = _run(spark, smoke_dir, "stream_stateful_counts")
    batch = (
        load_table(spark, smoke_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
    )
    cols = ["user_id", "n_events", "sum_value"]
    assert _rows(out, cols) == _rows(batch, cols)


def test_stream_foreachbatch_totals(spark, smoke_dir):
    out = _run(spark, smoke_dir, "stream_foreachbatch")
    assert out.count() == 5  # one row per event_type
    total = sum(r.n for r in out.collect())
    assert total == load_table(spark, smoke_dir, "events").count()


def test_stream_stream_join_matches_batch(spark, smoke_dir):
    stream = _run(spark, smoke_dir, "stream_stream_join")
    batch = _run(spark, smoke_dir, "stream_stream_join_batch")
    cols = ["purchase_id", "click_id"]
    assert _rows(stream, cols) == _rows(batch, cols)
    assert stream.count() > 0


def test_multi_batch_incremental_state(spark, smoke_dir, tmp_path):
    """Real incremental processing: the events table split into 4
    files, replayed one file per micro-batch (maxFilesPerTrigger=1) —
    aggregation state must carry across batches and converge to the
    batch answer."""
    from pyspark.sql import functions as F

    from glue_etl_pyspark_spark.io import load_table

    ev = load_table(spark, smoke_dir, "events")
    src = str(tmp_path / "events_split")
    ev.repartition(4).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("multi_batch_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    n_batches = len(q.recentProgress)
    assert n_batches >= 4, f"expected >=4 micro-batches, got {n_batches}"

    got = {(r.event_type, r.n) for r in spark.table("multi_batch_sink").collect()}
    want = {
        (r.event_type, r.n)
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want
