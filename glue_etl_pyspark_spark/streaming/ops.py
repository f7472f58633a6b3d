"""Structured Streaming plumbing (SURVEY.md §2.10).

The events parquet is replayed as a micro-batch file stream. Spark's
file stream source requires a *directory*, and the driver's table
layout is one flat dir with all ten tables — so we stage a per-table
symlink directory under /tmp (read-only view of the source file, no
data copied).

Batch-equivalence discipline: every windowed streaming query here has
an oracled batch twin registered next to it (tumbling ≡ date_trunc,
sliding ≡ offset-explode, session ≡ gaps-and-islands), so the
streaming semantics stay hash-checked even though streaming output
itself is rows-only.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_session_configs

_MEM_COUNTER = itertools.count()

# Parquet schemas by path — METADATA memoization only (footer read is a
# driver-side file-index + footer parse costing ~0.2 s per call, paid
# inside every timed streaming run). Values are never cached: the
# stream still reads every data row from the parquet source each
# drain. Safe because the driver fixtures are immutable within a
# process lifetime; a changed file needs a new path or process (same
# stance as Spark's own session-scoped InMemoryFileIndex cache).
_SCHEMA_CACHE: dict[str, object] = {}


def _parquet_schema(spark: SparkSession, path: str):
    sch = _SCHEMA_CACHE.get(path)
    if sch is None:
        sch = spark.read.parquet(path).schema
        _SCHEMA_CACHE[path] = sch
    return sch


def _default_state_partitions() -> int:
    """State-store count for bounded replay drains. Sized to the
    replays' STATE VOLUME (all bounded fixtures here carry <= tens of
    thousands of state rows, where per-batch store open/commit
    overhead dominates — measured min 1.033 s @ 8 vs 0.837 s @ 4 vs
    0.874 s @ 2 on the sf0.1 tumbling drain, r16; re-proven under
    driver conditions r17 — fresh-process cold-JVM median-of-3), not
    to the core count. Externalized for bigger replays / real state
    volumes. Read at CALL time (not import) so tests / mid-session
    env changes take effect (ADVICE r16)."""
    return int(os.environ.get("SPARK_GRAFT_STATE_PARTITIONS", "4"))


def _resolve_state_partitions(state_partitions: int | None) -> int | None:
    """Drain-arg convention: None -> the env-resolved default (at call
    time); 0 or negative -> inherit the session's shuffle conf (the
    old ``None`` spelling — no current caller uses it); positive ->
    pin exactly that many state stores."""
    if state_partitions is None:
        return _default_state_partitions()
    return state_partitions if state_partitions > 0 else None


STAGE_ROOT = "/tmp/glue_etl_pyspark_spark_stream_stage"


def stage_stream_dir(sf_dir: str, table: str = "events") -> str:
    """Create (once) a directory of symlinks to ``{sf_dir}/{table}
    .parquet`` — the file-stream source dir.

    The source may be a single parquet FILE (the driver fixtures) or
    a Spark-written DIRECTORY of part files (probe clones, real
    tables): the file-stream source does not follow a symlinked
    subdirectory, so a directory source is staged as one symlink per
    part file. A directory staged as a file-symlink drains ZERO rows
    silently — the r8 10x streaming probe found exactly that."""
    key = sf_dir.strip("/").replace("/", "_")
    d = os.path.join(STAGE_ROOT, key, table)
    os.makedirs(d, exist_ok=True)
    _link_parquet(os.path.join(sf_dir, f"{table}.parquet"), d, table)
    return d


def _link_parquet(src: str, d: str, table: str) -> None:
    """Symlink a parquet source into stage dir ``d`` — one link for a
    single file, one link PER PART FILE for a Spark-written directory
    (the file-stream source does not follow a symlinked subdir).

    Directory sources are walked recursively with the relative layout
    mirrored as REAL directories (leaf files stay symlinks): a
    hive-partitioned source (nested key=value subdirs) must keep its
    path components so partition-column discovery still works, and the
    top-level-only scan staged ZERO links for it — the silent-empty-
    drain class this helper exists to prevent (ADVICE r8). Raises if a
    directory source yields no parquet files."""
    if os.path.isdir(src):
        linked = 0
        for root, _dirs, files in os.walk(src):
            rel = os.path.relpath(root, src)
            sub = d if rel == "." else os.path.join(d, rel)
            for name in sorted(files):
                if not name.endswith(".parquet"):
                    continue
                os.makedirs(sub, exist_ok=True)
                link = os.path.join(sub, name)
                if not os.path.islink(link):
                    os.symlink(os.path.join(root, name), link)
                linked += 1
        if linked == 0:
            raise FileNotFoundError(
                f"directory source {src!r} contains no .parquet files — "
                "a stream reading this stage dir would drain zero rows "
                "silently"
            )
    else:
        link = os.path.join(d, f"{table}.parquet")
        if not os.path.islink(link):
            os.symlink(src, link)


def events_stream(
    spark: SparkSession, sf_dir: str, staged_dir: str | None = None
) -> DataFrame:
    """The events table as a micro-batch stream with the same schema
    and ts conversion as the batch loader (io.load_table): raw
    TIMESTAMP(NANOS) longs become timestamp_ntz. ``staged_dir``
    overrides the file-source directory (e.g. the sentinel-augmented
    staging from ``stage_events_with_sentinel``)."""
    ensure_session_configs(spark)
    # schema from the batch reader (footer), including the raw ts long
    raw_schema = _parquet_schema(spark, f"{sf_dir}/events.parquet")
    stream = spark.readStream.schema(raw_schema).parquet(
        staged_dir or stage_stream_dir(sf_dir)
    )
    # Watermarks reject TIMESTAMP_NTZ ([EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE]),
    # so the stream carries ltz `timestamp`; the session tz is pinned to UTC
    # (session.RUNTIME_CONFS), so wall-clock values match the batch ntz ones,
    # and streaming queries cast window bounds back to ntz at output.
    if dict((f.name, f.dataType.simpleString()) for f in raw_schema.fields).get("ts") == "bigint":
        stream = stream.select(
            *[
                F.expr("timestamp_micros(ts div 1000)").alias("ts")
                if c == "ts"
                else F.col(c)
                for c in stream.columns
            ]
        )
    else:
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


class _state_partitions_conf:
    """Temporarily pin spark.sql.shuffle.partitions around a stream
    start: a stateful streaming query's STATE STORE count is fixed by
    this conf at its first micro-batch (and persisted in the
    checkpoint), so it must be sized to expected state volume, not
    inherited from the batch shuffle width — each state partition
    carries per-batch store open/commit overhead (measured ~4x wall
    time at 32-vs-8 on the 100k-event replay; a vanilla 200-partition
    session is worse). At scale you size UP for state that doesn't fit
    N stores; these bounded replays size down."""

    def __init__(self, spark, n: int | None):
        self.spark, self.n = spark, n

    def __enter__(self):
        if self.n is not None:
            self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
            self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))

    def __exit__(self, *exc):
        if self.n is not None:
            self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class rocksdb_state_conf:
    """Temporarily select the RocksDB state-store provider around a
    stream start. The provider is captured at the query's FIRST
    micro-batch (and recorded in the checkpoint), like the partition
    count — so it must be pinned for the whole drain, then restored.

    This is the 100 TB keyed-state answer: the default HDFS-backed
    provider keeps each partition's full state map on the executor
    heap, while RocksDB spills to local disk with an off-heap block
    cache, so watermark-bounded state (stream-stream joins, long
    session windows) can exceed memory. Provider choice changes WHERE
    state lives, never values — pinned by the
    stream≡stream≡batch equality test."""

    _CONFS = {
        "spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER,
        # changelog checkpointing: commit the per-batch delta instead
        # of snapshotting the full RocksDB instance — the production
        # mode for large state (snapshot upload cost stops scaling
        # with state size; recovery replays changelog onto the last
        # snapshot)
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
    }

    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.prev = {
            k: self.spark.conf.get(k, None) for k in self._CONFS
        }
        for k, v in self._CONFS.items():
            self.spark.conf.set(k, v)

    def __exit__(self, *exc):
        for k, old in self.prev.items():
            if old is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, old)


def drain_to_memory(
    df: DataFrame,
    mode: str = "append",
    await_seconds: int = 120,
    state_partitions: int | None = None,
) -> DataFrame:
    """Run a bounded streaming query to completion (availableNow) into
    a memory sink and return the sink's contents as a batch DataFrame.

    This is the test/driver harness for streaming queries — a real
    deployment replaces it with writeStream.format(...)
    .option("checkpointLocation", ...).start() and keeps the same
    upstream plan. Memory sink is driver-local by design; only use it
    on aggregated/bounded outputs. ``state_partitions`` sizes the
    state-store count for the bounded replay (see
    _state_partitions_conf); None (the default) resolves
    SPARK_GRAFT_STATE_PARTITIONS at call time, 0 inherits the session
    conf (see _resolve_state_partitions).
    """
    name = f"mem_sink_{os.getpid()}_{next(_MEM_COUNTER)}"
    spark = df.sparkSession
    with _state_partitions_conf(spark, _resolve_state_partitions(state_partitions)):
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(await_seconds)
    if not finished:
        q.stop()
        raise TimeoutError(
            f"streaming drain {name!r} did not finish within {await_seconds}s; "
            "sink contents would be partial"
        )
    return spark.table(name)


def drain_micro_batches(
    df: DataFrame,
    mode: str = "complete",
    total_input: int | None = None,
    await_seconds: int = 120,
    state_partitions: int | None = None,
) -> DataFrame:
    """Drain a stream whose source does NOT support availableNow (e.g.
    Python SimpleDataSourceStreamReader sources fall back to
    single-batch under that trigger): run continuous micro-batches
    until ``total_input`` source rows have been consumed by COMMITTED
    batches (or, if None, until an idle batch follows data), then stop.

    recentProgress only lists completed batches, so reaching the
    target guarantees the memory sink holds their output.

    Rows are accumulated per batchId across poll iterations:
    recentProgress is a ring buffer (default 100 entries), so a drain
    needing more micro-batches than the buffer holds would undercount
    if re-summed from the buffer alone."""
    import time

    name = f"mem_sink_{os.getpid()}_{next(_MEM_COUNTER)}"
    # conf stays pinned until the query stops: micro-batches keep
    # planning (and reading the conf) for the query's whole life
    with _state_partitions_conf(df.sparkSession, _resolve_state_partitions(state_partitions)):
        q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
        deadline = time.time() + await_seconds
        done = False
        rows_by_batch: dict[int, int] = {}
        last_batch_rows = None
        while time.time() < deadline:
            time.sleep(0.25)
            for p in q.recentProgress:
                rows_by_batch[p["batchId"]] = p["numInputRows"]
                last_batch_rows = p["numInputRows"]
            seen = sum(rows_by_batch.values())
            if total_input is not None:
                if seen >= total_input:
                    done = True
                    break
            elif rows_by_batch and seen > 0 and last_batch_rows == 0:
                done = True
                break
        q.stop()
        q.awaitTermination(await_seconds)
    if not done:
        want = f"{total_input} rows" if total_input is not None else "an idle batch"
        raise TimeoutError(
            f"streaming drain {name!r} did not reach {want} within "
            f"{await_seconds}s (committed {sum(rows_by_batch.values())} rows)"
        )
    return df.sparkSession.table(name)


def foreach_batch_collect(
    df: DataFrame, await_seconds: int = 120, state_partitions: int | None = None
) -> DataFrame:
    """TEST-ONLY demo drain: run a stream through ``foreachBatch``
    (the Glue streaming-sink hook), appending each micro-batch's rows
    into a DRIVER-SIDE accumulator, and return them as one batch
    DataFrame.

    The per-batch ``collect()`` makes this a driver-memory sink —
    bounded to small aggregated outputs (≲10k rows per batch; the
    registered query emits one row per event_type). It is never the
    production path: at scale, foreachBatch's batch_df writes straight
    to a distributed sink — see ``foreach_batch_to_parquet`` for that
    shape. foreachBatch itself still runs the batch plan distributed;
    only this demo's final hop collects."""
    spark = df.sparkSession
    batches: list = []
    schema = df.schema

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batches.extend(batch_df.collect())

    with _state_partitions_conf(spark, _resolve_state_partitions(state_partitions)):
        q = (
            df.writeStream.foreachBatch(sink)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(await_seconds)
    if not finished:
        q.stop()
        raise TimeoutError(
            f"foreachBatch drain did not finish within {await_seconds}s; "
            "collected batches would be partial"
        )
    return spark.createDataFrame(batches, schema) if batches else spark.createDataFrame([], schema)


def foreach_batch_to_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    await_seconds: int = 120,
    state_partitions: int | None = None,
) -> None:
    """Production-shape foreachBatch sink: every micro-batch is
    written DISTRIBUTED as partitioned parquet under
    ``{path}/batch_id=N`` — nothing ever crosses the driver.

    Writing each batch under its own ``batch_id=N`` directory makes
    the sink idempotent per batch: a replayed micro-batch (restart
    from checkpoint) overwrites its own directory instead of
    double-appending, which is the standard exactly-once recipe for
    file sinks without a transaction log (a table format with commits
    — e.g. an ACID lakehouse table — replaces this at larger scale).
    Readers scan ``path`` recursively; ``batch_id`` surfaces as a
    partition column and is dropped on re-read by the caller."""
    part = list(partition_by or [])

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        w = batch_df.write.mode("overwrite")
        if part:
            w = w.partitionBy(*part)
        w.parquet(f"{path}/batch_id={batch_id}")

    with _state_partitions_conf(df.sparkSession, _resolve_state_partitions(state_partitions)):
        q = (
            df.writeStream.foreachBatch(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(await_seconds)
    if not finished:
        q.stop()
        raise TimeoutError(
            f"foreachBatch parquet sink did not finish within {await_seconds}s; "
            f"{path} holds a partial batch set"
        )


def stage_events_with_sentinel(sf_dir: str, gap_days: int = 10) -> str:
    """Staging dir = events.parquet symlink + a far-future sentinel
    row in its own file. The sentinel's only job is to push the event
    -time watermark past every real row once consumed, so OUTER
    stream-stream joins can emit their unmatched (NULL-padded) rows
    before an availableNow drain terminates — without it the final
    watermark never passes the last real events and their state is
    held forever. The sentinel rows carry the REAL joined event types
    ('purchase' and 'click'): Catalyst pushes the type filter below
    the EventTimeWatermark operator, so a special sentinel type would
    be dropped before the watermark tracker ever saw it. They can
    never pollute the output — equal far-future timestamps satisfy no
    interval bound, and their own unmatched emission would require
    the watermark to pass their own ts, which it never does. The
    sentinel file mirrors the source's arrow schema exactly (ts unit
    included) so the file-stream source reads both files under one
    schema."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    key = sf_dir.strip("/").replace("/", "_")
    d = os.path.join(STAGE_ROOT, key, "events_wm")
    os.makedirs(d, exist_ok=True)
    src_path = os.path.join(sf_dir, "events.parquet")
    # directory-shaped tables stage per part file (same landmine as
    # stage_stream_dir: a dir staged as one file-symlink drains ZERO
    # real rows and the sentinel alone produces empty windows)
    _link_parquet(src_path, d, "events")
    sentinel = os.path.join(d, "sentinel.parquet")
    if not os.path.exists(sentinel):
        src = pq.read_table(src_path)
        ts_type = src.schema.field("ts").type
        unit_per_s = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[ts_type.unit]
        max_raw = pc.max(src.column("ts").cast(pa.int64())).as_py()
        far = max_raw + gap_days * 86400 * unit_per_s
        tbl = pa.table({
            "event_id": pa.array([-1, -2], src.schema.field("event_id").type),
            "ts": pa.array([far, far], pa.int64()).cast(ts_type),
            "user_id": pa.array([-1, -1], src.schema.field("user_id").type),
            "event_type": pa.array(["purchase", "click"], pa.string()),
            "value": pa.array([0.0, 0.0], pa.float64()),
            "props": pa.array(["{}", "{}"], pa.string()),
        }).select(src.schema.names)
        pq.write_table(tbl, sentinel, coerce_timestamps=ts_type.unit if ts_type.unit in ("us", "ms") else None)
    return d
