"""Per-batch timing for the stream_tumbling drain (VERDICT r9 item 5).

stream_tumbling's recorded wall-time swings 0.9 -> 6.7 s across runs
with an unchanged plan; the adjudication so far is ambient box load.
This script makes the swing attributable: it replicates the query's
exact drain (availableNow, memory sink, 8 state partitions) N times on
the current box and prints each run's StreamingQueryProgress duration
breakdown per micro-batch — triggerExecution, addBatch, getBatch,
queryPlanning, walCommit/commitOffsets, and state-operator update
times — so a slow run shows WHERE the time went (JVM/codegen warmup
lands in queryPlanning+addBatch of batch 0; state-store churn lands in
stateOperators; box load inflates everything uniformly).

Usage: python scripts/instrument_stream_tumbling.py [n_runs] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def one_run(spark, sf_dir: str, run: int) -> None:
    from pyspark.sql import functions as F

    from glue_etl_pyspark_spark.streaming.ops import (
        _state_partitions_conf,
        events_stream,
    )

    s = events_stream(spark, sf_dir)
    agg = (
        s.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    t0 = time.time()
    with _state_partitions_conf(spark, 8):
        q = (
            agg.writeStream.format("memory")
            .queryName(f"instr_tumbling_{run}")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    wall = time.time() - t0
    print(f"run {run}: wall={wall:.3f}s, {len(q.recentProgress)} batches")
    for p in q.recentProgress:
        d = p["durationMs"]
        state = [
            {
                "commitMs": so.get("commitTimeMs"),
                "rowsUpdated": so.get("numRowsUpdated"),
                "memUsed": so.get("memoryUsedBytes"),
            }
            for so in p.get("stateOperators", [])
        ]
        print(
            f"  batch {p['batchId']}: rows={p['numInputRows']} "
            f"durations={json.dumps(d)} state={json.dumps(state)}",
            flush=True,
        )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from glue_etl_pyspark_spark.session import get_spark

    spark = get_spark()
    for run in range(n):
        one_run(spark, sf_dir, run)


if __name__ == "__main__":
    main()
