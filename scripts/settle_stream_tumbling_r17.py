"""Round-17 settle of stream_tumbling's state_partitions default
(VERDICT r16 item 1 — the one touched-and-regressed r16 driver row).

Driver conditions: each measurement is a FRESH python process with a
cold JVM running the bench.py protocol for stream_tumbling alone
(1 untimed warm-up + median of 3 noop-materialized runs, get_spark
session, local[$SPARK_GRAFT_CPUS]); state_partitions comes from
SPARK_GRAFT_STATE_PARTITIONS, resolved at call time since r17. The
orchestrator runs 3 fresh processes per setting interleaved (4, 8,
4, 8, ...) so host drift cancels, and reports per-setting medians of
the per-process medians. Run on an idle window; result lands in
BASELINE.md round-17.

Usage:
  python scripts/settle_stream_tumbling_r17.py            # orchestrate
  python scripts/settle_stream_tumbling_r17.py --child    # one process
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
REPS = 3


def child() -> None:
    from glue_etl_pyspark_spark.registry import load_all
    from glue_etl_pyspark_spark.session import get_spark

    spark = get_spark(app_name="settle_stream")
    spark.sparkContext.setLogLevel("ERROR")
    fn = load_all()["stream_tumbling"].fn
    times = []
    for i in range(4):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, SF).write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        if i > 0:
            times.append(dt)
    print(json.dumps({"median": statistics.median(times), "times": times}))


def main() -> None:
    results: dict[str, list[float]] = {"4": [], "8": []}
    for rep in range(REPS):
        for sp in ("4", "8"):
            env = dict(os.environ, SPARK_GRAFT_STATE_PARTITIONS=sp)
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child"],
                capture_output=True, text=True, env=env, check=True,
            ).stdout.strip().splitlines()[-1]
            med = json.loads(out)["median"]
            results[sp].append(med)
            print(f"rep {rep} state_partitions={sp}: median {med:.3f}s "
                  f"(load {os.getloadavg()[0]:.2f})", flush=True)
    for sp in ("4", "8"):
        print(f"state_partitions={sp}: median-of-medians "
              f"{statistics.median(results[sp]):.3f}s min {min(results[sp]):.3f}s")


if __name__ == "__main__":
    if "--child" in sys.argv:
        child()
    else:
        main()
