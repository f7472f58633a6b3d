"""Round-17 labeled-stage attribution of dedup_ngram_jaccard's
32-core anti-scaling (VERDICT r16 item 6: the driver measured it
FASTER at 8 cores than 32 at sf0.1, ratio 0.66).

One fresh process per core count (pass cores as argv). Runs the
bench protocol for dedup_ngram_jaccard (warm-up + 3 timed reps), then
dumps the completed stages of the LAST rep from the UI REST API —
name, executor runtime, task count, bytes — so the wall can be
attributed to kernel compute vs exchange/Arrow/scheduling overhead.

Usage:
  python scripts/probe_r17_ngram_scaling.py 32
  python scripts/probe_r17_ngram_scaling.py 8
Results land in SCALING.md round-17.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.loads(r.read())


def main() -> None:
    cores = sys.argv[1] if len(sys.argv) > 1 else "32"
    os.environ["SPARK_GRAFT_CPUS"] = cores
    from glue_etl_pyspark_spark.registry import load_all
    from glue_etl_pyspark_spark.session import get_spark

    spark = get_spark(app_name=f"ngram_scaling_c{cores}")
    spark.sparkContext.setLogLevel("ERROR")
    fn = load_all()["dedup_ngram_jaccard"].fn
    times = []
    marker = set()
    for i in range(4):
        spark.catalog.clearCache()
        if i == 3:
            marker = {
                (s["stageId"], s["attemptId"])
                for s in _rest(spark, "/stages?status=complete")
            }
        t0 = time.perf_counter()
        fn(spark, SF).write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        if i > 0:
            times.append(dt)
    time.sleep(0.5)
    stages = [
        s for s in _rest(spark, "/stages?status=complete")
        if (s["stageId"], s["attemptId"]) not in marker
    ]
    stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    print(f"cores={cores}: median {statistics.median(times):.3f}s "
          f"min {min(times):.3f}s times={['%.3f' % t for t in times]} "
          f"load {os.getloadavg()[0]:.2f}")
    tot_rt = sum(s["executorRunTime"] for s in stages)
    print(f"last-rep stages: {len(stages)}, total executor runtime "
          f"{tot_rt/1000:.2f}s (across {cores} threads)")
    for s in stages[:8]:
        nm = (s.get("name") or "").split("\n")[0][:60]
        print(f"  stage {s['stageId']}: rt {s['executorRunTime']/1000:.2f}s "
              f"tasks {s['numCompleteTasks']} "
              f"shufR {s.get('shuffleReadBytes', 0)>>10}KB "
              f"shufW {s.get('shuffleWriteBytes', 0)>>10}KB | {nm}")


if __name__ == "__main__":
    main()
