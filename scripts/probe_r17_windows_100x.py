"""Round-17 labeled-stage pass over the events_rolling / window
family at 100x (VERDICT r16 item 5 — no stage timing since r11).

Reuses the r13 events clone (sf0.1 events x100 = ~30M rows, event_id
and user_id shifted per clone so per-user windows stay real-width
while the key space scales). For each query: run query -> noop with a
job description, then read the COMPLETED stages from the Spark UI
REST API and report the top stages by duration (name, tasks, input /
shuffle bytes). The table lands in SCALING.md round-17.

Usage: python scripts/probe_r17_windows_100x.py [names...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
OUT = "/tmp/spark_graft_probe_events_100x"

QUERIES = (
    "events_rolling_hourly",
    "events_rolling_correlation",
    "events_gap_fill_hourly",
    "events_seasonal_baseline",
    "events_winsorize_bounds",
    "window_tumbling_batch",
    "window_sliding_batch",
    "window_session_batch",
    "window_chained_batch",
    "window_frames",
)


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.loads(r.read())


def completed_stages(spark) -> dict[int, dict]:
    out = {}
    for s in _rest(spark, "/stages?status=complete"):
        out[(s["stageId"], s["attemptId"])] = s
    return out


def fmt_bytes(n: int) -> str:
    for unit in ("B", "KB", "MB", "GB"):
        if n < 1024:
            return f"{n:.0f}{unit}"
        n /= 1024
    return f"{n:.1f}TB"


def main() -> None:
    from glue_etl_pyspark_spark.registry import load_all
    from glue_etl_pyspark_spark.session import get_spark

    names = sys.argv[1:] or list(QUERIES)
    spark = get_spark(app_name="probe_r17_windows_100x")
    spark.sparkContext.setLogLevel("ERROR")

    # reuse (or build) the r13 clone
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "probe_r13_events_100x",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "probe_r13_events_100x.py"),
    )
    r13 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(r13)
    r13.build_clone()

    reg = load_all()
    for name in names:
        spark.catalog.clearCache()
        before = completed_stages(spark)
        spark.sparkContext.setJobDescription(f"r17probe:{name}")
        t0 = time.time()
        reg[name].fn(spark, OUT).write.mode("overwrite").format("noop").save()
        wall = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        time.sleep(0.5)
        after = completed_stages(spark)
        new = [s for k, s in after.items() if k not in before]
        new.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        print(f"\n== {name}: wall {wall:.1f}s, {len(new)} stages ==", flush=True)
        for s in new[:4]:
            nm = (s.get("name") or "").split("\n")[0][:70]
            print(
                f"  stage {s['stageId']}: runtime {s['executorRunTime']/1000:.1f}s "
                f"tasks {s['numCompleteTasks']} "
                f"in {fmt_bytes(s.get('inputBytes') or 0)} "
                f"shufR {fmt_bytes(s.get('shuffleReadBytes') or 0)} "
                f"shufW {fmt_bytes(s.get('shuffleWriteBytes') or 0)} | {nm}",
                flush=True,
            )


if __name__ == "__main__":
    main()
