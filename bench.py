#!/usr/bin/env python
"""Benchmark harness (BASELINE.md protocol).

Runs the headline queries — one per SURVEY.md §2 category — at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]; per query: 1 untimed warm-up, then the
median of 3 timed runs. Each run materializes the full result via a
noop write (count() would let Catalyst prune the very operators being
measured; collect() would bill driver transfer instead of compute).

Prints ONE JSON line:
  {"metric": "headline_total", "value": <sum of medians>, "unit": "sec",
   "queries": {name: median_sec, ...}, "sf": <float>}
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from glue_etl_pyspark_spark.registry import load_all
from glue_etl_pyspark_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",       # flagship: scan + filter + hash agg
    "join_multiway_revenue",    # join-heavy: 5-way broadcast star join
    "agg_rollup",               # agg-heavy: multi-level rollup
    "window_ranking",           # window functions
    "topk_per_group",           # top-k per group
    "join_asof_purchase_click", # as-of time join
    "text_tfidf",               # text: explode + join + window
    "dedup_ngram_jaccard",      # dedup: inverted shingle index
    "knn_bruteforce_cosine",    # knn: vector math + rank
    "stream_tumbling",          # streaming micro-batch drain
]

N_TIMED = 3


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def time_query(spark, fn, sf_dir: str) -> tuple[float, float]:
    """(median, min) of N_TIMED runs after one untimed warm-up. The
    median is the contract metric (unchanged since BASELINE.md); the
    min is an additions-only robustness signal (VERDICT r16 item 8):
    this box carries bursty hypervisor steal, so one multi-second
    burst inside a 3-rep window can set the median — the min survives
    any single burst and lets a reader separate steal from
    regression without re-running."""
    times = []
    for i in range(N_TIMED + 1):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        materialize(fn(spark, sf_dir))
        dt = time.perf_counter() - t0
        if i > 0:  # first run is the untimed warm-up
            times.append(dt)
    return statistics.median(times), min(times)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    # 1-min load at launch: this box's numbers carry a documented
    # post-suite load tail (BASELINE.md "bench protocol") — recording
    # it lets a reader adjudicate tail-vs-regression from the JSON
    # alone instead of cross-referencing BASELINE prose.
    load_at_launch = round(os.getloadavg()[0], 2)
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    results: dict[str, float] = {}
    mins: dict[str, float] = {}
    for name in HEADLINE:
        med, mn = time_query(spark, specs[name].fn, sf_dir)
        results[name] = round(med, 3)
        mins[name] = round(mn, 3)
        print(f"# {name}: {results[name]:.3f}s (min {mins[name]:.3f}s)", file=sys.stderr)
    total = round(sum(results.values()), 3)
    # contract fields unchanged (metric/value/unit/queries/sf);
    # queries_min / value_min are ADDITIONS ONLY (VERDICT r16 item 8)
    print(json.dumps({
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": results,
        "queries_min": mins,
        "value_min": round(sum(mins.values()), 3),
        "sf": sf,
        "load_at_launch": load_at_launch,
    }))


if __name__ == "__main__":
    main()
