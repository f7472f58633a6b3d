#!/usr/bin/env python
"""Dump .explain("formatted") for named queries to plans/r16/<name>_<tag>.txt.

Usage: python scripts/dump_plans_r16.py <tag> [names...]
Default names = bench.py HEADLINE. Mostly plan-only, but queries with
in-function collects / driver-orchestrated loops (e.g.
quantile_bisect_exact's radix passes) execute real jobs while the
frame is built — only the FINAL frame's plan is dumped (ADVICE r16).
Streaming queries are skipped (no batch plan to format).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from glue_etl_pyspark_spark.registry import load_all
from glue_etl_pyspark_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "join_multiway_revenue",
    "agg_rollup",
    "window_ranking",
    "topk_per_group",
    "join_asof_purchase_click",
    "text_tfidf",
    "dedup_ngram_jaccard",
    "knn_bruteforce_cosine",
    # stream_tumbling drains a stream; no single batch plan — skipped.
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"plans-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
