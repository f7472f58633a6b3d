"""Round-8 breadth probe: one notch above bench (10x sf0.1 clones,
reusing the probe_r6 synthesis) for scale-interesting queries that
never had a probe row — events analytics, retrieval, packing,
profiling, graph, and the round-8 additions. Each runs end-to-end
(count() materialization), cold + warm; rows land in SCALING.md.

Usage: python scripts/probe_r8_breadth.py [name ...]   (default: all)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PROBED = (
    "basket_association_rules",
    "agg_bitmap_distinct",
    "events_funnel",
    "retention_cohort",
    "events_markov_transitions",
    "events_drift_psi",
    "events_gap_fill_hourly",
    "text_bm25_topk",
    "hybrid_search_rrf",
    "text_inverted_index",
    "doc_pack_greedy",
    "doc_pack_sequences",
    "graph_triangles_topk",
    "graph_pagerank_topk",
    "dq_join_skew_report",
    "profile_table_stats",
)


def main() -> None:
    from probe_r6_window_ops import OUT, synthesize

    from glue_etl_pyspark_spark.registry import load_all
    from glue_etl_pyspark_spark.session import get_spark

    spark = get_spark()
    if not os.path.exists(f"{OUT}/embeddings.parquet"):
        t0 = time.time()
        synthesize(spark, 10)
        print(f"synth done in {time.time() - t0:.1f}s", flush=True)
    names = sys.argv[1:] or PROBED
    reg = load_all()
    for name in names:
        fn = reg[name].fn
        t0 = time.time()
        n = fn(spark, OUT).count()
        cold = time.time() - t0
        spark.catalog.clearCache()
        t0 = time.time()
        fn(spark, OUT).count()
        warm = time.time() - t0
        print(
            f"{name} 10x: {n} rows, cold {cold:.2f}s, warm {warm:.2f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
