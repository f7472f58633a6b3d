"""Round-7 scale probe (VERDICT r6 item 3): one notch above bench for
the r1-stale heavyweights whose window turn comes this round and that
have never had a probe row — the SimHash banding fan-out
(dedup_simhash_twins / dedup_simhash_pairs) and the range-join bucket
prefilter density (join_range_weekly).

Reuses probe_r6_window_ops.synthesize: Nx clones of sf0.1
documents/events/embeddings in /tmp (derived data never committed),
small TPC-H tables symlinked through. Each query runs end-to-end
(count() materialization), cold + warm. Results land as rows in
SCALING.md §Measured; this script is the reproducible recipe.

Usage: python scripts/probe_r7_stale_ops.py [factor]   (default 10)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBED = (
    "dedup_simhash_twins",
    "dedup_simhash_pairs",
    "join_range_weekly",
    "join_asof_purchase_click",
    "dedup_ngram_jaccard",
)


def main(factor: int = 10, skip_synth: bool = False) -> None:
    from probe_r6_window_ops import OUT, synthesize

    from glue_etl_pyspark_spark.registry import load_all
    from glue_etl_pyspark_spark.session import get_spark

    spark = get_spark()
    if skip_synth and os.path.exists(f"{OUT}/embeddings.parquet"):
        print(f"reusing existing {OUT} clone", flush=True)
    else:
        print(f"synthesizing {factor}x sf0.1 ...", flush=True)
        t0 = time.time()
        synthesize(spark, factor)
        print(f"synth done in {time.time() - t0:.1f}s", flush=True)

    reg = load_all()
    for name in PROBED:
        fn = reg[name].fn
        t0 = time.time()
        n = fn(spark, OUT).count()
        wall = time.time() - t0
        t0 = time.time()
        fn(spark, OUT).count()
        warm = time.time() - t0
        print(
            f"{name} {factor}x: {n} rows, cold {wall:.2f}s, warm {warm:.2f}s",
            flush=True,
        )


if __name__ == "__main__":
    # flags must not reach the int() factor parse (--no-synth alone
    # crashed the documented usage)
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(
        int(args[0]) if args else 10,
        skip_synth="--no-synth" in sys.argv,
    )
