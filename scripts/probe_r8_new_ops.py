"""Round-8 scale probe (VERDICT r7 item 3): one notch above bench for
the round-7 additions before their driver-window turn —
`join_interval_overlap` (span fan-out at 10x events),
`graph_bfs_khop` (edge build at 10x fact density), plus the two cheap
new queries and the post-rework `langid_confusion_matrix` 10x number
that round 7 never recorded.

Reuses probe_r6_window_ops.synthesize (10x documents/embeddings/events
clones in /tmp, TPC-H tables symlinked), then REPLACES the lineitem and
orders symlinks with consistent Nx clones (orderkeys shifted in
lockstep; cust/supp keys unchanged) so the BFS edge build sees an Nx
denser trade multigraph before its distinct — the data-sized stage of
that query; the frontier iteration itself is bounded by the 25-node
domain regardless.

Usage: python scripts/probe_r8_new_ops.py [factor] [--no-synth]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"
OUT = "/tmp/glue_etl_pyspark_spark_probe_r8"

PROBED = (
    "join_interval_overlap",
    "agg_salted_hotkey",
    "text_normalize_clean",
    "graph_bfs_khop",
    "langid_confusion_matrix",
)


def synthesize(spark, factor: int) -> None:
    import probe_r6_window_ops as r6

    r6.OUT = OUT  # same recipe, round-8 dir
    r6.synthesize(spark, factor)

    clones = spark.range(factor).withColumnRenamed("id", "c")
    from glue_etl_pyspark_spark.io import load_table

    for t in ("lineitem", "orders"):
        if os.path.islink(f"{OUT}/{t}.parquet"):
            os.unlink(f"{OUT}/{t}.parquet")
    li = load_table(spark, SF_DIR, "lineitem")
    o = load_table(spark, SF_DIR, "orders")
    n_ord = o.agg(F.max("o_orderkey")).collect()[0][0] + 1
    (
        o.crossJoin(F.broadcast(clones))
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("c") * n_ord)
        .drop("c")
        .write.mode("overwrite")
        .parquet(f"{OUT}/orders.parquet")
    )
    (
        li.crossJoin(F.broadcast(clones))
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("c") * n_ord)
        .drop("c")
        .write.mode("overwrite")
        .parquet(f"{OUT}/lineitem.parquet")
    )


def main(factor: int = 10, skip_synth: bool = False) -> None:
    from glue_etl_pyspark_spark.registry import load_all
    from glue_etl_pyspark_spark.session import get_spark

    spark = get_spark()
    if skip_synth and os.path.exists(f"{OUT}/lineitem.parquet"):
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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(
        int(args[0]) if args else 10,
        skip_synth="--no-synth" in sys.argv,
    )
