"""Round-8 100x probes (reproducible recipes for the SCALING.md rows):

1. agg_bitmap_distinct over 100x events with the user-id space
   expanded 100x (distinct counts genuinely grow) — fixed-width
   bitmap state two orders above bench scale.
2. The two vectorized dedup kernels over 100x documents (500k docs)
   — per-doc cost flatness of the shuffle-free mapInPandas stages.

Usage: python scripts/probe_r8_100x.py [bitmap|kernels]   (default both)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
BITMAP_OUT = "/tmp/spark_graft_probe_bitmap_100x"
DOCS_OUT = "/tmp/spark_graft_probe_docs100x"
TABLES = (
    "region nation customer supplier part orders lineitem documents embeddings"
).split()


def probe_bitmap(spark) -> None:
    from pyspark.sql import functions as F

    from glue_etl_pyspark_spark.io import load_table
    from glue_etl_pyspark_spark.registry import load_all

    if not os.path.exists(f"{BITMAP_OUT}/events.parquet"):
        os.makedirs(BITMAP_OUT, exist_ok=True)
        ev = load_table(spark, SF, "events")
        clones = spark.range(100).withColumnRenamed("id", "c")
        (
            ev.crossJoin(F.broadcast(clones))
            .select(
                (F.col("event_id") + F.col("c") * 10_000_000).alias("event_id"),
                (F.col("user_id") + F.col("c") * 15_000).alias("user_id"),
                "event_type",
                "ts",
                "value",
                "props",
            )
            .write.mode("overwrite")
            .parquet(f"{BITMAP_OUT}/events.parquet")
        )
        for t in TABLES:
            dst = f"{BITMAP_OUT}/{t}.parquet"
            if not os.path.exists(dst):
                os.symlink(f"{SF}/{t}.parquet", dst)
    fn = load_all()["agg_bitmap_distinct"].fn
    t0 = time.time()
    rows = fn(spark, BITMAP_OUT).collect()
    cold = time.time() - t0
    t0 = time.time()
    fn(spark, BITMAP_OUT).count()
    warm = time.time() - t0
    print(
        f"agg_bitmap_distinct 100x: {sorted(r['n_users'] for r in rows)} "
        f"distinct/type, cold {cold:.2f}s warm {warm:.2f}s",
        flush=True,
    )


def probe_kernels(spark) -> None:
    from pyspark.sql import functions as F

    from glue_etl_pyspark_spark.io import load_table
    from glue_etl_pyspark_spark.operators.dedup import (
        hashed_shingles_kernel,
        simhash_bits_kernel,
    )

    if not os.path.exists(DOCS_OUT):
        docs = load_table(spark, SF, "documents")
        n = docs.count()
        clones = spark.range(100).withColumnRenamed("id", "c")
        (
            docs.crossJoin(F.broadcast(clones))
            .select((F.col("doc_id") + F.col("c") * n).alias("doc_id"), "text")
            .write.mode("overwrite")
            .parquet(DOCS_OUT)
        )
    d = spark.read.parquet(DOCS_OUT).repartition(64, "doc_id")
    for label, df in (
        ("simhash_bits_kernel", simhash_bits_kernel(d, "doc_id", "text")),
        ("hashed_shingles_kernel n=4", hashed_shingles_kernel(d, "doc_id", "text", 4)),
    ):
        t0 = time.time()
        n = df.count()
        cold = time.time() - t0
        t0 = time.time()
        df.count()
        warm = time.time() - t0
        print(
            f"{label} 100x ({n} docs): cold {cold:.2f}s warm {warm:.2f}s",
            flush=True,
        )


def main() -> None:
    from glue_etl_pyspark_spark.session import get_spark

    spark = get_spark()
    which = sys.argv[1:] or ["bitmap", "kernels"]
    if "bitmap" in which:
        probe_bitmap(spark)
    if "kernels" in which:
        probe_kernels(spark)


if __name__ == "__main__":
    main()
