"""Round-6 scale probe: one notch above bench (10x sf0.1 by default)
for the window-heavy / not-yet-probed §2.16 ops VERDICT r5 item 5
names: hybrid_search_rrf, text_autocomplete_index,
events_rolling_correlation, cohort_ltv_curve,
sample_weighted_systematic.

Synthesizes Nx documents / embeddings / events from sf0.1 into /tmp
(derived data never committed), links the small TPC-H tables through,
then times each query end-to-end (full materialization via count()).
Results land as rows in SCALING.md §Measured; this script is the
reproducible recipe.

Usage: python scripts/probe_r6_window_ops.py [factor]   (default 10)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"
OUT = "/tmp/glue_etl_pyspark_spark_probe_r6"

PROBED = (
    "hybrid_search_rrf",
    "text_autocomplete_index",
    "events_rolling_correlation",
    "cohort_ltv_curve",
    "sample_weighted_systematic",
    # round-7 spill block (never driver-checked; probed here so their
    # scale rows exist before their window turn): the prefix-filtered
    # AllPairs join is the quadratic-danger one, the rest read the
    # cloned documents/embeddings/events tables
    "dedup_jaccard_prefix",
    "knn_triplet_mining",
    "join_asof_tolerance",
    "events_ewma_control",
    "langid_confusion_matrix",
)


def synthesize(spark, factor: int) -> None:
    from glue_etl_pyspark_spark.io import TABLE_NAMES, load_table

    os.makedirs(OUT, exist_ok=True)
    clones = spark.range(factor).withColumnRenamed("id", "c")

    docs = load_table(spark, SF_DIR, "documents")
    n_docs = docs.count()
    (
        docs.crossJoin(F.broadcast(clones))
        .select(
            (F.col("doc_id") + F.col("c") * n_docs).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
        .write.mode("overwrite")
        .parquet(f"{OUT}/documents.parquet")
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    n_emb = emb.count()
    (
        emb.crossJoin(F.broadcast(clones))
        .withColumn("new_id", F.col("vec_id") + F.col("c") * n_emb)
        .select(
            F.col("new_id").alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: (
                    x
                    + F.sin(F.col("new_id") * 0.7 + i.cast("double") * 0.13)
                    * 0.02
                    * F.col("c").cast("double")
                ).cast("float"),
            ).alias("embedding"),
            "label",
        )
        .write.mode("overwrite")
        .parquet(f"{OUT}/embeddings.parquet")
    )

    # events: clone with shifted ids and users but the SAME calendar —
    # daily volumes grow Nx, which is exactly the stress the
    # domain-bounded window queries (rolling correlation, LTV curve)
    # must absorb in their pre-aggregation stage.
    ev = load_table(spark, SF_DIR, "events")
    n_ev = ev.count()
    n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    (
        ev.crossJoin(F.broadcast(clones))
        .select(
            (F.col("event_id") + F.col("c") * n_ev).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("c") * n_users).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .write.mode("overwrite")
        .parquet(f"{OUT}/events.parquet")
    )

    for t in TABLE_NAMES:
        dst = f"{OUT}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SF_DIR}/{t}.parquet", dst)


def main(factor: int = 10) -> None:
    from glue_etl_pyspark_spark.registry import load_all
    from glue_etl_pyspark_spark.session import get_spark

    spark = get_spark()
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
        # second run: steady-state (scan caches warm), the number the
        # SCALING.md row quotes alongside the cold one
        t0 = time.time()
        fn(spark, OUT).count()
        warm = time.time() - t0
        print(
            f"{name} {factor}x: {n} rows, cold {wall:.2f}s, warm {warm:.2f}s",
            flush=True,
        )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
