"""One-off scale probe: synthesize Nx documents/embeddings from sf0.1
(derived data lands in /tmp, never committed) and measure the two
flagship LLM operators one notch past bench scale — wall time for
exact n-gram Jaccard dedup, wall time + recall@k for IVF knn vs the
brute-force ground truth. Results are recorded as rows in
SCALING.md §Measured; this script is the reproducible recipe.

Usage: python scripts/scale_probe.py [factor]   (default 10)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"
OUT = "/tmp/glue_etl_pyspark_spark_scale_probe"


def main(factor: int = 10) -> None:
    from glue_etl_pyspark_spark.io import load_table
    from glue_etl_pyspark_spark.operators.dedup import ngram_jaccard_pairs
    from glue_etl_pyspark_spark.operators.similarity import (
        ivf_build,
        ivf_search,
        knn_bruteforce,
    )
    from glue_etl_pyspark_spark.session import get_spark

    spark: SparkSession = get_spark()

    # --- synthesize: clone c=0..factor-1 with shifted ids; embedding
    # clones get a deterministic per-clone perturbation so ANN recall
    # is measured on near- (not exact-) duplicates
    docs = load_table(spark, SF_DIR, "documents")
    n_docs = docs.count()
    clones = spark.range(factor).withColumnRenamed("id", "c")
    big_docs = (
        docs.crossJoin(F.broadcast(clones))
        .select(
            (F.col("doc_id") + F.col("c") * n_docs).alias("doc_id"),
            F.col("text"),
        )
    )
    big_docs.write.mode("overwrite").parquet(f"{OUT}/documents")

    emb = load_table(spark, SF_DIR, "embeddings")
    n_emb = emb.count()
    # new id staged into its own column (never reference a same-select
    # lateral alias from inside a HOF lambda — CLAUDE.md trap)
    big_emb = (
        emb.crossJoin(F.broadcast(clones))
        .withColumn("new_id", F.col("vec_id") + F.col("c") * n_emb)
        .select(
            F.col("new_id").alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: (
                    x + F.sin(F.col("new_id") * 0.7 + i.cast("double") * 0.13)
                    * 0.02 * F.col("c").cast("double")
                ).cast("float"),
            ).alias("embedding"),
        )
    )
    big_emb.write.mode("overwrite").parquet(f"{OUT}/embeddings")

    bd = spark.read.parquet(f"{OUT}/documents")
    be = spark.read.parquet(f"{OUT}/embeddings").persist()
    print(f"probe inputs: {bd.count()} docs, {be.count()} vectors ({factor}x sf0.1)")

    # --- exact n-gram Jaccard dedup at Nx docs
    t0 = time.time()
    pairs = ngram_jaccard_pairs(bd, "doc_id", "text", n=4, threshold=0.6,
                                prefix_filter=False)
    n_pairs = pairs.count()
    t_dedup = time.time() - t0
    print(f"dedup_ngram {factor}x: {n_pairs} pairs in {t_dedup:.2f}s")

    # --- IVF at Nx vectors: build+search wall time, recall@5 vs brute force
    queries = be.filter(F.col("vec_id") < 100)
    t0 = time.time()
    # gemm = the documented scale-path assignment kernel (equality-
    # tested vs the oracle-anchored expr path at sf0.01)
    cents, members = ivf_build(be, assign="gemm")
    members = members.persist()
    members.count()
    t_build = time.time() - t0
    t0 = time.time()
    approx = ivf_search(queries, cents, members, k=5, nprobe=10)
    approx_set = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    t_search = time.time() - t0
    t0 = time.time()
    exact = knn_bruteforce(queries, be, k=5)
    exact_set = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    t_brute = time.time() - t0
    recall = len(approx_set & exact_set) / len(exact_set)
    n_cents = cents.count()
    print(
        f"ivf {factor}x: build {t_build:.2f}s ({n_cents} centroids), "
        f"search {t_search:.2f}s, recall@5 {recall:.3f} "
        f"(probed {10 / n_cents:.1%} of corpus), brute-force {t_brute:.2f}s"
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
