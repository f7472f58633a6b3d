"""Round-9 scale probes (VERDICT r8 items 6-7):

1. ``jaccard_prefix_100x`` — the PREFIX-FILTERED AllPairs path of
   ngram_jaccard_pairs at 100x documents (500k docs). Its df-ranking
   window (rank each doc's shingles by corpus document frequency) is
   the one stage whose cost model was asserted from the 10x probe
   only. Clone texts are made UNIQUE per clone (every token suffixed
   with the clone id — see the inline note: the interleaved-salt
   variant kept shingles shared across clones and blew up the
   candidate set) so candidate/output
   pair mass stays linear in the clone factor — isolating candidate
   generation + df window cost from the clone-quadratic output
   artifact the r4 100x probe measured (27.3M pairs).
2. ``bpe_10x`` — vocab_bpe_merges over the 10x clone: the corpus-scale
   token-count pass plus the per-round pair explode over the
   vocab-sized literal frame (the iterative family's last unprobed
   member).
3. ``triangles_dense`` — triangle_node_counts on a DENSER synthetic
   graph than the lineitem co-purchase projection (which stays sparse
   under cloning: more orders, same per-order density): a 300-node
   clique (4.5M triangles, hub degrees ~300) overlaid with 1M
   hash-scattered edges over 20k nodes. Exercises the
   degree-orientation cap and the out-adjacency intersection under
   real hub pressure.

Usage: python scripts/probe_r9.py [jaccard_prefix_100x|bpe_10x|triangles_dense ...]
(default: all). Results land as SCALING.md rows.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF = "/root/testdata/sf0.1"
DOCS_UNIQ_OUT = "/tmp/spark_graft_probe_docs100x_uniq"


def probe_jaccard_prefix_100x(spark) -> None:
    from pyspark.sql import functions as F

    from glue_etl_pyspark_spark.io import load_table
    from glue_etl_pyspark_spark.operators.dedup import ngram_jaccard_pairs

    if not os.path.exists(DOCS_UNIQ_OUT):
        docs = load_table(spark, SF, "documents")
        n = docs.count()
        clones = spark.range(100).withColumnRenamed("id", "c")
        (
            docs.crossJoin(F.broadcast(clones))
            .select(
                (F.col("doc_id") + F.col("c") * n).alias("doc_id"),
                # suffix every TOKEN with the clone id: the trigram
                # structure (and so the shingle df distribution) of
                # each clone is exactly the original corpus's, but
                # clones share zero shingles cross-clone — pair mass
                # stays linear in the clone factor. (A first attempt
                # INTERLEAVED one shared salt token between words;
                # that turns every shared WORD into a shared
                # (salt,w,salt) shingle — bigram-level candidate
                # blowup that spilled the disk to death. Token
                # suffixing is the correct uniqueness transform.)
                F.regexp_replace(
                    "text",
                    "(\\S+)",
                    F.concat(F.lit("$1zc"), F.col("c").cast("string")),
                ).alias("text"),
            )
            .write.mode("overwrite")
            .parquet(DOCS_UNIQ_OUT)
        )
    d = spark.read.parquet(DOCS_UNIQ_OUT)
    n_docs = d.count()
    for run in ("cold", "warm"):
        t0 = time.time()
        pairs = ngram_jaccard_pairs(
            d, "doc_id", "text", n=3, threshold=0.75, prefix_filter=True
        )
        cnt = pairs.count()
        dt = time.time() - t0
        print(
            f"jaccard_prefix 100x ({n_docs} docs): {cnt} pairs, "
            f"{run} {dt:.1f}s",
            flush=True,
        )
        spark.catalog.clearCache()


def probe_bpe_10x(spark) -> None:
    from probe_r6_window_ops import OUT, synthesize

    from glue_etl_pyspark_spark.registry import load_all

    if not os.path.exists(f"{OUT}/embeddings.parquet"):
        synthesize(spark, 10)
    fn = load_all()["vocab_bpe_merges"].fn
    t0 = time.time()
    n = fn(spark, OUT).count()
    cold = time.time() - t0
    t0 = time.time()
    fn(spark, OUT).count()
    warm = time.time() - t0
    print(
        f"vocab_bpe_merges 10x: {n} rows, cold {cold:.2f}s warm {warm:.2f}s",
        flush=True,
    )


def probe_triangles_dense(spark) -> None:
    from pyspark.sql import functions as F

    from glue_etl_pyspark_spark.queries.graph import triangle_node_counts

    clique = (
        spark.range(300)
        .withColumnRenamed("id", "u")
        .crossJoin(spark.range(300).withColumnRenamed("id", "v"))
        .filter(F.col("u") < F.col("v"))
    )
    scatter = spark.range(1_000_000).select(
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(20_000)).alias("u"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(20_000)).alias("v"),
    )
    edges = (
        clique.unionByName(
            scatter.select(
                F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
            ).filter(F.col("u") != F.col("v"))
        )
        .distinct()
    )
    n_edges = edges.count()
    for run in ("cold", "warm"):
        t0 = time.time()
        top = triangle_node_counts(edges).orderBy(
            F.desc("n_tri"), "node"
        ).limit(5).collect()
        dt = time.time() - t0
        print(
            f"triangles_dense ({n_edges} edges): top={[(r['node'], r['n_tri']) for r in top]} "
            f"{run} {dt:.1f}s",
            flush=True,
        )


PROBES = {
    "jaccard_prefix_100x": probe_jaccard_prefix_100x,
    "bpe_10x": probe_bpe_10x,
    "triangles_dense": probe_triangles_dense,
}


def main() -> None:
    from glue_etl_pyspark_spark.session import get_spark

    spark = get_spark()
    for name in sys.argv[1:] or list(PROBES):
        PROBES[name](spark)


if __name__ == "__main__":
    main()
