"""Deduplication operators for LLM-training-data pipelines
(SURVEY.md §2.12): exact, MinHash-LSH, SimHash banding, exact n-gram
Jaccard.

100 TB design rules applied throughout: dedup keys are fixed-width
hashes (shuffle the 64-char digest, never the document body); all
candidate generation is inverted-index / band-bucket equi-joins (no
document cross products); hot-key blowup is bounded by document-
frequency filters.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import shingles, simhash64, tokenize_ws


def exact_dedup(
    df: DataFrame,
    cols: Sequence[str],
    tie_break: Sequence[str],
) -> DataFrame:
    """Keep one row per distinct value of ``cols`` — the first under
    ``tie_break`` ordering (deterministic, unlike ``dropDuplicates``).

    Rows shuffle on ``sha2`` of the dedup columns, not the columns
    themselves: constant-width shuffle keys regardless of document
    size. Digest collisions (2^-256) are accepted by design.
    """
    key = F.sha2(F.concat_ws("\x00", *[F.col(c) for c in cols]), 256)
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in tie_break])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs via an inverted shingle
    index: explode distinct shingles → equi-join on shingle → count
    shared → exact |A∩B| / |A∪B| ≥ threshold. Emits (id_a, id_b,
    jaccard) with id_a < id_b.

    ``max_shingle_df`` drops shingles appearing in more than that many
    docs before pairing — the standard bound on hot-key pair blowup
    (a shingle shared by m docs yields m² candidate pairs).
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles(tokenize_ws(text_col), n)).alias("sh"),
    ).filter(F.size("sh") > 0)
    sizes = sh.select("id", F.size("sh").alias("n_sh"))
    inv = sh.select("id", F.explode("sh").alias("shingle"))
    if max_shingle_df is not None:
        hot = (
            inv.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("shingle")
        )
        inv = inv.join(hot, "shingle", "anti")
    a = inv.select(F.col("id").alias("id_a"), "shingle")
    b = inv.select(F.col("id").alias("id_b"), "shingle")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs via 64-bit SimHash with band blocking: the bit
    array splits into ``bands`` equal slices; any pair agreeing on at
    least one full band becomes a candidate (guaranteed to catch every
    pair with hamming < bands by pigeonhole), then exact hamming ≤
    ``max_hamming`` verifies. Emits (id_a, id_b, hamming_dist).

    Candidate generation is a band-value equi-join — shuffle keys are
    (band_index, 16-bit slice), so the plan is hash-partitionable and
    never compares all pairs.
    """
    width = 64 // bands
    sh = df.select(
        F.col(id_col).alias("id"), simhash64(tokenize_ws(text_col)).alias("bits")
    )
    banded = sh.select(
        "id",
        "bits",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bnd: F.concat_ws(
                    "", F.slice("bits", bnd * width + 1, width)
                ),
            )
        ).alias("band", "band_val"),
    )
    a = banded.select(
        F.col("id").alias("id_a"), F.col("bits").alias("bits_a"), "band", "band_val"
    )
    b = banded.select(
        F.col("id").alias("id_b"), F.col("bits").alias("bits_b"), "band", "band_val"
    )
    cands = (
        a.join(b, ["band", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "bits_a", "bits_b")
        .distinct()
    )
    ham = F.aggregate(
        F.zip_with("bits_a", "bits_b", lambda x, y: (x != y).cast("int")),
        F.lit(0),
        lambda s, x: s + x,
    )
    return (
        cands.withColumn("hamming_dist", ham)
        .filter(F.col("hamming_dist") <= max_hamming)
        .select("id_a", "id_b", "hamming_dist")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hash_tables: int = 8,
    num_features: int = 1 << 18,
    max_jaccard_distance: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Approximate near-dup pairs via pyspark.ml MinHashLSH over
    hashed shingle sets. Randomized but seed-stable; not oracle-
    comparable (use ``ngram_jaccard_pairs`` as the exact twin).
    Emits (id_a, id_b, jaccard_dist)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sh = df.select(
        F.col(id_col).alias("id"),
        shingles(tokenize_ws(text_col), n).alias("sh"),
    ).filter(F.size("sh") > 0)
    tf = HashingTF(inputCol="sh", outputCol="features", numFeatures=num_features, binary=True)
    feats = tf.transform(sh)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed
    )
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, max_jaccard_distance, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            "jaccard_dist",
        )
    )
