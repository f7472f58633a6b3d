"""Retrieval-flavored corpus queries (round 5): BM25 ranking and a
fully VALUE-oracled MinHash-LSH (portable hash family).

``dedup_minhash_lsh`` (pyspark.ml, seeded murmur) is rows-only by
necessity; ``dedup_minhash_portable`` re-expresses the same
signature→band→bucket-join pipeline over the md5-polynomial hash
family (queries/sketches._md5_mod), which DuckDB evaluates
bit-identically — so the whole LSH chain gets a hash-checked oracle,
the same upgrade the CMS/Bloom sketches got in round 4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokenize_ws
from ..io import load_table
from ..registry import query
from .llm_text import _DUCK_TOKS
from .sketches import _md5_mod, _md5_mod_at, _md5_mod_at_spark

# --- BM25 ----------------------------------------------------------

_BM25_TERMS = ("hash", "vector", "filter")
_BM25_K1 = "1.2"
_BM25_B = "0.75"
_BM25_TOPK = 50

_TERMS_SQL = "(" + ", ".join(f"'{t}'" for t in _BM25_TERMS) + ")"

# Per-(doc,term) BM25 partial; summed over the FIXED term list in a
# FIXED order (one conditional aggregate per term, added left to
# right) so the 3-double addition is bit-identical on both engines.
_BM25_SCORE = (
    "(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)"
    f" * (tf * ({_BM25_K1} + 1.0))"
    f" / (tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl / avgdl)))"
)

BM25_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
), dls AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM toks
), stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(dl) AS BIGINT) * 1.0 / COUNT(*) AS avgdl
  FROM dls
), occ AS (
  SELECT doc_id, unnest(toks) AS term FROM toks
), tfs AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM occ WHERE term IN {_TERMS_SQL} GROUP BY doc_id, term
), dfs AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tfs GROUP BY term
), scored AS (
  SELECT t.doc_id, t.term, {_BM25_SCORE} AS s
  FROM tfs t
  JOIN dfs USING (term)
  JOIN dls USING (doc_id)
  CROSS JOIN stats
), pivoted AS (
  SELECT doc_id,
    coalesce(SUM(CASE WHEN term = '{_BM25_TERMS[0]}' THEN s END), 0.0)
      + coalesce(SUM(CASE WHEN term = '{_BM25_TERMS[1]}' THEN s END), 0.0)
      + coalesce(SUM(CASE WHEN term = '{_BM25_TERMS[2]}' THEN s END), 0.0)
      AS raw
  FROM scored GROUP BY doc_id
)
SELECT doc_id, floor(raw * 1e6) / 1e6 AS bm25
FROM pivoted
ORDER BY floor(raw * 1e6) / 1e6 DESC, doc_id
LIMIT {_BM25_TOPK}
"""


@query("text_bm25_topk", oracle=BM25_ORACLE, category="llm-text")
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranking (k1=1.2, b=0.75) of the corpus for a fixed query,
    top-50. The per-(doc,term) score is one arithmetic expression over
    integer tf/df/dl/N (identical doubles on both engines); the doc
    score adds the per-term conditional sums in FIXED order, then
    floor-pins at 6 dp with a unique tie-break — the full-text scoring
    shape, hash-checked. Scale: one tf shuffle on (doc, term) for the
    3 query terms only (the IN filter prunes at scan), df/avgdl are
    tiny broadcasts; top-k is TakeOrderedAndProject."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokenize_ws("text").alias("toks"))
    dls = toks.select(
        "doc_id", F.size("toks").cast("bigint").alias("dl")
    )
    stats = dls.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl") * F.lit(1.0) / F.count("*")).alias("avgdl"),
    )
    occ = toks.select("doc_id", F.explode("toks").alias("term"))
    tfs = (
        occ.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfs = tfs.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tfs.join(F.broadcast(dfs), "term")
        .join(dls, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", F.expr(_BM25_SCORE).alias("s"))
    )
    per_term = [
        F.coalesce(
            F.sum(F.when(F.col("term") == t, F.col("s"))), F.lit(0.0)
        )
        for t in _BM25_TERMS
    ]
    pivoted = scored.groupBy("doc_id").agg(
        (per_term[0] + per_term[1] + per_term[2]).alias("raw")
    )
    return (
        pivoted.select(
            "doc_id", (F.floor(F.col("raw") * 1e6) / 1e6).alias("bm25")
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(_BM25_TOPK)
    )


# --- portable MinHash-LSH ------------------------------------------

_MH_K = 8          # signature length
_MH_BANDS = 2      # bands of 4 rows each: 1-(1-s^4)^2 candidate curve
_MH_ROWS = 4       # (4x2 was measured far too permissive on this
                   # small-vocab corpus: moderate-similarity docs
                   # collided at ~68% and candidates went quadratic)
_MH_MOD = 16777216  # 2^24 — the md5-polynomial fragment's 6 hex digits

# 8 hashes from TWO md5 evaluations per shingle (4 six-digit slices
# each) — the hashing stage is the linear cost of the banding build,
# so halving-twice the md5 count matters at corpus scale
_MH_FRAGS = {
    f"h{j}": _md5_mod_at(
        "shingle", "mhA" if j < 4 else "mhB", _MH_MOD, 6 * (j % 4)
    )
    for j in range(_MH_K)
}

# Spark-side hot-path twins (one md5 + conv per fragment instead of six
# digit parses — bit-identical, pinned in tests/test_sketches.py). The
# oracle keeps the polynomial _MH_FRAGS; Spark query bodies use these.
_MH_FRAGS_SPARK = {
    f"h{j}": _md5_mod_at_spark(
        "shingle", "mhA" if j < 4 else "mhB", _MH_MOD, 6 * (j % 4)
    )
    for j in range(_MH_K)
}

_MH_CORPUS_SQL = f"""
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000,
         array_to_string(({_DUCK_TOKS})[1:len({_DUCK_TOKS}) - 1], ' ')
  FROM documents
"""

_MH_SIG_COLS_SQL = ",\n    ".join(
    f"MIN({frag}) AS h{j}" for j, frag in enumerate(_MH_FRAGS.values())
)

_MH_BAND_SQL = "\n  UNION ALL\n".join(
    "SELECT id, {b} AS band, {ks} FROM sig".format(
        b=b,
        ks=", ".join(
            f"h{_MH_ROWS * b + r} AS k{r + 1}" for r in range(_MH_ROWS)
        ),
    )
    for b in range(_MH_BANDS)
)

MINHASH_PORTABLE_ORACLE = f"""
WITH corpus AS ({_MH_CORPUS_SQL}),
sh AS (
  SELECT doc_id AS id, unnest(list_distinct(
    list_transform(range(1, len(toks) - 2),
      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])
  )) AS shingle
  FROM (SELECT doc_id, {_DUCK_TOKS} AS toks FROM corpus)
  WHERE len(toks) >= 4
),
sig AS (
  SELECT id,
    {_MH_SIG_COLS_SQL}
  FROM sh GROUP BY id
),
bands AS (
  {_MH_BAND_SQL}
)
SELECT a.id AS id_a, b.id AS id_b,
  CAST(COUNT(*) AS BIGINT) AS n_bands
FROM bands a
JOIN bands b
  ON a.band = b.band AND a.k1 = b.k1 AND a.k2 = b.k2
  AND a.k3 = b.k3 AND a.k4 = b.k4 AND a.id < b.id
GROUP BY a.id, b.id
"""


@query(
    "dedup_minhash_portable",
    oracle=MINHASH_PORTABLE_ORACLE,
    category="llm-dedup",
)
def dedup_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs with a VALUE oracle: 8 minhashes
    over distinct 4-gram shingles (md5-polynomial hash family — both
    engines compute identical integers), banded 2x4; documents
    sharing a band bucket become candidates (id_a < id_b, with the
    shared-band count). Same banding scale shape as simhash/LSH —
    bucket equi-join on (band, k1, k2), never all-pairs — but unlike
    the seeded-murmur ml.feature path the entire chain is
    hash-checked. Corpus = documents ∪ perturbed twins (llm_dedup
    fixture), so planted near-dups are the expected collisions."""
    d = load_table(spark, sf_dir, "documents")
    ws = tokenize_ws("text")
    twins = d.select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.array_join(
            F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))), " "
        ).alias("text"),
    )
    corpus = d.select("doc_id", "text").unionByName(twins)
    toks = corpus.select(
        F.col("doc_id").alias("id"), tokenize_ws("text").alias("toks")
    ).filter(F.size("toks") >= 4)
    sh = toks.select(
        "id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - 4),
                    lambda i: F.concat_ws(
                        " ",
                        F.col("toks")[i],
                        F.col("toks")[i + 1],
                        F.col("toks")[i + 2],
                        F.col("toks")[i + 3],
                    ),
                )
            )
        ).alias("shingle"),
    )
    sig = sh.groupBy("id").agg(
        *[
            F.min(F.expr(frag)).alias(f"h{j}")
            for j, frag in enumerate(_MH_FRAGS_SPARK.values())
        ]
    )
    bands = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        *[
                            F.col(f"h{_MH_ROWS * b + r}").alias(f"k{r + 1}")
                            for r in range(_MH_ROWS)
                        ],
                    )
                    for b in range(_MH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select(
        "id", "bk.band", *[f"bk.k{r + 1}" for r in range(_MH_ROWS)]
    )
    keys = ["band"] + [f"k{r + 1}" for r in range(_MH_ROWS)]
    left = bands.select(F.col("id").alias("id_a"), *keys)
    right = bands.select(F.col("id").alias("id_b"), *keys)
    return (
        left.join(right, keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_bands"))
    )
