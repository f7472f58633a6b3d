"""Exact repeated-substring structure via distributed suffix ranking
(round 15): the ExactSubstr primitive of Lee et al. 2022
("Deduplicating Training Data Makes Language Models Better") — find
the longest token sequences that occur more than once in the corpus,
exactly, without any hashing or sketching.

Spark side: Manber-Myers prefix doubling over (doc_id, pos) token
suffixes (operators/ranks.py) — ceil(log2(max doc tokens)) rounds of
a lead()-window rank pairing + a sharded global dense rank with
driver-literal offsets, stopping early on the uniqueness certificate.
Never a global sort of suffix strings. The classic suffix-array fact
makes the top-k exact: the maximum common prefix between ANY two
distinct suffixes is achieved by some pair ADJACENT in suffix order,
so the LCP array (plus duplicate-suffix groups, whose members match
in full) contains every longest-repeat witness.

Oracle: a genuinely DIFFERENT algorithm — DuckDB sorts the suffixes
directly (chr(1)-joined token strings; the separator byte sorts below
every token character, so string order == token-sequence order) and
computes the same LCP table. Pure integers + token strings, so the
whole pipeline is hash-checked end to end (the CC closure-oracle
discipline: iteration on one engine, direct construction on the
other)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.ranks import suffix_ranks
from ..registry import query
from .llm_text import _DUCK_TOKS

_SUF_TOPK = 20
_SAMPLE_TOKS = 8

REPEATED_SUBSTR_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
),
pos0 AS (
  SELECT doc_id,
         unnest(generate_series(0, CAST(len(toks) AS BIGINT) - 1)) AS pos
  FROM toks
),
suf AS (
  SELECT p.doc_id, CAST(p.pos AS BIGINT) AS pos,
         CAST(len(t.toks) - p.pos AS BIGINT) AS slen,
         array_to_string(t.toks[CAST(p.pos + 1 AS BIGINT):], chr(1)) AS s
  FROM pos0 p JOIN toks t USING (doc_id)
),
rk AS (SELECT *, dense_rank() OVER (ORDER BY s) AS r FROM suf),
g AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY r ORDER BY doc_id, pos) AS m
  FROM rk
),
wrep AS (
  SELECT p.r, p.doc_id, p.pos, p.slen,
         t.toks[CAST(p.pos + 1 AS BIGINT):] AS ta
  FROM g p JOIN toks t ON t.doc_id = p.doc_id WHERE p.m = 1
),
sec AS (SELECT r, doc_id, pos FROM g WHERE m = 2),
adj AS (
  SELECT a.doc_id AS doc_a, a.pos AS pos_a, b.doc_id AS doc_b,
         b.pos AS pos_b,
         COALESCE(NULLIF(list_position(list_transform(
             generate_series(1, CAST(least(a.slen, b.slen) AS BIGINT)),
             j -> a.ta[j] = b.ta[j]), false), 0) - 1,
           least(a.slen, b.slen)) AS lcp,
         a.ta AS ta
  FROM wrep a JOIN wrep b ON b.r = a.r + 1
),
ties AS (
  SELECT a.doc_id AS doc_a, a.pos AS pos_a, s.doc_id AS doc_b,
         s.pos AS pos_b, a.slen AS lcp, a.ta
  FROM wrep a JOIN sec s USING (r)
),
allp AS (SELECT * FROM adj UNION ALL SELECT * FROM ties)
SELECT CAST(lcp AS BIGINT) AS lcp, CAST(doc_a AS BIGINT) AS doc_a,
  CAST(pos_a AS BIGINT) AS pos_a, CAST(doc_b AS BIGINT) AS doc_b,
  CAST(pos_b AS BIGINT) AS pos_b,
  COALESCE(array_to_string(
    ta[1:CAST(least(lcp, {_SAMPLE_TOKS}) AS BIGINT)], ' '), '') AS sample
FROM allp
ORDER BY lcp DESC, doc_a, pos_a, doc_b, pos_b LIMIT {_SUF_TOPK}
"""


@query(
    "text_repeated_substrings",
    oracle=REPEATED_SUBSTR_ORACLE,
    category="llm-dedup",
)
def text_repeated_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 longest exactly-repeated token sequences in the corpus
    (the ExactSubstr dedup witness table): every row is a repeat of
    ``lcp`` tokens occurring at (doc_a, pos_a) and (doc_b, pos_b),
    with an 8-token sample. Pairs come from the suffix-order LCP
    array — rank-adjacent distinct suffixes — plus duplicate-suffix
    groups (full-length matches between their two smallest members);
    by the suffix-array adjacency fact that set contains every
    longest-repeat witness, so the top of this table IS the exact
    answer a quadratic all-pairs scan would give.

    Scale: suffix ranking is log2(max doc len) prefix-doubling rounds
    (domain-bounded + uniqueness certificate — operators/ranks.py),
    each a lead()-window rank pairing plus a sharded dense rank whose
    offsets ship as driver literals (the packing-bases discipline; no
    repartitionByRange sampling, no single-partition window over the
    corpus). The LCP stage touches only rank-group representatives
    (suffix-count rows, token arrays materialized per pair via one
    doc-keyed join) and zip_with evaluates its inputs once (the HOF
    capture rule). At 100 TB this is the shape ExactSubstr shards by
    rank ranges; nothing here sorts strings globally."""
    from ..functions.text import tokenize_ws

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokenize_ws("text").alias("toks"))

    ranks = suffix_ranks(d)
    wg = Window.partitionBy("r").orderBy("doc_id", "pos")
    g = ranks.withColumn("m", F.row_number().over(wg))
    rep = g.filter(F.col("m") == 1).drop("m")
    sec = g.filter(F.col("m") == 2).drop("m")

    # token arrays only for the representatives (rank-group count of
    # rows, not all suffixes x lengths)
    # every join below is group/corpus-scaled on BOTH sides — merge
    # hints keep AQE from broadcast-converting on deceptively small
    # compressed shuffle stats (the r15 100x probe OOM'd the 8g
    # driver building a broadcast of 350k token-array rows)
    wrep = rep.join(toks.hint("merge"), "doc_id").select(
        "r", "doc_id", "pos", "slen",
        F.expr("slice(toks, cast(pos + 1 as int), cast(slen as int))").alias("ta"),
    )
    a = wrep.select(
        F.col("r"),
        F.col("doc_id").alias("doc_a"), F.col("pos").alias("pos_a"),
        F.col("slen").alias("la"), F.col("ta"),
    )
    b = wrep.select(
        (F.col("r") - 1).alias("r"),
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pos_b"),
        F.col("slen").alias("lb"), F.col("ta").alias("tb"),
    )
    # Spark array_position returns 0 (not NULL) when absent — map the
    # no-mismatch case (one suffix is a prefix of the other) to
    # min(la, lb) explicitly
    mm = F.array_position(
        F.zip_with(
            F.slice("ta", 1, F.least("la", "lb").cast("int")),
            F.slice("tb", 1, F.least("la", "lb").cast("int")),
            lambda x, y: x == y,
        ),
        F.lit(False),
    )
    adj = a.join(b.hint("merge"), "r").select(
        "doc_a", "pos_a", "doc_b", "pos_b",
        F.when(mm > 0, mm - 1)
        .otherwise(F.least("la", "lb"))
        .cast("bigint")
        .alias("lcp"),
        "ta",
    )
    ties = (
        wrep.select(
            "r",
            F.col("doc_id").alias("doc_a"), F.col("pos").alias("pos_a"),
            F.col("slen").alias("lcp"), "ta",
        )
        .join(
            sec.select(
                "r",
                F.col("doc_id").alias("doc_b"), F.col("pos").alias("pos_b"),
            ).hint("merge"),
            "r",
        )
        .select("doc_a", "pos_a", "doc_b", "pos_b",
                F.col("lcp").cast("bigint").alias("lcp"), "ta")
    )
    allp = adj.unionByName(ties)
    return (
        allp.select(
            "lcp", "doc_a", "pos_a", "doc_b", "pos_b",
            F.array_join(
                F.slice("ta", 1, F.least("lcp", F.lit(_SAMPLE_TOKS)).cast("int")),
                " ",
            ).alias("sample"),
        )
        .orderBy(F.desc("lcp"), "doc_a", "pos_a", "doc_b", "pos_b")
        .limit(_SUF_TOPK)
    )
