"""Distributed global dense rank + prefix-doubling suffix ranking.

The primitives behind exact-substring analysis (the ExactSubstr dedup
of Lee et al. 2022, "Deduplicating Training Data Makes Language
Models Better"): rank every (doc, pos) token suffix of a corpus in
full lexicographic order WITHOUT ever sorting the suffix strings —
Manber-Myers prefix doubling re-expressed as DataFrame rounds.

Scale design, in this repo's established shapes:

- ``dense_rank_shards`` is the two-phase driver-literal-bases scheme
  of ``operators.packing.sharded_prefix_sum`` applied to ranking: a
  per-shard window dense_rank at scan parallelism, one tiny
  per-shard DISTINCT-count collect, an exact Python prefix sum, and
  the offsets re-shipped as literal data (broadcast join). The shard
  key MUST respect the global key order (caller's contract) — here
  it always does, because we shard on the PREVIOUS round's dense
  rank, a dense integer: equal first-components land in one shard
  and shards tile the key space in order. No repartitionByRange
  sampling anywhere, so values are reproducible by construction
  (width-stressed in tests).
- ``suffix_ranks`` runs ceil(log2(max_len)) doubling rounds — the
  round count is bounded by the DOMAIN (document length), never by
  corpus size (the repo's recursion rule) — with an early-stop
  certificate: the per-shard distinct counts the ranking pass
  already collects sum to the number of distinct keys, and when that
  equals the suffix count every suffix rank is unique and further
  doubling cannot change the order. Each round is one edge-linear
  self-join (pos -> pos + 2^k) plus the sharded rank; label frames
  localCheckpoint per round (iterative-lineage rule).

Round 0 ranks single tokens via a global window over the DISTINCT
vocabulary — vocabulary-sized, the text_vocab_build precedent; at
100 TB vocabularies are ~1e7 and the same dense_rank_shards applies
with a hash-bucketed pre-shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions.text import tokenize_ws


def dense_rank_shards(
    df: DataFrame, shard_col: str, key_cols: list[str], out_col: str
) -> tuple[DataFrame, int]:
    """Add ``out_col`` = global dense rank (1-based) of ``key_cols``,
    given that ``shard_col`` tiles the key space in key order (all
    rows of shard s sort before all rows of shard s+1, and equal keys
    share a shard). Returns (frame, number of distinct keys) — the
    distinct total falls out of the offsets pass for free and is the
    caller's convergence certificate."""
    w = Window.partitionBy(shard_col).orderBy(*key_cols)
    # materialize: the counts pass below and the final join both read
    # this window — without truncation it runs twice per round
    local = df.withColumn("__lrk", F.dense_rank().over(w)).localCheckpoint(
        eager=True
    )
    counts = sorted(
        local.groupBy(shard_col)
        .agg(F.countDistinct(*key_cols).alias("__d"))
        .collect(),
        key=lambda r: r[shard_col],
    )
    rows, running = [], 0
    for r in counts:
        rows.append((int(r[shard_col]), running))
        running += int(r["__d"])
    bases = df.sparkSession.createDataFrame(
        rows, f"{shard_col} bigint, __base bigint"
    )
    out = (
        local.join(broadcast(bases), shard_col)
        .withColumn(out_col, (F.col("__base") + F.col("__lrk")).cast("bigint"))
        .drop("__lrk", "__base")
    )
    return out, running


def suffix_ranks(docs: DataFrame, max_rounds: int = 32) -> DataFrame:
    """(doc_id, pos, slen, r) — the dense lexicographic rank ``r`` of
    every whitespace-token suffix ``toks[pos:]`` (0-based pos) across
    the whole corpus; ``slen`` = suffix length in tokens. Two
    suffixes share a rank iff their token sequences are IDENTICAL.

    Prefix doubling: after round k, r orders suffixes by their first
    2^k tokens; the round-k+1 key is (r[pos], r[pos + 2^k] or 0) —
    the 0 placeholder sorts below every real rank, which is exactly
    the shorter-suffix-is-a-prefix rule. Rounds stop at
    ceil(log2(max_len)) (domain bound, asserted loudly) or earlier
    when the certificate says every rank is unique."""
    toks = docs.select("doc_id", tokenize_ws("text").alias("toks"))
    pe = toks.select(
        "doc_id",
        F.size("toks").alias("__n"),
        F.posexplode("toks").alias("pos", "tok"),
    ).select(
        "doc_id",
        F.col("pos").cast("bigint").alias("pos"),
        (F.col("__n") - F.col("pos")).cast("bigint").alias("slen"),
        "tok",
    )
    pe = pe.localCheckpoint(eager=True)
    n_suffix = pe.count()

    # round 0: vocabulary rank (global window over DISTINCT tokens —
    # vocabulary-sized; the text_vocab_build precedent)
    vocab = (
        toks.select(F.explode("toks").alias("tok"))
        .distinct()
        .withColumn(
            "__r0",
            F.dense_rank().over(Window.orderBy("tok")).cast("bigint"),
        )
    )
    ranks = (
        pe.join(broadcast(vocab), "tok")
        .select("doc_id", "pos", "slen", F.col("__r0").alias("r"))
        .localCheckpoint(eager=True)
    )

    max_len = toks.agg(F.max(F.size("toks"))).collect()[0][0] or 0
    rounds = max(1, (max_len - 1).bit_length())  # ceil(log2(max_len))
    if rounds > max_rounds:
        raise RuntimeError(
            f"suffix_ranks: domain bound ceil(log2({max_len})) = {rounds} "
            f"exceeds max_rounds={max_rounds} — raise it; this is a loud "
            "valve, not a truncation"
        )
    span = 1 + n_suffix // 256
    for k in range(rounds):
        step = 1 << k
        nxt = ranks.select(
            "doc_id",
            (F.col("pos") - step).alias("pos"),
            F.col("r").alias("r2"),
        )
        keyed = (
            ranks.join(nxt, ["doc_id", "pos"], "left")
            .withColumn("r2", F.coalesce("r2", F.lit(0)))
            .withColumn("__shard", F.expr(f"r div {span}"))
        )
        ranked, n_distinct = dense_rank_shards(
            keyed, "__shard", ["r", "r2"], "__nr"
        )
        ranks = ranked.select(
            "doc_id", "pos", "slen", F.col("__nr").alias("r")
        ).localCheckpoint(eager=True)
        if n_distinct == n_suffix:
            break  # certificate: every suffix rank unique — converged
    return ranks
