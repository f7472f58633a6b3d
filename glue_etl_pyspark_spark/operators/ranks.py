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
  doubling cannot change the order. Each round pairs (r[pos],
  r[pos + 2^k]) via lead() over the per-doc position window — no
  self-join anywhere — then runs the sharded rank; one
  localCheckpoint per round (iterative-lineage rule).

Round 0 ranks the DISTINCT token BIGRAMS (tok, next-tok-or-'') through
the same ``dense_rank_shards``, pre-sharded by the first two character
code points of the FIRST token (``ascii(substr(tok,1,1)) * 0x110000 +
ascii(substr(tok,2,1))``). UTF-8 byte order equals code-point order,
and Spark's default UTF8_BINARY string comparison is byte order, so
the leading-code-point shard tiles the (tok, tok2) sort order exactly
(equal pairs share a tok, hence a shard; a short token's missing
second char reads as ascii('')=0, which sorts below every real char —
matching "a" < "ab"; a missing NEXT token reads as tok2='', which
sorts below every real token — the shorter-suffix-is-a-prefix rule);
a HASH bucket would violate the shard contract. Ranking bigrams means
round 0 already orders suffixes by their first TWO tokens, so the
doubling loop starts at step 2 — one full corpus-scaled round deleted
from every caller (r17; bit-identical final ranks by construction:
the doubling invariant only needs round k to order by the first 2^k
tokens, and both paths end at coverage 2^ceil(log2(max_len))). This
also kills the r15 single-task global vocabulary window: at 100 TB
the pair sort spreads over ~1e3 leading-pair shards, and the
rank-attach join falls back from broadcast to merge above a fixed
row budget (memory bound, not a data-selectivity constant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.storagelevel import StorageLevel

from ..functions.text import tokenize_ws


def dense_rank_shards(
    df: DataFrame, shard_col: str, key_cols: list[str], out_col: str
) -> tuple[DataFrame, int]:
    """Add ``out_col`` = global dense rank (1-based) of ``key_cols``,
    given that ``shard_col`` tiles the key space in key order (all
    rows of shard s sort before all rows of shard s+1, and equal keys
    share a shard). ``df`` should be materialized (checkpointed) by
    the caller — this runs two passes over it (a per-shard
    DISTINCT-count collect, then the per-shard window + offset join).
    Returns (frame, number of distinct keys) — the distinct total
    falls out of the offsets pass for free and is the caller's
    convergence certificate. The returned frame is LAZY (one window +
    one broadcast join on top of ``df``); single-reference consumers
    can chain it without materializing."""
    counts = sorted(
        df.groupBy(shard_col)
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
    w = Window.partitionBy(shard_col).orderBy(*key_cols)
    out = (
        df.withColumn("__lrk", F.dense_rank().over(w))
        .join(broadcast(bases), shard_col)
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
    the shorter-suffix-is-a-prefix rule. Round 0 ranks token BIGRAMS
    (module docstring), so it already provides the k=0 coverage and
    the loop starts at step 2 — one corpus-scaled round deleted; the
    final ranks are bit-identical because each round's invariant
    (order by first 2^k tokens) and the terminal coverage
    2^ceil(log2(max_len)) are unchanged. The neighbor rank comes from
    ``lead(r, 2^k)`` over the (doc_id, pos) window — positions are
    consecutive per doc, so NO self-join exists anywhere in the loop
    (the r15 100x probe measured the join+double-checkpoint variant
    2.4x slower). One localCheckpoint per round (iterative-lineage
    rule; the lazy ranked frame has exactly one consumer — next
    round's keyed pass — so it needs no checkpoint of its own).
    Shards for the global dense rank tile r-space with span sized by
    the PREVIOUS round's distinct count — sizing by suffix count
    collapses round 1 into a single task while ranks still span only
    the vocabulary. Rounds stop at ceil(log2(max_len)) (domain bound,
    asserted loudly) or earlier when the certificate (distinct total
    == suffix count, i.e. every rank unique) fires."""
    toks = docs.select("doc_id", tokenize_ws("text").alias("toks"))
    # Each position's (tok, next-tok) pair is built by zip_with against
    # the 1-shifted token array (inputs evaluate once — the HOF capture
    # rule), so the bigram key needs NO window and no exchange: pe stays
    # a map-only projection of the scan. zip_with pads the shorter
    # (shifted) side with NULL at the last position -> tok2 = '', which
    # sorts below every real token (tokenize_ws drops empties), i.e.
    # exactly the shorter-suffix-is-a-prefix placeholder round 0 needs.
    bigrams = F.zip_with(
        "toks",
        F.slice("toks", 2, F.size("toks")),
        lambda x, y: F.struct(
            x.alias("t1"), F.coalesce(y, F.lit("")).alias("t2")
        ),
    )
    pe = toks.select(
        "doc_id",
        F.size("toks").alias("__n"),
        F.posexplode(bigrams).alias("pos", "bg"),
    ).select(
        "doc_id",
        F.col("pos").cast("bigint").alias("pos"),
        (F.col("__n") - F.col("pos")).cast("bigint").alias("slen"),
        F.col("bg.t1").alias("tok"),
        F.col("bg.t2").alias("tok2"),
    )
    # corpus-scaled and reused across every round plus the final join —
    # the winnow rule: persist(DISK_ONLY), never localCheckpoint (which
    # pins blocks in unified memory and fights the rounds' sorts for
    # heap at 500k+ docs).
    pe = pe.persist(StorageLevel.DISK_ONLY)
    # one materialization job yields BOTH loop bounds: the suffix count
    # (certificate target) and max doc length (round bound). max(slen)
    # == max token count, so the former separate toks.agg(max(size))
    # pass — a full re-tokenize of the corpus — is folded in (r16).
    stats = pe.agg(
        F.count(F.lit(1)).alias("__c"), F.max("slen").alias("__m")
    ).collect()[0]
    n_suffix = int(stats["__c"])
    max_len = int(stats["__m"] or 0)

    # round 0: BIGRAM vocabulary rank through dense_rank_shards,
    # pre-sharded by the first token's first two character code points
    # (order-tiling — see module docstring). The distinct pass reads
    # the persisted pe (map-side partial distinct: the exchange carries
    # per-task distinct pairs, bigram-vocabulary-sized output), so the
    # former separate re-tokenize scan for the unigram vocab is gone
    # too. DISK_ONLY: the bigram vocabulary is corpus-bounded, not
    # constant-size — the winnow localCheckpoint rule.
    vocab = (
        pe.select("tok", "tok2")
        .distinct()
        .withColumn(
            "__shard",
            # ascii() is INT — promote before the multiply (ANSI rule:
            # code point 0x65E5 * 0x110000 overflows int32)
            F.ascii(F.substring("tok", 1, 1)).cast("bigint")
            * F.lit(0x110000)
            + F.ascii(F.substring("tok", 2, 1)).cast("bigint"),
        )
        .localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    )
    vocab, n_distinct = dense_rank_shards(
        vocab, "__shard", ["tok", "tok2"], "__r0"
    )
    vr = vocab.select("tok", "tok2", "__r0")
    # rank-attach join: broadcast while the bigram vocabulary fits the
    # endorsed driver-literal/broadcast budget; above it (a 100 TB-class
    # pair vocabulary) fall back to a merge join — one vocabulary-keyed
    # corpus exchange, still strictly cheaper than the full doubling
    # round this bigram round replaces (2 corpus exchanges + checkpoint)
    if n_distinct <= 2_000_000:
        ranks = pe.join(broadcast(vr), ["tok", "tok2"])
    else:
        ranks = pe.join(vr.hint("merge"), ["tok", "tok2"])
    ranks = ranks.select(
        "doc_id", "pos", F.col("__r0").cast("bigint").alias("r")
    )

    rounds = max(1, (max_len - 1).bit_length())  # ceil(log2(max_len))
    if rounds > max_rounds:
        raise RuntimeError(
            f"suffix_ranks: domain bound ceil(log2({max_len})) = {rounds} "
            f"exceeds max_rounds={max_rounds} — raise it; this is a loud "
            "valve, not a truncation"
        )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    # round 0 already covers 2 tokens (= the k=0 doubling round), so
    # the loop starts at k=1: one corpus-scaled round deleted (r17).
    # The certificate check moves to the loop TOP so a bigram round
    # that already separated every suffix skips the loop entirely.
    for k in range(1, rounds):
        if n_distinct == n_suffix:
            break  # certificate: every suffix rank unique — converged
        step = 1 << k
        span = 1 + n_distinct // 256
        wsh = Window.partitionBy("__shard").orderBy("r", "r2")
        lrk = (
            ranks.select(
                "doc_id",
                "pos",
                "r",
                F.coalesce(F.lead("r", step).over(wdoc), F.lit(0)).alias(
                    "r2"
                ),
            )
            .withColumn("__shard", F.expr(f"r div {span}"))
            # Fused round (r16): the per-shard dense_rank runs in the
            # SAME job as the lead() pairing and the checkpoint stores
            # the already-ranked rows. The per-shard distinct count is
            # then just max(__lrk) — dense_rank's ceiling — collected
            # from the checkpoint, so the former dense_rank_shards
            # groupBy(shard).countDistinct(r, r2) pass (a second
            # corpus-sized exchange + sort-distinct per round) is gone:
            # 3 corpus-sized exchanges per round -> 2. Values are
            # unchanged by construction — base + local dense rank with
            # base = sum of lower shards' distinct counts, exactly what
            # dense_rank_shards computed (equality pinned in
            # tests/test_suffixes.py).
            .withColumn("__lrk", F.dense_rank().over(wsh))
            .select("doc_id", "pos", "__shard", "__lrk")
            # corpus-scaled round frame: lineage must truncate each
            # round (iterative rule) but the unroll must NOT go through
            # the memory store — the default MEMORY_AND_DISK localCheckpoint
            # hard-OOM'd the 8g JVM mid-unroll at 35M suffixes (r16)
            # while 32 tasks unrolled concurrently. DISK_ONLY keeps the
            # truncation and streams straight to disk.
            .localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
        )
        counts = sorted(
            lrk.groupBy("__shard").agg(F.max("__lrk").alias("__d")).collect(),
            key=lambda row: row["__shard"],
        )
        rows, running = [], 0
        for row in counts:
            rows.append((int(row["__shard"]), running))
            running += int(row["__d"])
        bases = lrk.sparkSession.createDataFrame(
            rows, "__shard bigint, __base bigint"
        )
        n_distinct = running
        ranks = (
            lrk.join(broadcast(bases), "__shard")
            .select(
                "doc_id",
                "pos",
                (F.col("__base") + F.col("__lrk")).cast("bigint").alias("r"),
            )
        )
    ranks = ranks.localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    # corpus-scaled on both sides — merge hint (broadcast would build
    # a suffix-count hash table on the driver)
    return ranks.join(
        pe.select("doc_id", "pos", "slen").hint("merge"), ["doc_id", "pos"]
    )
