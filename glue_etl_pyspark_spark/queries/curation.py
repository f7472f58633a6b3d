"""Corpus-curation and audit queries (round 5): token-budget
selection, per-language quality gating, OOV-rate scoring, referential
integrity audit, time-grid gap fill, and the train/valid/test split.

These close the remaining gaps between "scored corpus" and "training
mix": pick documents under a per-source token budget, gate on quality
within each language, measure tokenizer coverage, audit FK health
before a join-heavy pipeline, regularize an event stream onto a dense
time grid, and carve the reproducible three-way split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokenize_ws
from ..io import load_table
from ..operators.packing import sharded_prefix_sum
from ..registry import query
from .llm_text import _DUCK_TOKS

_BUDGET = 800          # tokens per source (bites at every fixture SF)
_BUDGET_SHARD = 250    # doc_id div span for the sharded running sum

TOKEN_BUDGET_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source, CAST(len({_DUCK_TOKS}) AS BIGINT) AS n_tokens
  FROM documents
), st AS (
  SELECT doc_id, source, n_tokens,
    CAST(SUM(n_tokens) OVER (
      PARTITION BY source ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
      AS BIGINT) AS start_tokens
  FROM toks
)
SELECT doc_id, source, n_tokens, start_tokens
FROM st WHERE start_tokens < {_BUDGET}
"""


@query("curation_token_budget", oracle=TOKEN_BUDGET_ORACLE, category="llm-curation")
def curation_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget selection (the epoch-mix quota cut):
    walk each source's documents in doc_id order and keep those that
    START under the budget — the deterministic "take the first N
    tokens of every source" step of mix planning. The running sum is
    the grouped two-phase sharded prefix sum (operators/packing.py):
    per-(source, id-shard) window at scan parallelism + driver-side
    literal base offsets, so no source ever becomes one corpus-sized
    window task. The oracle is the equivalent global window."""
    d = load_table(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id", "source",
        F.size(tokenize_ws("text")).cast("bigint").alias("n_tokens"),
    )
    summed = sharded_prefix_sum(
        docs, "doc_id", "n_tokens", _BUDGET_SHARD, group_cols=("source",)
    )
    return (
        summed.withColumn(
            "start_tokens", F.col("__base") + F.col("__local_start")
        )
        .filter(F.col("start_tokens") < _BUDGET)
        .select("doc_id", "source", "n_tokens", "start_tokens")
    )


QUALITY_GATE_ORACLE = """
WITH ranked AS (
  SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
    row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id)
      AS r,
    CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS n_lang
  FROM documents
)
SELECT lang, doc_id, n_chars, CAST(r AS BIGINT) AS r, n_lang
FROM ranked WHERE r <= (n_lang * 8) // 10
"""


@query("curation_quality_gate", oracle=QUALITY_GATE_ORACLE, category="llm-curation")
def curation_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality gating: keep the top 80% of each
    language's documents by a quality score (n_chars stands in for the
    model score), dropping the bottom quintile — the standard
    per-domain quality-threshold step. The 80% cut is INTEGER math
    (r <= n*8 div 10), never a percent_rank double compare, so both
    engines agree at every boundary; the rank's ORDER BY ends in
    doc_id (unique tie-break, repo determinism rule). At 100 TB the
    per-lang window shards exactly like length_bucket_packing's —
    langs are coarse buckets; the gate itself is rank-vs-count."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), "doc_id")
    wc = Window.partitionBy("lang")
    ranked = d.select(
        "lang", "doc_id", F.col("n_chars").cast("bigint").alias("n_chars")
    ).withColumn("r", F.row_number().over(w).cast("bigint")).withColumn(
        "n_lang", F.count("*").over(wc)
    )
    return ranked.filter(F.col("r") <= F.expr("(n_lang * 8) div 10"))


_VOCAB_K = 1000

OOV_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
), occ AS (
  SELECT doc_id, unnest(toks) AS token FROM toks
), freq AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM occ GROUP BY token
), vocab AS (
  SELECT token FROM freq ORDER BY c DESC, token LIMIT {_VOCAB_K}
), j AS (
  SELECT o.doc_id,
    CASE WHEN v.token IS NULL THEN 1 ELSE 0 END AS oov
  FROM occ o LEFT JOIN vocab v ON o.token = v.token
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
  CAST(SUM(oov) AS BIGINT) AS n_oov,
  (CAST(SUM(oov) AS BIGINT) * 1000000 // CAST(COUNT(*) AS BIGINT)) / 1e6
    AS oov_rate
FROM j GROUP BY doc_id
"""


@query("text_oov_rate", oracle=OOV_ORACLE, category="llm-quality")
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage scoring: each document's out-of-vocabulary
    rate against the corpus top-1000 vocabulary. The vocab is a
    distributed top-k (orderBy+limit plans as TakeOrderedAndProject —
    per-partition heaps, never a global single-partition rank window),
    then broadcasts into a left join flag. The rate is integer-scaled
    division (n_oov*1e6 div n_tokens), exact on both engines."""
    d = load_table(spark, sf_dir, "documents")
    occ = d.select("doc_id", F.explode(tokenize_ws("text")).alias("token"))
    freq = occ.groupBy("token").agg(F.count("*").alias("c"))
    vocab = (
        freq.orderBy(F.desc("c"), "token")
        .limit(_VOCAB_K)
        .select("token", F.lit(1).alias("__v"))
    )
    flagged = occ.join(F.broadcast(vocab), "token", "left").select(
        "doc_id", F.when(F.col("__v").isNull(), 1).otherwise(0).alias("oov")
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("oov").cast("bigint").alias("n_oov"),
        )
        .select(
            "doc_id", "n_tokens", "n_oov",
            (F.expr("(n_oov * 1000000) div n_tokens") / F.lit(1e6)).alias(
                "oov_rate"
            ),
        )
    )


_FK_RELATIONS = (
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
)

FK_ORPHANS_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{name}' AS relation,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM {child}) AS n_rows,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM {child} ch
   WHERE NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pk} = ch.{fk}))
    AS n_orphans"""
    for name, child, fk, parent, pk in _FK_RELATIONS
)


@query("dq_fk_orphans", oracle=FK_ORPHANS_ORACLE, category="governance")
def dq_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for every FK edge a
    join-heavy pipeline depends on (an orphan silently drops rows from
    inner joins — count them BEFORE the pipeline runs). Each edge is a
    left-anti join aggregate (NULL FKs count as orphans on both
    engines); the per-edge one-row crossJoin is literal-bounded, same
    as the governance suite's."""
    out = None
    for name, child, fk, parent, pk in _FK_RELATIONS:
        ch = load_table(spark, sf_dir, child)
        pa = load_table(spark, sf_dir, parent)
        orph = (
            ch.join(pa, ch[fk] == pa[pk], "left_anti")
            .agg(F.count("*").alias("n_orphans"))
        )
        tot = ch.agg(F.count("*").alias("n_rows"))
        row = tot.crossJoin(orph).select(
            F.lit(name).alias("relation"), "n_rows", "n_orphans"
        )
        out = row if out is None else out.unionAll(row)
    return out


GAP_FILL_ORACLE = """
WITH e AS (
  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h, value
  FROM events
), anchors AS (
  SELECT event_type, h, MAX(value) AS v FROM e GROUP BY event_type, h
), spans AS (
  SELECT event_type, MIN(h) AS h0, MAX(h) AS h1 FROM anchors
  GROUP BY event_type
), grid AS (
  SELECT s.event_type, CAST(t.g AS TIMESTAMP) AS h
  FROM spans s, unnest(generate_series(s.h0, s.h1, INTERVAL 1 HOUR)) AS t(g)
)
SELECT g.event_type, g.h,
  last_value(a.v IGNORE NULLS) OVER (
    PARTITION BY g.event_type ORDER BY g.h
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
  CAST(CASE WHEN a.v IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap
FROM grid g LEFT JOIN anchors a
  ON a.event_type = g.event_type AND a.h = g.h
"""


@query("events_gap_fill_hourly", oracle=GAP_FILL_ORACLE, category="analytics")
def events_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-grid regularization with forward fill: every event type
    gets a dense hourly grid over its own span; missing hours carry
    the last observed hourly max (sensor/metric resampling). The grid
    is a narrow per-type sequence explode (spans collapse to one row
    per type first); the fill is last(ignorenulls) over an
    (event_type)-partitioned window — type count is small, but each
    partition is only the GRID (hours), never the raw events, so the
    window input stays tiny at any corpus scale."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", "ts").alias("h"), "value"
    )
    anchors = e.groupBy("event_type", "h").agg(F.max("value").alias("v"))
    spans = anchors.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = spans.select(
        "event_type",
        F.explode(
            F.sequence("h0", "h1", F.expr("interval 1 hour"))
        ).alias("h"),
    )
    joined = grid.join(F.broadcast(anchors), ["event_type", "h"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        "h",
        F.last("v", ignorenulls=True).over(w).alias("filled_value"),
        F.when(F.col("v").isNull(), 1).otherwise(0).cast("bigint").alias(
            "is_gap"
        ),
    )


# exact 2^32 multiples of 0.8 / 0.9, rounded up — integer thresholds so
# both engines compare identical BIGINTs (same discipline as
# corpus_mix_resample)
_SPLIT_T1 = 3435973837  # ceil(0.8 * 2^32)
_SPLIT_T2 = 3865470566  # ceil(0.9 * 2^32)

_SPLIT_SQL = f"""CASE
  WHEN ((doc_id % 1000000007) * 2654435761) % 4294967296 < {_SPLIT_T1}
    THEN 'train'
  WHEN ((doc_id % 1000000007) * 2654435761) % 4294967296 < {_SPLIT_T2}
    THEN 'valid'
  ELSE 'test' END"""

SPLIT_ORACLE = f"""
SELECT lang, {_SPLIT_SQL} AS split_name,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
FROM documents
GROUP BY lang, {_SPLIT_SQL}
"""


@query("corpus_split_assign", oracle=SPLIT_ORACLE, category="llm-curation")
def corpus_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test assignment (80/10/10): the split
    is a pure function of doc_id (overflow-folded Knuth hash vs exact
    2^32-multiple thresholds), so reruns, retries, and any
    partitioning produce the SAME split — no RNG state to plumb, no
    shuffle beyond the reporting groupBy. Returns per-(lang, split)
    counts; the per-doc assignment is the same expression inline."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.withColumn("split_name", F.expr(_SPLIT_SQL))
        .groupBy("lang", "split_name")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars_total"),
        )
    )


INCR_DEDUP_ORACLE = f"""
WITH batch AS (
  SELECT doc_id + 20000 AS doc_id,
    CASE WHEN doc_id % 2 = 0 THEN text
         ELSE array_to_string(({_DUCK_TOKS})[1:len({_DUCK_TOKS}) - 1], ' ')
    END AS text
  FROM documents
), corpus_digests AS (
  SELECT DISTINCT sha256(text) AS digest FROM documents
)
SELECT b.doc_id, sha256(b.text) AS digest,
  CAST(CASE WHEN c.digest IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_dup
FROM batch b LEFT JOIN corpus_digests c ON c.digest = sha256(b.text)
"""


@query("dedup_incremental_batch", oracle=INCR_DEDUP_ORACLE, category="llm-dedup")
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (new-batch-vs-corpus) exact dedup — the daily-crawl
    shape: the batch joins the EXISTING corpus's content digests, not
    itself, so yesterday's corpus is a build-once digest table and the
    daily cost is one hash join on constant-width sha256 keys. The
    fixture batch replays documents with shifted ids: even doc_ids are
    byte-identical (dups), odd doc_ids drop their last word (new).
    At 100 TB the digest table is the thing you bucket/persist;
    the batch side streams against it."""
    d = load_table(spark, sf_dir, "documents")
    ws = tokenize_ws("text")
    batch = d.select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.when(F.col("doc_id") % 2 == 0, F.col("text"))
        .otherwise(
            F.array_join(
                F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))), " "
            )
        )
        .alias("text"),
    ).withColumn("digest", F.sha2("text", 256))
    corpus_digests = d.select(
        F.sha2("text", 256).alias("digest")
    ).distinct().withColumn("__hit", F.lit(1))
    return batch.join(corpus_digests, "digest", "left").select(
        "doc_id",
        "digest",
        F.when(F.col("__hit").isNull(), 0).otherwise(1).cast("bigint").alias(
            "is_dup"
        ),
    )


_TOK_VOCAB_K = 1000

TOKENIZE_IDS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
), occ AS (
  SELECT doc_id, toks[r.i] AS token, CAST(r.i AS BIGINT) AS pos
  FROM toks, unnest(range(1, len(toks) + 1)) AS r(i)
), freq AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM occ GROUP BY token
), ranked AS (
  SELECT token, row_number() OVER (ORDER BY c DESC, token) AS vid
  FROM (SELECT * FROM freq ORDER BY c DESC, token LIMIT {_TOK_VOCAB_K})
)
SELECT o.doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_tokens,
  CAST(SUM(CASE WHEN r.vid IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unk,
  array_to_string(list(coalesce(r.vid, 0) ORDER BY o.pos), ',') AS ids
FROM occ o LEFT JOIN ranked r ON r.token = o.token
GROUP BY o.doc_id
"""


@query("text_tokenize_to_ids", oracle=TOKENIZE_IDS_ORACLE, category="llm-text")
def text_tokenize_to_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenize step that feeds packing: map every document's
    token stream to vocab ids (top-1000 by frequency, UNK=0) and emit
    the id sequence in document order (serialized — atomic-column
    rule). The ranking window runs over the LIMITed 1000-row vocab
    only (TakeOrdered first); reassembly sorts (pos, id) structs
    per document — posexplode positions are unique, so the order is
    total. The id-sequence column is exactly what doc_pack_sequences'
    token counts summarize."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokenize_ws("text").alias("toks"))
    occ = toks.select(
        "doc_id", F.posexplode("toks").alias("pos", "token")
    ).withColumn("pos", F.col("pos") + 1)
    freq = occ.groupBy("token").agg(F.count("*").alias("c"))
    w = Window.orderBy(F.desc("c"), "token")
    ranked = (
        freq.orderBy(F.desc("c"), "token")
        .limit(_TOK_VOCAB_K)
        .withColumn("vid", F.row_number().over(w).cast("bigint"))
        .select("token", "vid")
    )
    flagged = occ.join(F.broadcast(ranked), "token", "left").select(
        "doc_id",
        "pos",
        F.coalesce(F.col("vid"), F.lit(0)).alias("vid"),
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("vid") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_unk"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "vid"))
                ),
                lambda s: s["vid"].cast("string"),
            ),
            ",",
        ).alias("ids"),
    )


_STRAT_N = 40

STRAT_EXACT_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
    ((doc_id % 1000000007) * 2654435761) % 4294967296 AS hkey
  FROM documents
), ranked AS (
  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
    row_number() OVER (PARTITION BY lang ORDER BY hkey, doc_id) AS rn
  FROM keyed
)
SELECT lang, doc_id, n_chars, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= {_STRAT_N}
"""


@query("sample_stratified_exact", oracle=STRAT_EXACT_ORACLE, category="llm-curation")
def sample_stratified_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-N-per-stratum sampling: each language contributes its
    first N=40 documents in deterministic pseudorandom order (the
    overflow-folded Knuth hash as the sort key, doc_id tie-break) —
    the eval-set builder that needs EXACTLY N per stratum where
    fraction-based sampling only gets close. The rank<=N filter plans
    as WindowGroupLimit (per-partition partial top-N before the
    shuffle — pinned), so no stratum ever materializes its full
    ordered partition. Fully deterministic: reruns and repartitionings
    pick the same N documents."""
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        (
            ((F.col("doc_id") % F.lit(1000000007)) * F.lit(2654435761))
            % F.lit(4294967296)
        ).alias("hkey"),
    )
    w = Window.partitionBy("lang").orderBy("hkey", "doc_id")
    return (
        keyed.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= _STRAT_N)
        .select("lang", "doc_id", "n_chars", "rn")
    )


from .sketches import _md5_mod  # noqa: E402  (SQL fragment builder)

_N_EPOCHS = 3
_N_SHARDS = 8
_ORD_MOD = 16777216  # 24-bit portable ordering hash

# Portable per-(epoch, doc) hash key: epoch and doc_id concatenated
# into one string expression valid verbatim in both dialects.
_EPOCH_KEY = "concat(cast(epoch as string), '|', cast(doc_id as string))"

EPOCH_SHUFFLE_ORACLE = f"""
WITH e AS (
  SELECT doc_id, t.epoch
  FROM documents, (SELECT epoch FROM range(0, {_N_EPOCHS}) t(epoch)) t
), h AS (
  SELECT epoch, doc_id,
    {_md5_mod(_EPOCH_KEY, "ep", _ORD_MOD)} AS ord_hash
  FROM e
)
SELECT CAST(epoch AS BIGINT) AS epoch,
  CAST(ord_hash % {_N_SHARDS} AS BIGINT) AS shard,
  doc_id,
  CAST(ROW_NUMBER() OVER (
    PARTITION BY epoch, ord_hash % {_N_SHARDS}
    ORDER BY ord_hash, doc_id) AS BIGINT) AS pos
FROM h
"""


@query("epoch_shuffle_shards", oracle=EPOCH_SHUFFLE_ORACLE, category="llm-curation")
def epoch_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible per-epoch training order: for each of 3 epochs,
    assign every document to one of 8 shards and a position within
    the shard, both derived from a portable md5 hash of (epoch,
    doc_id) — the epoch-shuffle a training loop needs so that every
    re-run, resume, and worker sees the SAME document order without
    shuffling the corpus bytes or keeping RNG state.

    Scale design: the hash is a scan-level expression (conv-based
    one-md5 fast twin on the Spark side, bit-identical to the
    oracle's polynomial form); the only shuffle is the per-(epoch,
    shard) row_number window — parallelism = epochs x shards, and at
    100 TB NSHARDS is sized so one shard is one task's worth of
    manifest rows (the window sorts manifest entries, never document
    bodies). ORDER BY ends in doc_id: unique key, deterministic."""
    from .sketches import _md5_mod_spark

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    epochs = d.select(
        "doc_id",
        F.explode(
            F.array(*[F.lit(e) for e in range(_N_EPOCHS)])
        ).alias("epoch"),
    )
    hashed = epochs.select(
        "epoch",
        "doc_id",
        F.expr(_md5_mod_spark(_EPOCH_KEY, "ep", _ORD_MOD)).alias("ord_hash"),
    ).withColumn("shard", (F.col("ord_hash") % _N_SHARDS).cast("bigint"))
    w = Window.partitionBy("epoch", "shard").orderBy("ord_hash", "doc_id")
    return hashed.select(
        F.col("epoch").cast("bigint").alias("epoch"),
        "shard",
        "doc_id",
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


_TE_K = 20  # smoothing pseudo-count

TARGET_ENCODE_ORACLE = f"""
WITH joined AS (
  SELECT p.p_brand AS brand,
    CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS is_ret
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), per_brand AS (
  SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(is_ret) AS BIGINT) AS n_ret
  FROM joined GROUP BY brand
), gstats AS (
  SELECT CAST((SUM(n_ret) * 1000000) // SUM(n) AS BIGINT) AS g_ppm
  FROM per_brand
)
SELECT b.brand, b.n, b.n_ret, g.g_ppm,
  CAST((b.n_ret * 1000000 + {_TE_K} * g.g_ppm) // (b.n + {_TE_K}) AS BIGINT)
    AS enc_ppm
FROM per_brand b CROSS JOIN gstats g
"""


@query("feature_target_encode", oracle=TARGET_ENCODE_ORACLE, category="ml-prep")
def feature_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding of a categorical feature (part brand
    -> historical return rate): the standard ML-preprocessing encode
    enc = (n_pos + k*prior) / (n + k), computed ENTIRELY in integer
    ppm arithmetic (integer DIV on both engines — no doubles, no
    rounding mode to disagree on). The prior is the global rate in
    ppm; k=20 pseudo-counts shrink rare brands toward it.

    Scale: one dim join (part is SF-scaled so it carries no broadcast
    hint — AQE size-converts at bench scale), one map-side-combined
    groupBy to brand grain, and the global prior is a one-row
    aggregate OF THE PER-BRAND FRAME (never a second corpus pass)
    cross-joined back broadcast — the decayed-popularity shape. The
    n_ret * 1e6 product overflows int64 only past ~9e12 rows per
    brand; at that scale fold to a wider unit first (msum stance)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_returnflag")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per_brand = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("bigint")
            .alias("n_ret"),
        )
    )
    glob = per_brand.agg(
        F.expr("(SUM(n_ret) * 1000000) DIV SUM(n)").cast("bigint").alias("g_ppm")
    )
    return per_brand.crossJoin(F.broadcast(glob)).select(
        "brand",
        "n",
        "n_ret",
        "g_ppm",
        F.expr(f"(n_ret * 1000000 + {_TE_K} * g_ppm) DIV (n + {_TE_K})")
        .cast("bigint")
        .alias("enc_ppm"),
    )


DATASHEET_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, source, n_chars,
    CAST(len({_DUCK_TOKS}) AS BIGINT) AS n_tokens,
    md5(text) AS h
  FROM documents
), base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(n_chars) AS BIGINT) AS total_chars,
    CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
    CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
    CAST(COUNT(DISTINCT h) AS BIGINT) AS n_distinct_texts,
    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en
  FROM toks
)
SELECT n_docs, total_chars, total_tokens, n_langs, n_sources,
  CAST(total_tokens // n_docs AS BIGINT) AS mean_tokens,
  CAST((n_en * 1000000) // n_docs AS BIGINT) AS en_ppm,
  CAST(((n_docs - n_distinct_texts) * 1000000) // n_docs AS BIGINT)
    AS dup_ppm
FROM base
"""


@query("corpus_datasheet", oracle=DATASHEET_ORACLE, category="llm-curation")
def corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dataset card (the datasheet a corpus release ships
    with): document/char/token totals, language and source breadth,
    mean document length, English share, and the exact-duplicate rate
    (1 - distinct text hashes / docs) — every figure exact-integer
    (DIV ppm), one pass over the corpus plus the distinct counts.

    Scale: a single aggregate; the distinct counts shuffle fixed-width
    md5 digests, never text. At 100 TB swap COUNT(DISTINCT h) for the
    mergeable HLL (agg_hll_portable) and the card stays one pass."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "lang",
        "source",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.size(tokenize_ws("text")).cast("bigint").alias("n_tokens"),
        F.md5("text").alias("h"),
    )
    base = t.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("h").alias("n_distinct_texts"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("bigint")
        .alias("n_en"),
    )
    return base.select(
        "n_docs",
        "total_chars",
        "total_tokens",
        "n_langs",
        "n_sources",
        F.expr("total_tokens DIV n_docs").cast("bigint").alias("mean_tokens"),
        F.expr("(n_en * 1000000) DIV n_docs").cast("bigint").alias("en_ppm"),
        F.expr("((n_docs - n_distinct_texts) * 1000000) DIV n_docs")
        .cast("bigint")
        .alias("dup_ppm"),
    )


_CURR_SHARDS = 8

CURRICULUM_ORACLE = f"""
WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
f AS (
  SELECT doc_id,
    CAST(len(toks) AS BIGINT) AS n_tok,
    CAST(len(array_to_string(toks, '')) AS BIGINT) * 1000 // len(toks) AS mean_len_milli,
    CAST(len(list_distinct(toks)) AS BIGINT) * 1000000 // len(toks) AS distinct_ppm
  FROM t
), scored AS (
  SELECT doc_id,
    CAST(2 * mean_len_milli + 3 * distinct_ppm + 500 * LEAST(n_tok, 100)
      AS BIGINT) AS difficulty,
    CAST(doc_id % {_CURR_SHARDS} AS BIGINT) AS shard
  FROM f
), r AS (
  SELECT doc_id, difficulty, shard,
    ROW_NUMBER() OVER (PARTITION BY shard ORDER BY difficulty, doc_id) AS rk,
    COUNT(*) OVER (PARTITION BY shard) AS n
  FROM scored
)
SELECT doc_id, difficulty, shard,
  CAST(((rk - 1) * 4) // n + 1 AS BIGINT) AS phase
FROM r
"""


@query("curriculum_phase_assign", oracle=CURRICULUM_ORACLE, category="llm-curation")
def curriculum_phase_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning phase assignment: rank documents easy->hard
    by an integer difficulty proxy (length/diversity features, the
    linear-gate family) and cut each hash-shard into 4 quartile
    phases — easy docs train first. Quartiles are PER-SHARD: each
    shard is a uniform doc_id sample, so shard quartiles converge to
    the global ones at scale while the ranking window stays
    parallel (the practical distributed-curriculum construction —
    never a single global row_number). Everything integer; ranks end
    in doc_id."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", tokenize_ws("text").alias("toks"))
    f = t.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tok"),
        F.expr("length(concat_ws('', toks)) * 1000 div size(toks)").alias(
            "mean_len_milli"
        ),
        F.expr("size(array_distinct(toks)) * 1000000 div size(toks)").alias(
            "distinct_ppm"
        ),
    )
    scored = f.select(
        "doc_id",
        F.expr("2 * mean_len_milli + 3 * distinct_ppm + 500 * LEAST(n_tok, 100)")
        .cast("bigint")
        .alias("difficulty"),
        (F.col("doc_id") % _CURR_SHARDS).cast("bigint").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("difficulty", "doc_id")
    wn = Window.partitionBy("shard")
    ranked = scored.select(
        "doc_id",
        "difficulty",
        "shard",
        F.row_number().over(w).cast("bigint").alias("rk"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("n"),
    )
    return ranked.select(
        "doc_id",
        "difficulty",
        "shard",
        F.expr("((rk - 1) * 4) DIV n + 1").cast("bigint").alias("phase"),
    )


SAMPLER_CHI2_ORACLE = """
WITH base AS (
  SELECT lang,
    CAST(COUNT(*) AS BIGINT) AS n_lang,
    CAST(SUM(CASE WHEN ((doc_id % 1000000007) * 2654435761) % 4294967296
                       < 429496730 THEN 1 ELSE 0 END) AS BIGINT) AS obs
  FROM documents GROUP BY lang
), tot AS (
  SELECT CAST(SUM(n_lang) AS BIGINT) AS n_total,
    CAST(SUM(obs) AS BIGINT) AS n_sel
  FROM base
), wide AS (
  SELECT b.lang, b.n_lang, b.obs,
    CAST((CAST(t.n_sel AS HUGEINT) * b.n_lang * 1000000) // t.n_total
         AS BIGINT) AS expected_micro
  FROM base b, tot t
), dev AS (
  SELECT lang, n_lang, obs, expected_micro,
    obs * 1000000 - expected_micro AS dev_micro
  FROM wide
)
SELECT lang, n_lang, obs, expected_micro,
  CAST((CAST(dev_micro AS HUGEINT) * dev_micro)
       // GREATEST(expected_micro, 1) AS BIGINT) AS chi2_term_ppm
FROM dev
"""


@query("dq_sampler_chi2", oracle=SAMPLER_CHI2_ORACLE, category="governance")
def dq_sampler_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goodness-of-fit audit of the deterministic hash sampler: per
    language, the observed selection count vs the proportional
    expectation and the chi-square contribution — the statistical QA
    a pipeline runs to prove its ~10% subset is not biased by
    language (a skewed hash would show a fat chi2 term). All exact
    integer arithmetic, reduced BEFORE squaring: the expectation is
    floored to micro units (n_sel*n_lang*1e6 DIV n_total, accumulated
    in DECIMAL(38,0)/HUGEINT so the triple product never touches
    int64), the deviation dev_micro = obs*1e6 - expected_micro stays
    int64 to ~9e12 docs per language, and dev_micro^2 is squared in
    DECIMAL(38,0) (≤1e38) before the single integer division — the
    unreduced (obs*N - sel*n)^2 form the first cut used crosses 2^63
    around ~1e5 docs (ANSI Spark errors, DuckDB silently widens to
    int128 and DIVERGES — the CLAUDE.md landmine class).
    GREATEST(expected_micro, 1) guards the degenerate empty-sample
    divisor on both engines.

    One conditional aggregate pass, languages-sized output."""
    d = load_table(spark, sf_dir, "documents")
    sel = (
        ((F.col("doc_id") % F.lit(1000000007)) * F.lit(2654435761))
        % F.lit(4294967296)
        < 429496730
    )
    base = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_lang"),
        F.sum(F.when(sel, 1).otherwise(0)).cast("bigint").alias("obs"),
    )
    tot = base.agg(
        F.sum("n_lang").cast("bigint").alias("n_total"),
        F.sum("obs").cast("bigint").alias("n_sel"),
    )
    wide = base.crossJoin(F.broadcast(tot)).withColumn(
        "expected_micro",
        F.expr(
            "(CAST(n_sel AS DECIMAL(38,0)) * n_lang * 1000000) DIV n_total"
        ).cast("bigint"),
    )
    # dev_micro staged in its OWN withColumn (lateral-alias rule) so the
    # decimal square below references the materialized column.
    dev = wide.withColumn(
        "dev_micro", F.expr("obs * 1000000 - expected_micro")
    )
    return dev.select(
        "lang",
        "n_lang",
        "obs",
        "expected_micro",
        F.expr(
            "(CAST(dev_micro AS DECIMAL(38,0)) * dev_micro)"
            " DIV GREATEST(expected_micro, 1)"
        )
        .cast("bigint")
        .alias("chi2_term_ppm"),
    )
