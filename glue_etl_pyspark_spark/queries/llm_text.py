"""Text-analysis queries over the documents table (SURVEY.md §2.12):
token stats, quality scoring, language-ID, term frequency, TF-IDF,
fingerprinting. All pure-SQL-expressible → all DuckDB-oracled.

Float policy: derived ratios/scores are plain arithmetic on identical
inputs (no rounding needed — both engines produce the same doubles);
only ln-based scores are rounded."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import (
    BPE_ISH_PATTERN,
    EN_STOPWORDS,
    doc_fingerprint,
    tokenize_ws,
)
from ..io import load_table
from ..registry import query

# DuckDB twin of tokenize_ws
_DUCK_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"
_DUCK_STOPLIST = "[" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + "]"

TOKEN_STATS_ORACLE = f"""
SELECT doc_id,
  CAST(len({_DUCK_TOKS}) AS INTEGER) AS n_tokens_ws,
  CAST(len(regexp_extract_all(lower(text), '{BPE_ISH_PATTERN}', 0)) AS INTEGER) AS n_tokens_bpe,
  CAST(len(list_distinct({_DUCK_TOKS})) AS INTEGER) AS n_uniq,
  n_chars / len({_DUCK_TOKS}) AS chars_per_token
FROM documents
"""


@query("text_token_stats", oracle=TOKEN_STATS_ORACLE, category="llm-text")
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex token count
    (the cheap proxy for tokenizer cost estimation over a corpus)."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokenize_ws("text")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens_ws"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(BPE_ISH_PATTERN), 0)).alias(
            "n_tokens_bpe"
        ),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        (F.col("n_chars") / F.size(toks)).alias("chars_per_token"),
    )


QUALITY_ORACLE = f"""
SELECT doc_id,
  CAST(len(toks) AS INTEGER) AS n_tokens,
  len(list_distinct(toks)) * 1.0 / len(toks) AS uniq_ratio,
  len(list_filter(toks, t -> list_contains({_DUCK_STOPLIST}, t))) * 1.0 / len(toks) AS stop_ratio,
  n_chars * 1.0 / len(toks) AS avg_token_len,
  0.5 * (len(list_distinct(toks)) * 1.0 / len(toks))
    + 0.3 * least(len(toks) / 50.0, 1.0)
    + 0.2 * (1.0 - len(list_filter(toks, t -> list_contains({_DUCK_STOPLIST}, t))) * 1.0 / len(toks))
    AS quality_score
FROM (SELECT doc_id, n_chars, {_DUCK_TOKS} AS toks FROM documents)
WHERE len(toks) > 0
"""


@query("text_quality_score", oracle=QUALITY_ORACLE, category="llm-text")
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: uniqueness + length + stopword
    ratios, the standard cheap pre-filter for training-data curation."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select("doc_id", "n_chars", tokenize_ws("text").alias("toks")).filter(
        F.size("toks") > 0
    )
    n = F.size("toks")
    n_uniq = F.size(F.array_distinct("toks"))
    stoplist = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_stop = F.size(F.filter("toks", lambda t: F.array_contains(stoplist, t)))
    uniq_ratio = n_uniq * F.lit(1.0) / n
    stop_ratio = n_stop * F.lit(1.0) / n
    return base.select(
        "doc_id",
        n.alias("n_tokens"),
        uniq_ratio.alias("uniq_ratio"),
        stop_ratio.alias("stop_ratio"),
        (F.col("n_chars") * F.lit(1.0) / n).alias("avg_token_len"),
        (
            0.5 * uniq_ratio
            + 0.3 * F.least(n / F.lit(50.0), F.lit(1.0))
            + 0.2 * (F.lit(1.0) - stop_ratio)
        ).alias("quality_score"),
    )


TERM_FREQ_ORACLE = """
WITH tf AS (
  SELECT lang, unnest(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS token
  FROM documents
),
counts AS (
  SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS freq FROM tf GROUP BY lang, token
)
SELECT lang, token, freq, rn FROM (
  SELECT lang, token, freq,
    CAST(row_number() OVER (PARTITION BY lang ORDER BY freq DESC, token) AS BIGINT) AS rn
  FROM counts
) WHERE rn <= 5
"""


@query("text_term_freq", oracle=TERM_FREQ_ORACLE, category="llm-text")
def text_term_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 terms per language: explode → count → windowed top-k.
    The shuffle key is (lang, token) — partial aggregation collapses
    per-partition counts before the wire at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select("lang", F.explode(tokenize_ws("text")).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("freq").desc(), F.col("token"))
    return (
        counts.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 5)
        .select("lang", "token", "freq", "rn")
    )


TFIDF_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS token
  FROM documents
),
tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY doc_id, token),
df AS (SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM toks GROUP BY token),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
    round(tf.tf * ln(n.n_docs * 1.0 / df.df), 6) AS tfidf
  FROM tf JOIN df USING (token) CROSS JOIN n
)
SELECT doc_id, token, tf, df, tfidf, rn FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS BIGINT) AS rn
  FROM scored
) WHERE rn <= 3 AND doc_id < 100
"""


@query("text_tfidf", oracle=TFIDF_ORACLE, category="llm-text")
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-SQL TF-IDF (tf x ln(N/df) via joins — oracle-checkable,
    unlike HashingTF+IDF): top-3 terms per doc for doc_id < 100.
    N arrives by broadcast cross join of a 1-row aggregate — no
    driver-side collect.

    df is its own branch — explode(array_distinct(toks)) then a plain
    count by token. The r7 shape derived df FROM the tf aggregate to
    reuse the (doc_id, token) exchange, but the doc_id < 100 pushdown
    splits the subtree: Catalyst pushes the filter into the tf copy
    only, and the df copy silently re-tokenizes the FULL corpus and
    shuffles every distinct (doc_id, token) pair — a corpus-sized
    exchange (plans/r16/text_tfidf_before.txt ops 7-14). Per-doc
    dedup via array_distinct moves the distinct MAP-SIDE: the only
    exchange left in the df branch carries per-task per-token partial
    counts (vocabulary-sized at any corpus size — guide §2.3
    "aggregate before you shuffle"). Values are identical: one
    exploded row per (doc, distinct token) is exactly what COUNT per
    token needs."""
    d = load_table(spark, sf_dir, "documents")
    toks_arr = d.select("doc_id", tokenize_ws("text").alias("toks"))
    toks = toks_arr.select("doc_id", F.explode("toks").alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = (
        toks_arr.select(F.explode(F.array_distinct("toks")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") * F.lit(1.0) / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter((F.col("rn") <= 3) & (F.col("doc_id") < 100))
        .select("doc_id", "token", "tf", "df", "tfidf", "rn")
    )


_DUCK_NIB = "strpos('0123456789abcdef', substring(h, {pos}, 1)) - 1"

FINGERPRINT_ORACLE = """
WITH ws AS (
  SELECT doc_id, lower(text) AS lt,
         list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id,
    CASE WHEN len(toks) < 3 THEN []
         ELSE list_transform(range(1, len(toks) - 1),
              i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
    END AS hashes,
    lt
  FROM ws
)
SELECT doc_id,
  COALESCE(list_aggregate(hashes, 'min'), md5(lt)) AS fingerprint
FROM sh
"""


@query("text_fingerprint", oracle=FINGERPRINT_ORACLE, category="llm-text")
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: minimum md5 over word 3-shingles
    (1-permutation MinHash — the grouping key for cheap near-dup
    bucketing; cross-engine stable because md5 is)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", doc_fingerprint("text", 3).alias("fingerprint"))


LANGID_ORACLE = """
WITH grams AS (
  SELECT doc_id, lang,
    list_distinct(list_transform(range(1, greatest(length(text) - 1, 1)),
                  i -> substring(text, CAST(i AS INTEGER), 3))) AS tri
  FROM documents
),
doc_tri AS (SELECT doc_id, lang, unnest(tri) AS g FROM grams),
profile AS (
  SELECT lang AS plang, g, CAST(COUNT(*) AS BIGINT) AS freq
  FROM doc_tri GROUP BY lang, g
),
top_profile AS (
  SELECT plang, g FROM (
    SELECT plang, g, row_number() OVER (PARTITION BY plang ORDER BY freq DESC, g) AS rn
    FROM profile
  ) WHERE rn <= 20
),
overlap AS (
  SELECT d.doc_id, d.lang, p.plang, CAST(COUNT(*) AS BIGINT) AS hits
  FROM doc_tri d JOIN top_profile p ON d.g = p.g
  GROUP BY d.doc_id, d.lang, p.plang
)
SELECT doc_id, lang, plang AS predicted_lang, hits FROM (
  SELECT doc_id, lang, plang, hits,
    row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, plang) AS rn
  FROM overlap
) WHERE rn = 1
"""


_TRI_EXPR = (
    "array_distinct(transform(sequence(1, greatest(length(text) - 2, 1)),"
    " i -> substring(text, i, 3)))"
)

# O(L) twin of _TRI_EXPR: substring(text, i, 3) re-scans the UTF8
# bytes from position 0 on EVERY call (code-point offsets aren't
# indexed), making the substring form O(L^2) per doc — measured 14.9 s
# vs 7.0 s for this form over the 10x probe corpus (50k docs, avg 297
# chars). Splitting to a char array once makes each gram three O(1)
# element reads; get() is NULL past the end and coalesce('') restores
# substring's short-text behavior (a 2-char doc yields its 2-char
# "trigram", '' for empty text — bit-identical to the substring tree,
# pinned over every fixture doc AND unicode/short-string edge cases in
# tests/test_llm_ops.py). Boundary: split('') yields UTF-16 code
# units, substring counts code points — they agree on all BMP text;
# only non-BMP (surrogate-pair) chars would diverge, and the equality
# pin guards the fixture corpus.
_TRI_EXPR_FAST = (
    "array_distinct(transform(sequence(1, greatest(length(text) - 2, 1)),"
    " i -> concat(coalesce(get(__ch, i - 1), ''), coalesce(get(__ch, i), ''),"
    " coalesce(get(__ch, i + 1), ''))))"
)


def _with_trigrams(df: DataFrame) -> DataFrame:
    """Add a ``__tri`` distinct-trigram array column via the O(L)
    char-array extraction (``__ch`` staged in its own withColumn per
    the lateral-alias rule, then dropped)."""
    return (
        df.withColumn("__ch", F.split("text", ""))
        .withColumn("__tri", F.expr(_TRI_EXPR_FAST))
        .drop("__ch")
    )


def _langid_doc_tri(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    grams = _with_trigrams(d).select("doc_id", "lang", F.col("__tri").alias("tri"))
    return grams.select("doc_id", "lang", F.explode("tri").alias("g"))


def _langid_top_profiles(
    spark: SparkSession,
    sf_dir: str,
    k: int = 20,
    doc_tri: DataFrame | None = None,
) -> dict[str, list[str]]:
    """Train the per-language top-k trigram profiles and COLLECT them —
    a constant-size intermediate (n_langs * k grams; 5*20 here), so the
    endorsed driver-collect + literal re-ship pattern applies: training
    is one map-side-combined (lang, gram) count + a profile-sized
    window, both deterministic (freq desc, gram tie-break), so the
    collected literals can never be re-derived differently by an
    AQE/broadcast recompute (packing-bases precedent). ``doc_tri``
    lets a caller that already materialized the exploded trigram set
    share it instead of re-extracting."""
    if doc_tri is None:
        doc_tri = _langid_doc_tri(spark, sf_dir)
    profile = doc_tri.groupBy(F.col("lang").alias("plang"), "g").agg(
        F.count(F.lit(1)).alias("freq")
    )
    wp = Window.partitionBy("plang").orderBy(F.col("freq").desc(), F.col("g"))
    rows = (
        profile.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= k)
        .select("plang", "g", "rn")
        .collect()
    )
    profs: dict[str, list[str]] = {}
    for r in sorted(rows, key=lambda r: (r["plang"], r["rn"])):
        profs.setdefault(r["plang"], []).append(r["g"])
    return profs


def _langid_score_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-r7 scoring shape (explode every doc trigram, broadcast-join
    the profile, per-(doc,lang) count) — kept as the equality-test twin
    for the literal-intersect path below, which shuffles nothing in
    the scoring stage where this shape pushes the whole corpus trigram
    set through a join."""
    doc_tri = _langid_doc_tri(spark, sf_dir)
    profs = _langid_top_profiles(spark, sf_dir)
    top_profile = spark.createDataFrame(
        [(plang, g) for plang, gs in profs.items() for g in gs],
        "plang string, g string",
    )
    overlap = (
        doc_tri.join(F.broadcast(top_profile), "g")
        .groupBy("doc_id", "lang", "plang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    wd = Window.partitionBy("doc_id").orderBy(F.col("hits").desc(), F.col("plang"))
    return (
        overlap.withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", F.col("plang").alias("predicted_lang"), "hits")
    )


@query("text_language_id", oracle=LANGID_ORACLE, category="llm-text")
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram language-ID: per-language trigram profiles
    are trained from the corpus itself (top-20 trigrams by document
    frequency), each doc scored by profile overlap and argmax-labelled.

    Training is the one corpus-sized pass (map-side-combined
    (lang, gram) count); the profiles are CONSTANT-size (n_langs*20)
    and re-shipped as literals. Scoring is then pure per-row
    expression work — hits per language =
    size(array_intersect(doc_trigrams, literal profile)); argmax via
    array_max over (hits, lang-rank) structs, encoding the oracle's
    exact (hits DESC, plang ASC) tie-break — no explode, no join, NO
    SHUFFLE in the scoring stage. Value-identical to the join shape
    (_langid_score_join, equality-pinned in tests/test_llm_ops.py):
    the inner profile join counted exactly the distinct doc trigrams
    inside a language's profile — the intersect size — and docs with
    zero profile hits drop out on both paths.

    The r8 probe showed the r7 shuffle-free scoring did NOT move the
    10x wall (55 s vs 53 s pre-rework): the cost was never the join
    but the trigram EXTRACTION — O(L^2) substring scans, run twice
    (training + scoring). Now: O(L) char-array extraction
    (_TRI_EXPR_FAST) materialized ONCE (two consumers, one
    extraction; the frame is doc_id+lang+distinct-gram array, ~6 MB
    at 10x) and shared by the profile count and the literal-intersect
    scoring. Measured 10x: 55.2 s -> 11.6 s warm.

    Materialization is persist(DISK_ONLY), not localCheckpoint: the
    trigram frame is CORPUS-scaled (one array per doc), and the r12
    winnow postmortem (SCALING.md) bans memory-backed materialization
    of corpus-scaled reuse frames — winnow's localCheckpoint pinned
    heap-sized blocks at 500k docs and OOM'd against a downstream
    sort. langid itself survived its 500k probe (no self-join
    competes for heap), but it sat one adjacent edit from the same
    OOM class; disk blocks cost one linear write and zero heap
    competition. Blocks live until session teardown (the profile
    training action materializes them; scoring re-reads them)."""
    from pyspark import StorageLevel

    d = load_table(spark, sf_dir, "documents")
    tri = (
        _with_trigrams(d)
        .select("doc_id", "lang", "__tri")
        .persist(StorageLevel.DISK_ONLY)
    )
    doc_tri = tri.select("doc_id", "lang", F.explode("__tri").alias("g"))
    profs = _langid_top_profiles(spark, sf_dir, doc_tri=doc_tri)
    langs = sorted(profs)
    n = len(langs)
    structs = [
        F.struct(
            F.size(
                F.array_intersect(
                    F.col("__tri"), F.array(*[F.lit(g) for g in profs[lang]])
                )
            )
            .cast("bigint")
            .alias("h"),
            # rank encodes the plang-ASC tie-break under array_max:
            # equal hits -> larger rank wins -> smaller lang index
            F.lit(n - 1 - i).alias("r"),
        )
        for i, lang in enumerate(langs)
    ]
    return (
        tri.withColumn("__best", F.array_max(F.array(*structs)))
        .filter(F.col("__best.h") >= 1)
        .select(
            "doc_id",
            "lang",
            F.element_at(F.lit(langs), F.lit(n) - F.col("__best.r")).alias(
                "predicted_lang"
            ),
            F.col("__best.h").alias("hits"),
        )
    )


VOCAB_ORACLE = f"""
WITH toks AS (
  SELECT unnest({_DUCK_TOKS}) AS token FROM documents
),
counts AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY token
),
top AS (
  SELECT token, n FROM counts ORDER BY n DESC, token LIMIT 4096
)
SELECT token, n,
  CAST(row_number() OVER (ORDER BY n DESC, token) + 4 AS BIGINT) AS vocab_id
FROM top
"""


@query("text_vocab_build", oracle=VOCAB_ORACLE, category="llm-text")
def text_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary construction: corpus token frequencies →
    top-4096 by (count, token) → dense vocab ids starting after 4
    reserved specials (pad/bos/eos/unk). The frequency count is one
    map-side-combined shuffle; the global top-k plans as
    TakeOrderedAndProject (no full sort), and only the ALREADY-LIMITED
    vocab passes through the single-partition ranking window — the
    id-assignment step is O(vocab), not O(corpus), which is what keeps
    this shape viable when the corpus is 100 TB but the vocab is 32k."""
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(tokenize_ws("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    top = counts.orderBy(F.desc("n"), "token").limit(4096)
    w = Window.orderBy(F.desc("n"), "token")
    return top.select(
        "token", "n", (F.row_number().over(w) + 4).cast("bigint").alias("vocab_id")
    )


# ---------------------------------------------------------------------------
# Inverted index build (IR engine core)
# ---------------------------------------------------------------------------

INVERTED_INDEX_ORACLE = f"""
WITH occ AS (
  SELECT doc_id, unnest({_DUCK_TOKS}) AS token FROM documents
), per_doc AS (
  SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM occ GROUP BY token, doc_id
)
SELECT token,
  CAST(COUNT(*) AS BIGINT) AS df,
  CAST(SUM(tf) AS BIGINT) AS cf,
  string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS postings
FROM per_doc GROUP BY token
"""


@query("text_inverted_index", oracle=INVERTED_INDEX_ORACLE, category="llm-text")
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index construction — the IR-engine core behind BM25 /
    keyword retrieval: per term, document frequency, collection
    frequency, and the posting list (doc_id:tf pairs, doc-ordered,
    serialized at the query boundary per the atomic-columns rule).
    One (token, doc) aggregation then one token aggregation; the
    posting list is sorted BEFORE serialization (array_sort on the
    struct — collect_list order is partition-dependent, the repo's
    sorted-collect rule). At 100 TB a head term's posting list breaks
    the single-row budget: shard postings by (token, doc_id div R)
    exactly like `length_bucket_packing`'s row-number sharding; df/cf
    stay algebraic merges of shard partials."""
    d = load_table(spark, sf_dir, "documents")
    occ = d.select("doc_id", F.explode(tokenize_ws("text")).alias("token"))
    per_doc = occ.groupBy("token", "doc_id").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    return per_doc.groupBy("token").agg(
        F.count("*").cast("bigint").alias("df"),
        F.sum("tf").cast("bigint").alias("cf"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("doc_id", "tf"))
                ),
                lambda x: F.concat_ws(":", x["doc_id"], x["tf"]),
            ),
            ",",
        ).alias("postings"),
    )


LANGID_CONFUSION_ORACLE = f"""
WITH pred AS ({LANGID_ORACLE})
, cm AS (
  SELECT lang AS true_lang, predicted_lang,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM pred GROUP BY lang, predicted_lang
), per_true AS (
  SELECT true_lang, CAST(SUM(n) AS BIGINT) AS n_true FROM cm GROUP BY true_lang
)
SELECT cm.true_lang, cm.predicted_lang, cm.n,
  cm.true_lang = cm.predicted_lang AS correct,
  CAST((cm.n * 1000000) // p.n_true AS BIGINT) AS row_share_ppm
FROM cm JOIN per_true p ON cm.true_lang = p.true_lang
"""


@query(
    "langid_confusion_matrix", oracle=LANGID_CONFUSION_ORACLE, category="llm-text"
)
def langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the trigram language-ID against the
    fixture's ground-truth labels: per (true, predicted) cell counts,
    correctness flag, and the row-normalized share (integer ppm) —
    per-language recall sits on the diagonal. The model-evaluation
    table any langid deployment reviews before trusting the gate.

    Scale: consumes the langid query's output (two aggregation
    passes + broadcast profile join) and adds one cell-grain rollup —
    output is languages², constant."""
    pred = text_language_id(spark, sf_dir)
    cm = pred.groupBy(
        F.col("lang").alias("true_lang"), "predicted_lang"
    ).agg(F.count(F.lit(1)).alias("n"))
    per_true = cm.groupBy("true_lang").agg(F.sum("n").cast("bigint").alias("n_true"))
    return cm.join(per_true, "true_lang").select(
        "true_lang",
        "predicted_lang",
        "n",
        (F.col("true_lang") == F.col("predicted_lang")).alias("correct"),
        F.expr("(n * 1000000) DIV n_true").cast("bigint").alias("row_share_ppm"),
    )


AUTOCOMPLETE_ORACLE = f"""
WITH toks AS (
  SELECT unnest({_DUCK_TOKS}) AS token FROM documents
),
counts AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS freq FROM toks GROUP BY token
),
pre AS (
  SELECT substring(token, 1, CAST(p.p AS INTEGER)) AS prefix, token, freq
  FROM counts, (SELECT p FROM range(1, 5) t(p)) p
  WHERE length(token) >= p.p
)
SELECT prefix, token, freq, rn FROM (
  SELECT prefix, token, freq,
    CAST(row_number() OVER (PARTITION BY prefix ORDER BY freq DESC, token)
      AS BIGINT) AS rn
  FROM pre
) WHERE rn <= 3
"""


@query("text_autocomplete_index", oracle=AUTOCOMPLETE_ORACLE, category="llm-text")
def text_autocomplete_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-autocomplete index: for every 1-4 char prefix, the top-3
    corpus tokens by frequency — the typeahead table a search box
    serves. Built from the token-frequency aggregate (vocabulary-
    sized, never corpus-sized) with a narrow 4x prefix fan-out and a
    per-prefix WindowGroupLimit; ORDER BY ends in the token (unique).

    Scale: the only corpus pass is the token count (map-side
    combined); the prefix index is vocab x 4 rows in, <= 3 per prefix
    out."""
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(tokenize_ws("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pre = (
        counts.select(
            "token",
            "freq",
            F.explode(F.sequence(F.lit(1), F.least(F.length("token"), F.lit(4)))).alias(
                "p"
            ),
        )
        .select(
            F.expr("substring(token, 1, p)").alias("prefix"), "token", "freq"
        )
    )
    w = Window.partitionBy("prefix").orderBy(F.col("freq").desc(), F.col("token"))
    return (
        pre.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select("prefix", "token", "freq", "rn")
    )


NORMALIZE_ORACLE = """
WITH n AS (
  SELECT doc_id,
    trim(regexp_replace(lower(text), '[ \t\n\r]+', ' ', 'g')) AS norm
  FROM documents
)
SELECT doc_id, md5(norm) AS norm_md5,
  CAST(length(norm) AS BIGINT) AS n_chars_norm
FROM n
"""


@query("text_normalize_clean", oracle=NORMALIZE_ORACLE, category="llm-text")
def text_normalize_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization — the first pass of every web-corpus
    pipeline before dedup/fingerprinting (lowercase, collapse runs of
    whitespace to one space, trim): canonical text is what exact and
    near dedup should key on, or trivially different copies survive.
    Emits the md5 + length of the normalized text (the dedup key
    shape) rather than the text itself, keeping the output atomic and
    hash-oracled end-to-end.

    The whitespace class is the EXPLICIT [ \\t\\n\\r] on both engines —
    Java's \\s and RE2's \\s disagree on \\x0B, the kind of silent
    cross-engine drift the explicit class removes. Pure per-row
    expression work: no shuffle, streams at scan speed at any corpus
    size."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(F.lower(F.col("text")), "[ \\t\\n\\r]+", " ")
    )
    return d.select(
        "doc_id",
        F.md5(norm).alias("norm_md5"),
        F.length(norm).cast("bigint").alias("n_chars_norm"),
    )


# --- RAKE keyword extraction ----------------------------------------

# Standard RAKE practice caps candidate phrases at 4 words — in
# low-stopword text (this corpus, code, tables) uncapped islands span
# most of a document and drown real keywords in unique junk phrases.
_RAKE_MAX_PHRASE = 4
_RAKE_TOPK = 30

RAKE_ORACLE = f"""
WITH toks AS (
  SELECT d.doc_id, gs.i AS pos, list_extract(d.tk, gs.i) AS word
  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents) d,
       unnest(generate_series(1, len(d.tk))) AS gs(i)
),
nonstop AS (
  SELECT doc_id, pos, word,
    pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM toks WHERE word <> '' AND NOT list_contains({_DUCK_STOPLIST}, word)
),
phr AS (
  SELECT doc_id, grp, string_agg(word, ' ' ORDER BY pos) AS phrase,
    CAST(COUNT(*) AS BIGINT) AS plen
  FROM nonstop GROUP BY doc_id, grp
  HAVING COUNT(*) <= {_RAKE_MAX_PHRASE}
),
ws AS (
  SELECT n.word, CAST(COUNT(*) AS BIGINT) AS freq,
    CAST(SUM(p.plen) AS BIGINT) AS deg
  FROM nonstop n JOIN phr p ON p.doc_id = n.doc_id AND p.grp = n.grp
  GROUP BY n.word
),
pscore AS (
  SELECT p.doc_id, p.grp, p.phrase,
    CAST(SUM(w.deg) AS BIGINT) AS deg_sum,
    CAST(SUM(w.freq) AS BIGINT) AS freq_sum
  FROM nonstop n
  JOIN phr p ON p.doc_id = n.doc_id AND p.grp = n.grp
  JOIN ws w ON w.word = n.word
  GROUP BY p.doc_id, p.grp, p.phrase
),
agg AS (
  SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occ,
    MIN(deg_sum) AS deg_sum, MIN(freq_sum) AS freq_sum
  FROM pscore GROUP BY phrase
)
SELECT phrase, n_occ, deg_sum, freq_sum,
  CAST(CAST(deg_sum AS HUGEINT) * 1000000 // freq_sum AS BIGINT) AS score_ppm
FROM agg
ORDER BY score_ppm DESC, phrase LIMIT {_RAKE_TOPK}
"""


@query("text_rake_keywords", oracle=RAKE_ORACLE, category="llm-text")
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are maximal stopword-free token runs (gaps-and-islands: pos minus
    per-doc row_number), capped at _RAKE_MAX_PHRASE (4) words; word
    scores are degree (sum of containing-phrase lengths) over
    frequency, both computed across candidate phrases; a phrase scores
    the deg-sum/freq-sum ratio of its words as exact integer ppm.
    Top-30 phrases corpus-wide with occurrence counts.

    Determinism/portability: everything is integer until the single
    final division, which promotes to DECIMAL(38,0)/HUGEINT before DIV
    — deg_sum is corpus-scaled, so deg_sum*1e6 would overflow int64 at
    ~1e13 tokens (the CLAUDE.md two-BIGINT-product rule); the quotient
    (<= 1e6 * max phrase len) casts back to BIGINT. Phrase strings
    assemble via array_sort(struct(pos, word)) == string_agg ORDER BY
    pos — unique pos makes the sort total.

    Scale: one posexplode (narrow, linear), one per-doc window for the
    island ids, then phrase/word aggregations keyed on (doc, grp) and
    word — all map-side-combinable shuffles, no self-joins. The
    corpus-scaled token and phrase frames are each read 2-3 times, so
    they persist spillable (thin rows, MEMORY_AND_DISK per the r12
    materialization audit)."""
    from pyspark import StorageLevel

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )
    stoplist = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    nonstop = (
        toks.filter(
            (F.col("word") != "") & ~F.array_contains(stoplist, F.col("word"))
        )
        .withColumn(
            "grp",
            F.col("pos")
            - F.row_number().over(
                Window.partitionBy("doc_id").orderBy("pos")
            ),
        )
        # DISK_ONLY: corpus-scaled reuse frame (the winnow rule)
        .persist(StorageLevel.DISK_ONLY)
    )
    phr = (
        nonstop.groupBy("doc_id", "grp")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "word"))),
                    lambda s: s["word"],
                ),
                " ",
            ).alias("phrase"),
            F.count("*").alias("plen"),
        )
        .filter(F.col("plen") <= _RAKE_MAX_PHRASE)
        .persist(StorageLevel.DISK_ONLY)
    )
    in_phrase = nonstop.join(phr, ["doc_id", "grp"])
    ws = in_phrase.groupBy("word").agg(
        F.count("*").alias("freq"), F.sum("plen").cast("bigint").alias("deg")
    )
    pscore = (
        in_phrase.join(ws, "word")
        .groupBy("doc_id", "grp", "phrase")
        .agg(
            F.sum("deg").cast("bigint").alias("deg_sum"),
            F.sum("freq").cast("bigint").alias("freq_sum"),
        )
    )
    agg = pscore.groupBy("phrase").agg(
        F.count("*").alias("n_occ"),
        F.min("deg_sum").alias("deg_sum"),
        F.min("freq_sum").alias("freq_sum"),
    )
    out = (
        agg.select(
            "phrase",
            "n_occ",
            "deg_sum",
            "freq_sum",
            F.expr(
                "CAST(CAST(deg_sum AS DECIMAL(38,0)) * 1000000 DIV freq_sum"
                " AS BIGINT)"
            ).alias("score_ppm"),
        )
        .orderBy(F.desc("score_ppm"), "phrase")
        .limit(_RAKE_TOPK)
    )
    # release the corpus-scaled token/phrase blocks before handing the
    # result back (the dedup_winnow_pairs idiom): materialize the
    # top-k (constant-size) to its own blocks, then drop the inputs
    out = out.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    nonstop.unpersist()
    phr.unpersist()
    return out
