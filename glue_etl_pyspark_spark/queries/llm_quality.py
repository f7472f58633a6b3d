"""LLM-corpus quality & governance queries: PII redaction (the Glue
Detect-PII transform shape), Gopher-style repetition filtering,
train/eval n-gram contamination, and corpus-wide line dedup.

The `documents` fixture is single-line text, so line-level ops derive
deterministic pseudo-lines (8-token chunks) — the plumbing (explode,
window-over-line, ratios) is exactly what real newline-split corpora
need, and every step is mirrored in the DuckDB oracle so the whole
family is hash-checked.

Scale notes (100 TB): PII redaction and repetition scoring are narrow
per-row expression trees — no shuffle at all, they run at scan
parallelism inside whole-stage codegen. Line dedup and contamination
shuffle once on the line/gram value; at real scale the shuffle key
becomes xxhash64(line) (8-byte keys, same dedup_ngram_jaccard stance)
— kept as strings here so the oracle shares the key verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import shingles, tokenize_ws
from ..io import load_table
from ..registry import query

# --- PII redaction -----------------------------------------------------

# Both engines synthesize the SAME pii-bearing text from customer
# columns (emails/phones/SSNs with known shapes), then redact with the
# same patterns — detection counts + redacted text are exact.
_PII_TEXT_SPARK = (
    "concat(c_name, ' contact ', lower(replace(c_name, '#', '.')), "
    "'@example.com or 555-', lpad(cast(c_custkey % 10000 as string), 4, '0'), "
    "' ssn ', lpad(cast(c_custkey % 900 as string), 3, '0'), '-', "
    "lpad(cast(c_nationkey as string), 2, '0'), '-', "
    "lpad(cast(c_custkey % 10000 as string), 4, '0'))"
)
_PII_TEXT_DUCK = _PII_TEXT_SPARK.replace("as string", "as varchar")

_EMAIL_RE = r"[a-z0-9.]+@[a-z0-9.]+\.[a-z]+"
_SSN_RE = r"\d{3}-\d{2}-\d{4}"
_PHONE_RE = r"\b555-\d{4}\b"

PII_ORACLE = f"""
WITH raw AS (
  SELECT c_custkey, {_PII_TEXT_DUCK} AS pii_text FROM customer
)
SELECT c_custkey,
  regexp_replace(
    regexp_replace(
      regexp_replace(pii_text, '{_EMAIL_RE}', '[EMAIL]', 'g'),
      '{_SSN_RE}', '[SSN]', 'g'),
    '{_PHONE_RE}', '[PHONE]', 'g') AS redacted,
  CAST(len(regexp_extract_all(pii_text, '{_EMAIL_RE}')) AS BIGINT) AS n_email,
  CAST(len(regexp_extract_all(pii_text, '{_SSN_RE}')) AS BIGINT) AS n_ssn,
  CAST(len(regexp_extract_all(
    regexp_replace(pii_text, '{_SSN_RE}', '[SSN]', 'g'), '{_PHONE_RE}'))
    AS BIGINT) AS n_phone
FROM raw
"""


@query("text_pii_redaction", oracle=PII_ORACLE, category="llm-quality")
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Glue Detect-PII shape: regex detection + masking of emails,
    SSNs, phone numbers, with per-row detection counts. SSNs are
    redacted before phones so the overlapping digit-dash shapes can't
    double-match (the phone count is likewise taken post-SSN-mask on
    both engines). All redaction is regexp_replace in codegen — the
    100 TB cost is one scan, no shuffle."""
    c = load_table(spark, sf_dir, "customer")
    raw = c.withColumn("pii_text", F.expr(_PII_TEXT_SPARK))
    no_ssn = F.regexp_replace("pii_text", _SSN_RE, "[SSN]")
    return raw.select(
        "c_custkey",
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("pii_text", _EMAIL_RE, "[EMAIL]"),
                _SSN_RE,
                "[SSN]",
            ),
            _PHONE_RE,
            "[PHONE]",
        ).alias("redacted"),
        F.regexp_count("pii_text", F.lit(_EMAIL_RE)).cast("bigint").alias("n_email"),
        F.regexp_count("pii_text", F.lit(_SSN_RE)).cast("bigint").alias("n_ssn"),
        F.regexp_count(no_ssn, F.lit(_PHONE_RE)).cast("bigint").alias("n_phone"),
    )


# --- pseudo-lines (8-token chunks), shared by the line-level queries ---

_LINE_W = 8

# DuckDB fragment: doc_id, line_no, line — one row per 8-token chunk.
_LINES_DUCK = f"""
  SELECT d.doc_id, t.g AS line_no,
         array_to_string((d.toks)[t.g*{_LINE_W}+1 : t.g*{_LINE_W}+{_LINE_W}], ' ')
           AS line
  FROM (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')
             AS toks
    FROM documents
  ) d,
  unnest(generate_series(
    0, CAST(ceil(len(d.toks) / {_LINE_W}.0) - 1 AS BIGINT))) AS t(g)
"""


def _with_lines(df: DataFrame) -> DataFrame:
    """Stage toks then lines as separate columns: HOF lambdas re-eval
    captured *expressions* per element, so the token array must be a
    materialized column before transform() touches it."""
    toks = df.withColumn("toks", tokenize_ws("text"))
    return toks.withColumn(
        "lines",
        F.when(
            F.size("toks") > 0,
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.floor((F.size("toks") - 1) / _LINE_W).cast("int"),
                ),
                lambda g: F.array_join(
                    F.slice("toks", g * _LINE_W + 1, _LINE_W), " "
                ),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )


REPETITION_ORACLE = f"""
WITH lines AS ({_LINES_DUCK}),
per_line AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(COUNT(DISTINCT line) AS BIGINT) AS n_uniq_lines
  FROM lines GROUP BY doc_id
),
grams AS (
  SELECT doc_id,
         list_transform(
           generate_series(1, len(toks) - 1),
           i -> toks[i] || ' ' || toks[i + 1]) AS g2
  FROM (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')
             AS toks
    FROM documents
  )
),
per_gram AS (
  SELECT doc_id,
         CAST(len(g2) AS BIGINT) AS n_grams2,
         CAST(list_max(list_transform(
           list_distinct(g2), x -> len(list_filter(g2, y -> y = x))))
           AS BIGINT) AS max_gram2
  FROM grams WHERE len(g2) > 0
)
SELECT l.doc_id, l.n_lines, l.n_uniq_lines, g.n_grams2, g.max_gram2,
  floor((l.n_lines - l.n_uniq_lines) * 1e6 / l.n_lines) / 1e6
    AS dup_line_frac,
  floor(g.max_gram2 * 1e6 / g.n_grams2) / 1e6 AS top_gram2_frac,
  CASE WHEN floor((l.n_lines - l.n_uniq_lines) * 1e6 / l.n_lines) / 1e6 > 0.3
         OR floor(g.max_gram2 * 1e6 / g.n_grams2) / 1e6 > 0.2
       THEN 1 ELSE 0 END AS repetitive
FROM per_line l JOIN per_gram g ON l.doc_id = g.doc_id
"""


@query("text_repetition_filter", oracle=REPETITION_ORACLE, category="llm-quality")
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality gate: duplicate-pseudo-line
    fraction and top-2-gram mass per document, with a repetitive flag
    at the published-style thresholds (0.3 / 0.2). Everything is a
    narrow per-row expression tree over the token array — zero
    shuffles, scan-parallel, whole-stage codegen; ratios floor-scaled
    at 6 dp so the division never hash-drifts."""
    d = _with_lines(load_table(spark, sf_dir, "documents"))
    staged = (
        d.withColumn("g2", shingles("toks", 2))
        .filter(F.size("g2") > 0)
        .withColumn("n_lines", F.size("lines").cast("bigint"))
        .withColumn("n_uniq_lines", F.size(F.array_distinct("lines")).cast("bigint"))
        .withColumn("n_grams2", F.size("g2").cast("bigint"))
        .withColumn(
            "max_gram2",
            F.array_max(
                F.transform(
                    F.array_distinct("g2"),
                    lambda x: F.size(F.filter("g2", lambda y: y == x)),
                )
            ).cast("bigint"),
        )
        .withColumn(
            "dup_line_frac",
            F.floor((F.col("n_lines") - F.col("n_uniq_lines")) * 1e6 / F.col("n_lines"))
            / 1e6,
        )
        .withColumn(
            "top_gram2_frac",
            F.floor(F.col("max_gram2") * 1e6 / F.col("n_grams2")) / 1e6,
        )
    )
    return staged.select(
        "doc_id",
        "n_lines",
        "n_uniq_lines",
        "n_grams2",
        "max_gram2",
        "dup_line_frac",
        "top_gram2_frac",
        F.when(
            (F.col("dup_line_frac") > 0.3) | (F.col("top_gram2_frac") > 0.2), 1
        )
        .otherwise(0)
        .alias("repetitive"),
    )


CONTAMINATION_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')
           AS toks
  FROM documents
),
grams AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, len(toks) - 7),
           i -> array_to_string(toks[i : i + 7], ' '))) AS g8
  FROM toks WHERE len(toks) >= 8
),
ev AS (
  SELECT doc_id, unnest(g8) AS gram FROM grams WHERE doc_id % 10 = 7
),
tr AS (
  SELECT DISTINCT unnest(g8) AS gram FROM grams WHERE doc_id % 10 <> 7
)
SELECT ev.doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_grams,
  CAST(SUM(CASE WHEN tr.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_hit,
  floor(SUM(CASE WHEN tr.gram IS NOT NULL THEN 1 ELSE 0 END) * 1e6
        / COUNT(*)) / 1e6 AS contam_frac,
  CASE WHEN SUM(CASE WHEN tr.gram IS NOT NULL THEN 1 ELSE 0 END) > 0
       THEN 1 ELSE 0 END AS contaminated
FROM ev LEFT JOIN tr ON ev.gram = tr.gram
GROUP BY ev.doc_id
"""


@query(
    "contamination_ngram_overlap", oracle=CONTAMINATION_ORACLE, category="llm-quality"
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination check: the fraction of each eval doc's
    distinct 8-grams that also occur anywhere in the train split
    (deterministic hash-mod split on doc_id).

    r15 rework (VERDICT r14 item 5 + stage timing): grams are built
    with the winnowing window form — posexplode(toks), 7 lead()s over
    (doc_id, pos), xxhash64 over the 8 token columns — and shuffled as
    64-bit keys, never as ~50-byte gram strings. Stage timing on the
    100x clone showed the old shingles-array + explode construction
    was the real cost, for two reasons the repo already knew: the
    generator-over-HOF-array trap re-evaluates the upstream tokenize
    per element, and byte-based scan splits give a compute-heavy
    short-text table almost no parallelism (2 tasks for 10M docs at
    16m splits) — the window's partitionBy(doc_id) shuffle IS the
    repartition-before-heavy-compute, at any scale. The oracle keeps
    STRING gram keys, so every sf0.01/sf0.1 parity row doubles as the
    hashed==string equality pin (' '-join on whitespace-free tokens is
    injective, so tuple identity == gram identity; a 64-bit collision
    would break the hash match). The train side is aggregated to
    distinct hashes before the join, so hot boilerplate grams can't
    fan out. Docs with fewer than 8 tokens have no grams and drop out
    identically on both engines."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").withColumn(
        "toks", tokenize_ws("text")
    )
    pe = d.filter(F.size("toks") >= 8).select(
        "doc_id", F.posexplode("toks").alias("pos", "t0")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    cols = ["t0"] + [f"t{i}" for i in range(1, 8)]
    gh = (
        pe.select(
            "doc_id",
            "t0",
            *[F.lead("t0", i).over(w).alias(f"t{i}") for i in range(1, 8)],
        )
        .filter(F.col("t7").isNotNull())
        .select("doc_id", F.xxhash64(*cols).alias("gh"))
        .dropDuplicates(["doc_id", "gh"])
    )
    ev = gh.filter(F.col("doc_id") % 10 == 7)
    tr = (
        gh.filter(F.col("doc_id") % 10 != 7)
        .select("gh")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        ev.join(tr, "gh", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("bigint").alias("n_hit"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_hit",
            (F.floor(F.col("n_hit") * 1e6 / F.col("n_grams")) / 1e6).alias(
                "contam_frac"
            ),
            F.when(F.col("n_hit") > 0, 1).otherwise(0).alias("contaminated"),
        )
    )


LINE_DEDUP_ORACLE = f"""
WITH lines AS ({_LINES_DUCK}),
ranked AS (
  SELECT doc_id, line_no,
         ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, line_no)
           AS occ
  FROM lines
)
SELECT doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_lines,
  CAST(SUM(CASE WHEN occ = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  floor(SUM(CASE WHEN occ = 1 THEN 1 ELSE 0 END) * 1e6 / COUNT(*)) / 1e6
    AS kept_frac
FROM ranked GROUP BY doc_id
"""


@query("line_dedup_corpus", oracle=LINE_DEDUP_ORACLE, category="llm-quality")
def line_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide line-level dedup (the C4/RefinedWeb boilerplate
    killer): every pseudo-line keeps only its first occurrence across
    the whole corpus — first = smallest (doc_id, line_no), so the
    survivor is deterministic — and each doc reports how much of it
    survived. One shuffle on the line value; the per-line window
    groups are tiny (duplicate counts), so there's no skew cliff; at
    real scale the shuffle key becomes xxhash64(line)."""
    d = _with_lines(load_table(spark, sf_dir, "documents"))
    lines = d.select(
        "doc_id", F.posexplode("lines").alias("line_no", "line")
    )
    w = Window.partitionBy("line").orderBy("doc_id", "line_no")
    ranked = lines.withColumn("occ", F.row_number().over(w))
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.when(F.col("occ") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
        )
        .select(
            "doc_id",
            "n_lines",
            "n_kept",
            (F.floor(F.col("n_kept") * 1e6 / F.col("n_lines")) / 1e6).alias(
                "kept_frac"
            ),
        )
    )


# Deterministic span mask: position block b = pos // 3 of doc d is
# masked iff the Knuth hash of (d * 1000003 + b) clears a 15% (of
# 2^32) threshold — whole 3-token blocks drop, approximating T5's
# mean-span-3 noise with pure BIGINT math both engines replay exactly.
# BOTH multiplies fold mod 1e9+7 first: doc_id folds before the
# *1000003 pre-mix (unfolded, doc_ids past ~9e12 overflow that
# product) and the mixed value folds again before the Knuth multiply
# (ANSI overflow at sf0.1 doc_ids otherwise; DuckDB would silently
# widen to int128 and diverge). Folding first is value-identical:
# (d*k) mod p == ((d mod p)*k) mod p.
_SPAN_THR = 644245094  # floor(0.15 * 2^32)

SPAN_CORRUPT_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
),
pos AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
    t.p - 1 AS pos
  FROM toks, unnest(generate_series(1, len(toks))) AS t(p)
),
flagged AS (
  SELECT doc_id, n_tokens, pos,
    CASE WHEN ((((doc_id % 1000000007) * 1000003 + pos // 3) % 1000000007)
               * 2654435761)
              % 4294967296 < {_SPAN_THR} THEN 1 ELSE 0 END AS masked
  FROM pos
)
SELECT doc_id, n_tokens,
  CAST(SUM(masked) AS BIGINT) AS n_masked,
  CAST(COUNT(DISTINCT CASE WHEN masked = 1 THEN pos // 3 END) AS BIGINT)
    AS n_spans,
  floor(SUM(masked) * 1e6 / n_tokens) / 1e6 AS mask_rate
FROM flagged GROUP BY doc_id, n_tokens
"""


@query("span_corruption_layout", oracle=SPAN_CORRUPT_ORACLE, category="llm-curation")
def span_corruption_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption mask layout: 3-token blocks are
    dropped when a Knuth hash of (doc_id, block) clears the 15%
    threshold — deterministic across reruns and partitionings, so the
    SAME tokens mask on every epoch pipeline run (and in the oracle).
    Narrow explode + integer math, one groupBy back to doc grain; at
    100 TB this runs at scan parallelism with a map-side-combined
    aggregation."""
    d = load_table(spark, sf_dir, "documents").withColumn(
        "toks", tokenize_ws("text")
    )
    pos = d.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        (F.posexplode("toks")).alias("pos", "tok"),
    ).drop("tok")
    flagged = pos.withColumn(
        "masked",
        F.when(
            ((((F.col("doc_id") % 1000000007) * 1000003
               + F.floor(F.col("pos") / 3))
              % 1000000007)
             * 2654435761) % 4294967296
            < _SPAN_THR,
            1,
        ).otherwise(0),
    )
    return flagged.groupBy("doc_id", "n_tokens").agg(
        F.sum("masked").cast("bigint").alias("n_masked"),
        F.countDistinct(
            F.when(F.col("masked") == 1, F.floor(F.col("pos") / 3))
        ).alias("n_spans"),
        (F.floor(F.sum("masked") * 1e6 / F.col("n_tokens")) / 1e6).alias(
            "mask_rate"
        ),
    )


IDF_QUALITY_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
),
occ AS (
  SELECT doc_id, unnest(toks) AS token FROM toks
),
freq AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS tf FROM occ GROUP BY token
),
total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM occ)
SELECT o.doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_tokens,
  CAST(SUM(CAST(floor(-ln(f.tf / CAST(t.n AS DOUBLE)) * 1e9) AS BIGINT))
       AS BIGINT) // (CAST(COUNT(*) AS BIGINT) * 1000) / 1e6
    AS mean_surprisal
FROM occ o JOIN freq f ON o.token = f.token CROSS JOIN total t
GROUP BY o.doc_id
"""


@query("text_idf_quality", oracle=IDF_QUALITY_ORACLE, category="llm-quality")
def text_idf_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-surprisal quality proxy (the cheap stand-in for a
    perplexity filter): each doc's mean -ln(corpus unigram
    probability). Rare-token-heavy docs score high, boilerplate
    scores low. One token-frequency shuffle + one broadcast-size join
    back to occurrences. Order-invariant by construction: each token's
    surprisal is floored to the 1e-9 integer grid FIRST, the sum is
    exact bigint arithmetic, and the 6-dp mean is an integer division
    — no double accumulates in nondeterministic order on either
    engine (the money-sum rule applied to ln)."""
    d = load_table(spark, sf_dir, "documents")
    occ = d.select("doc_id", F.explode(tokenize_ws("text")).alias("token"))
    freq = occ.groupBy("token").agg(F.count("*").alias("tf"))
    total = occ.count()
    return (
        occ.join(F.broadcast(freq), "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(
                F.floor(-F.log(F.col("tf") / F.lit(float(total))) * F.lit(1e9))
            ).alias("__s"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (F.expr("__s div (n_tokens * 1000)") / F.lit(1e6)).alias(
                "mean_surprisal"
            ),
        )
    )


# --- boilerplate-line strip (C4-style cleaning) -----------------------

BOILERPLATE_ORACLE = f"""
WITH lines AS ({_LINES_DUCK}),
boiler AS (
  SELECT line FROM lines GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 2
),
j AS (
  SELECT l.doc_id, l.line_no, l.line, b.line IS NOT NULL AS is_b
  FROM lines l LEFT JOIN boiler b USING (line)
)
SELECT doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_lines,
  CAST(SUM(CASE WHEN is_b THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
  md5(coalesce(
    string_agg(CASE WHEN NOT is_b THEN line END, chr(10) ORDER BY line_no),
    '')) AS clean_md5
FROM j GROUP BY doc_id
"""


@query("text_boilerplate_strip", oracle=BOILERPLATE_ORACLE, category="llm-quality")
def text_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate removal: a (pseudo-)line occurring in >= 2
    distinct documents corpus-wide is boilerplate (nav bars, cookie
    banners, license footers in real crawls); each document keeps its
    remaining lines in original order. The cleaned text is emitted as
    md5 so the whole reconstruction — membership, order, separator —
    is value-checked, not just the counts.

    Scale: one line-frequency aggregate (map-side combine on the line
    value; xxhash64(line) 8-byte keys at real scale, string kept here
    so the oracle shares the key verbatim), then the threshold table is
    tiny by construction (frequency >= 2 across a 100 TB crawl still
    yields << 1% of distinct lines) — it broadcasts, so the strip pass
    is shuffle-free; per-doc reassembly groups on doc_id at scan
    parallelism."""
    d = load_table(spark, sf_dir, "documents")
    lines = _with_lines(d).select(
        "doc_id", F.posexplode("lines").alias("line_no", "line")
    )
    boiler = (
        lines.groupBy("line")
        .agg(F.count_distinct("doc_id").alias("__nd"))
        .filter(F.col("__nd") >= 2)
        .select("line", F.lit(1).alias("__b"))
    )
    j = lines.join(F.broadcast(boiler), "line", "left")
    kept = F.when(F.col("__b").isNull(), F.struct("line_no", "line"))
    return j.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.when(F.col("__b").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_boiler"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept)), lambda s: s["line"]
                ),
                "\n",
            )
        ).alias("clean_md5"),
    )

# ---------------------------------------------------------------------------
# Linear quality classifier (fixed-point logistic gating)
# ---------------------------------------------------------------------------

# Integer-scaled linear model: z = 2*mean_len_milli + 3*distinct_ppm
# - stop_ppm + 500*min(n_tok, 100). The logistic link is monotone, so
# thresholding the probability IS thresholding z — the whole gate runs
# in exact BIGINT fixed point (no exp/double anywhere; the repo's
# .5-boundary and libm-drift traps cannot occur). Threshold ~ corpus
# median, so the gate bites visibly at every fixture SF.
_CLS_THRESHOLD = 1_300_000
_CLS_Z = (
    "2 * mean_len_milli + 3 * distinct_ppm - stop_ppm"
    " + 500 * LEAST(n_tok, 100)"
)


def _cls_oracle() -> str:
    from .llm_text import _DUCK_STOPLIST, _DUCK_TOKS

    return f"""
WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
f AS (
  SELECT doc_id,
    CAST(len(toks) AS BIGINT) AS n_tok,
    CAST(len(array_to_string(toks, '')) AS BIGINT) * 1000 // len(toks) AS mean_len_milli,
    CAST(len(list_filter(toks, x -> list_contains({_DUCK_STOPLIST}, x))) AS BIGINT) * 1000000 // len(toks) AS stop_ppm,
    CAST(len(list_distinct(toks)) AS BIGINT) * 1000000 // len(toks) AS distinct_ppm
  FROM t
)
SELECT doc_id, n_tok,
  CAST(mean_len_milli AS BIGINT) AS mean_len_milli,
  CAST(stop_ppm AS BIGINT) AS stop_ppm,
  CAST(distinct_ppm AS BIGINT) AS distinct_ppm,
  CAST({_CLS_Z} AS BIGINT) AS z_scaled,
  CAST(CASE WHEN {_CLS_Z} >= {_CLS_THRESHOLD} THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM f
"""


@query("quality_classifier_linear", oracle=_cls_oracle(), category="llm-quality")
def quality_classifier_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-classifier quality gating, fixed-point: a linear model
    over integer-scaled text features (mean token length, distinct-
    token ppm, stopword ppm, capped length) scores each document; the
    logistic link is monotone, so the keep decision thresholds the raw
    score z — the entire gate is exact BIGINT arithmetic with the
    model weights as shared literals in both engines. This is the
    fastText-style linear-head gate production corpora use; swapping
    learned weights changes literals, not plan shape. Scale:
    embarrassingly parallel row-local scoring, zero shuffles. Features
    are staged through their own projections (repo lateral-alias rule)
    so each name binds the input column, never an earlier alias."""
    from ..functions.text import EN_STOPWORDS

    d = load_table(spark, sf_dir, "documents")
    stoplist = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    t = d.select("doc_id", tokenize_ws("text").alias("toks"))
    counts = t.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tok"),
        F.length(F.concat_ws("", F.col("toks"))).cast("bigint").alias("n_char"),
        F.size(F.filter("toks", lambda x: F.array_contains(stoplist, x)))
        .cast("bigint")
        .alias("n_stop"),
        F.size(F.array_distinct("toks")).cast("bigint").alias("n_distinct"),
    )
    feats = counts.select(
        "doc_id",
        "n_tok",
        F.expr("n_char * 1000 div n_tok").alias("mean_len_milli"),
        F.expr("n_stop * 1000000 div n_tok").alias("stop_ppm"),
        F.expr("n_distinct * 1000000 div n_tok").alias("distinct_ppm"),
    )
    return feats.select(
        "doc_id",
        "n_tok",
        "mean_len_milli",
        "stop_ppm",
        "distinct_ppm",
        F.expr(_CLS_Z).cast("bigint").alias("z_scaled"),
        F.expr(f"CASE WHEN {_CLS_Z} >= {_CLS_THRESHOLD} THEN 1 ELSE 0 END")
        .cast("int")
        .alias("keep"),
    )


_ROC_THRESHOLDS = (
    800_000, 1_000_000, 1_200_000, 1_300_000,
    1_400_000, 1_600_000, 1_800_000, 2_200_000,
)


def _roc_oracle() -> str:
    from .llm_text import _DUCK_STOPLIST, _DUCK_TOKS

    thr_list = ", ".join(str(t) for t in _ROC_THRESHOLDS)
    return f"""
WITH t AS (SELECT doc_id, lang, {_DUCK_TOKS} AS toks FROM documents),
f AS (
  SELECT doc_id,
    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label,
    CAST(len(toks) AS BIGINT) AS n_tok,
    CAST(len(array_to_string(toks, '')) AS BIGINT) * 1000 // len(toks) AS mean_len_milli,
    CAST(len(list_filter(toks, x -> list_contains({_DUCK_STOPLIST}, x))) AS BIGINT) * 1000000 // len(toks) AS stop_ppm,
    CAST(len(list_distinct(toks)) AS BIGINT) * 1000000 // len(toks) AS distinct_ppm
  FROM t
), scored AS (
  SELECT doc_id, label, CAST({_CLS_Z} AS BIGINT) AS z FROM f
), sweep AS (
  SELECT s.label, s.z, t.thr
  FROM scored s, (SELECT unnest([{thr_list}]) AS thr) t
), cm AS (
  SELECT thr,
    CAST(SUM(CASE WHEN label = 1 AND z >= thr THEN 1 ELSE 0 END) AS BIGINT) AS tp,
    CAST(SUM(CASE WHEN label = 0 AND z >= thr THEN 1 ELSE 0 END) AS BIGINT) AS fp,
    CAST(SUM(CASE WHEN label = 0 AND z < thr THEN 1 ELSE 0 END) AS BIGINT) AS tn,
    CAST(SUM(CASE WHEN label = 1 AND z < thr THEN 1 ELSE 0 END) AS BIGINT) AS fn
  FROM sweep GROUP BY thr
)
SELECT CAST(thr AS BIGINT) AS thr, tp, fp, tn, fn,
  CAST((tp * 1000000) // (tp + fn) AS BIGINT) AS tpr_ppm,
  CAST((fp * 1000000) // (fp + tn) AS BIGINT) AS fpr_ppm
FROM cm
"""


@query("quality_gate_roc_sweep", oracle=_roc_oracle(), category="llm-quality")
def quality_gate_roc_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-sweep evaluation of the linear quality gate: the full
    confusion matrix plus TPR/FPR (integer ppm) at 8 operating points
    in ONE pass — the ROC table a pipeline inspects before picking the
    gate threshold. Labels are the corpus's en/non-en split (a proxy
    target; swapping real labels changes one expression).

    Scale: per-doc scoring is row-local (the classifier's zero-shuffle
    path); the sweep is a narrow 8x literal fan-out, and the confusion
    matrix is one map-side-combined conditional aggregate — 8 output
    rows regardless of corpus size. Everything is exact BIGINT
    (counts, integer-DIV rates) — nothing to drift."""
    scored = quality_classifier_linear(spark, sf_dir).select("doc_id", "z_scaled")
    lang = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("label"),
    )
    s = scored.join(lang, "doc_id").select(
        "label", F.col("z_scaled").alias("z")
    )
    thr = spark.createDataFrame(
        [(t,) for t in _ROC_THRESHOLDS], schema="thr bigint"
    )
    cm = (
        s.crossJoin(F.broadcast(thr))
        .groupBy("thr")
        .agg(
            F.sum(F.when((F.col("label") == 1) & (F.col("z") >= F.col("thr")), 1).otherwise(0))
            .cast("bigint").alias("tp"),
            F.sum(F.when((F.col("label") == 0) & (F.col("z") >= F.col("thr")), 1).otherwise(0))
            .cast("bigint").alias("fp"),
            F.sum(F.when((F.col("label") == 0) & (F.col("z") < F.col("thr")), 1).otherwise(0))
            .cast("bigint").alias("tn"),
            F.sum(F.when((F.col("label") == 1) & (F.col("z") < F.col("thr")), 1).otherwise(0))
            .cast("bigint").alias("fn"),
        )
    )
    return cm.select(
        "thr", "tp", "fp", "tn", "fn",
        F.expr("(tp * 1000000) DIV (tp + fn)").cast("bigint").alias("tpr_ppm"),
        F.expr("(fp * 1000000) DIV (fp + tn)").cast("bigint").alias("fpr_ppm"),
    )
