"""Corpus-selection and audit queries (round 5, continued): token
entropy gating, per-source document caps, bigram PMI collocations,
and benchmark-contamination screening at the NEAR-duplicate level.

These extend the curation surface (queries/curation.py) with the
other half of published pretraining-data practice: drop degenerate
low-entropy documents, balance over-represented sources (the Common
Crawl per-domain cap), surface collocations for tokenizer/vocab
decisions, and catch eval-set leakage that exact n-gram overlap
misses because the leaked copy was lightly edited.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokenize_ws
from ..io import load_table
from ..registry import query
from .llm_text import _DUCK_TOKS
from .retrieval import _MH_BANDS, _MH_FRAGS, _MH_FRAGS_SPARK, _MH_ROWS
from .sketches import _md5_mod

# --- token-entropy quality gate ------------------------------------

_ENT_THR = 3.0  # 6-dp entropy floor; median of the fixture is ~3.09

ENTROPY_ORACLE = f"""
WITH occ AS (
  SELECT doc_id, unnest({_DUCK_TOKS}) AS token FROM documents
), cnt AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS c
  FROM occ GROUP BY doc_id, token
), agg AS (
  SELECT doc_id,
    CAST(SUM(c) AS BIGINT) AS n_tokens,
    CAST(COUNT(*) AS BIGINT) AS n_uniq,
    CAST(SUM(CAST(floor(c * ln(c) * 1e9) AS BIGINT)) AS BIGINT) AS s
  FROM cnt GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_uniq,
  CAST(greatest(
    CAST(floor(ln(n_tokens) * 1e9) AS BIGINT) * n_tokens - s, 0
  ) // (n_tokens * 1000) AS BIGINT) / 1e6 AS entropy,
  CAST(CAST(greatest(
    CAST(floor(ln(n_tokens) * 1e9) AS BIGINT) * n_tokens - s, 0
  ) // (n_tokens * 1000) AS BIGINT) / 1e6 >= {_ENT_THR} AS INTEGER) AS kept
FROM agg
"""


@query("text_entropy_gate", oracle=ENTROPY_ORACLE, category="llm-quality")
def text_entropy_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution Shannon entropy per document, with the keep
    flag of an entropy quality gate: H = ln(N) - (1/N)·Σ c·ln(c) over
    the doc's token counts — boilerplate and keyword-stuffed pages
    score low, natural prose high. Order-invariant by construction:
    each count's c·ln(c) is floored to the 1e-9 integer grid FIRST,
    the per-doc sum is exact bigint arithmetic, and the 6-dp entropy
    is an integer division (the money-sum rule applied to ln, as in
    text_idf_quality). One (doc, token) count shuffle with map-side
    combine, then a doc-grain aggregate — at 100 TB this runs at scan
    parallelism; no corpus-wide state, so it scales per-document."""
    d = load_table(spark, sf_dir, "documents")
    occ = d.select("doc_id", F.explode(tokenize_ws("text")).alias("token"))
    cnt = occ.groupBy("doc_id", "token").agg(F.count("*").alias("c"))
    agg = cnt.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count("*").alias("n_uniq"),
        F.sum(F.floor(F.col("c") * F.log("c") * F.lit(1e9))).cast("bigint").alias("__s"),
    )
    ent = F.expr(
        "greatest(cast(floor(ln(n_tokens) * 1e9) as bigint) * n_tokens - __s, 0L)"
        " div (n_tokens * 1000)"
    ) / F.lit(1e6)
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_uniq",
        ent.alias("entropy"),
        (ent >= F.lit(_ENT_THR)).cast("int").alias("kept"),
    )


# --- per-source document cap ---------------------------------------

_CAP_K = 5
_CAP_HASH = _md5_mod("doc_id", "cap", 16777216)

SOURCE_CAP_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, source,
    ROW_NUMBER() OVER (
      PARTITION BY source ORDER BY {_CAP_HASH}, doc_id) AS rk
  FROM documents
)
SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {_CAP_K}
"""


@query("curation_source_cap", oracle=SOURCE_CAP_ORACLE, category="llm-curation")
def curation_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (the Common Crawl per-domain balance
    rule): keep at most K documents per source, chosen by a
    deterministic portable hash rank rather than arrival order, so
    the SAME cap sample survives reruns, repartitions, and engine
    swaps (md5-polynomial hash — the DuckDB oracle ranks with the
    identical integers). One window per source group: domains are
    many and individually bounded, so the rank parallelizes across
    the domain key at 100 TB; a pathological mega-domain would take
    the two-phase sharded-rank treatment (operators/packing.py), and
    an approximate pre-cut on the hash value (h < K/n_est · 2^24)
    can shrink a hot domain's window input first."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.expr(_CAP_HASH), "doc_id")
    return (
        d.select("doc_id", "source")
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= _CAP_K)
    )


# --- bigram PMI collocations ---------------------------------------

_PMI_TOPK = 25

PMI_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
), occ AS (
  SELECT unnest(toks) AS token FROM toks
), uni AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM occ GROUP BY token
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_tok FROM occ
), bi AS (
  SELECT toks[i] AS tok_a, toks[i + 1] AS tok_b
  FROM (SELECT toks, unnest(range(1, len(toks))) AS i
        FROM toks WHERE len(toks) >= 2)
), bic AS (
  SELECT tok_a, tok_b, CAST(COUNT(*) AS BIGINT) AS c_ab FROM bi
  GROUP BY tok_a, tok_b
), btot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_bi FROM bi
)
SELECT tok_a, tok_b, c_ab,
  floor((ln(c_ab) + ln(n_tok) + ln(n_tok) - ln(n_bi) - ln(ua.c)
         - ln(ub.c)) * 1e6) / 1e6 AS pmi
FROM bic
JOIN uni ua ON bic.tok_a = ua.token
JOIN uni ub ON bic.tok_b = ub.token
CROSS JOIN tot CROSS JOIN btot
ORDER BY c_ab DESC, tok_a, tok_b
LIMIT {_PMI_TOPK}
"""


@query("text_bigram_pmi", oracle=PMI_ORACLE, category="llm-text")
def text_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top bigram collocations by support, scored with pointwise
    mutual information — the statistic behind merge decisions in
    BPE-style vocab induction and multi-word-expression detection.
    PMI = ln(p(a,b) / (p(a)p(b))) computed as a FIXED left-to-right
    sum of six ln terms (identical expression shape in the oracle;
    the handful-of-doubles rule), floor-pinned at 6 dp; counts stay
    exact bigints. Plan: narrow adjacent-pair fan-out (no shuffle),
    one bigram-count shuffle with map-side combine, vocab-sized
    unigram frequency broadcast back onto pairs, top-k via
    TakeOrderedAndProject — no corpus-sized window, no n² pair
    space, so the shape survives 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(tokenize_ws("text").alias("toks"))
    occ = toks.select(F.explode("toks").alias("token"))
    uni = occ.groupBy("token").agg(F.count("*").alias("c"))
    n_tok = occ.count()
    bi = toks.filter(F.size("toks") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - 2),
                lambda i: F.struct(
                    F.col("toks")[i].alias("tok_a"),
                    F.col("toks")[i + 1].alias("tok_b"),
                ),
            )
        ).alias("p")
    ).select("p.tok_a", "p.tok_b")
    n_bi = bi.count()
    bic = bi.groupBy("tok_a", "tok_b").agg(F.count("*").alias("c_ab"))
    ua = F.broadcast(uni.select(F.col("token").alias("tok_a"), F.col("c").alias("c_a")))
    ub = F.broadcast(uni.select(F.col("token").alias("tok_b"), F.col("c").alias("c_b")))
    pmi = F.floor(
        (
            F.log("c_ab")
            + F.log(F.lit(float(n_tok)))
            + F.log(F.lit(float(n_tok)))
            - F.log(F.lit(float(n_bi)))
            - F.log("c_a")
            - F.log("c_b")
        )
        * F.lit(1e6)
    ) / F.lit(1e6)
    return (
        bic.join(ua, "tok_a")
        .join(ub, "tok_b")
        .select("tok_a", "tok_b", "c_ab", pmi.alias("pmi"))
        .orderBy(F.desc("c_ab"), "tok_a", "tok_b")
        .limit(_PMI_TOPK)
    )


# --- near-dup benchmark contamination ------------------------------

_CONTAM_EVAL_MOD = 23      # every 23rd doc seeds a perturbed eval twin
_CONTAM_EVAL_BASE = 50000  # eval ids live in their own range

_SIG_COLS_SQL = ",\n    ".join(
    f"MIN({frag}) AS h{j}" for j, frag in enumerate(_MH_FRAGS.values())
)


def _band_sql(src: str) -> str:
    return "\n  UNION ALL\n".join(
        "SELECT id, {b} AS band, {ks} FROM {src}".format(
            b=b,
            src=src,
            ks=", ".join(
                f"h{_MH_ROWS * b + r} AS k{r + 1}" for r in range(_MH_ROWS)
            ),
        )
        for b in range(_MH_BANDS)
    )


_SHINGLE_SQL = """
  SELECT id, unnest(list_distinct(list_transform(range(1, len(toks) - 2),
    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])
  )) AS shingle
  FROM (SELECT id, {toks_expr} AS toks FROM {src}) WHERE len(toks) >= 4
"""

CONTAM_MINHASH_ORACLE = f"""
WITH train AS (SELECT doc_id AS id, text FROM documents),
evald AS (
  SELECT doc_id + {_CONTAM_EVAL_BASE} AS id,
     array_to_string(({_DUCK_TOKS})[1:len({_DUCK_TOKS}) - 1], ' ') AS text
  FROM documents WHERE doc_id % {_CONTAM_EVAL_MOD} = 0
),
sh_t AS ({_SHINGLE_SQL.format(toks_expr=_DUCK_TOKS, src="train")}),
sh_e AS ({_SHINGLE_SQL.format(toks_expr=_DUCK_TOKS, src="evald")}),
sig_t AS (SELECT id, {_SIG_COLS_SQL} FROM sh_t GROUP BY id),
sig_e AS (SELECT id, {_SIG_COLS_SQL} FROM sh_e GROUP BY id),
bands_t AS ({_band_sql("sig_t")}),
bands_e AS ({_band_sql("sig_e")})
SELECT t.id AS train_id, e.id AS eval_id,
  CAST(COUNT(*) AS BIGINT) AS n_bands
FROM bands_t t JOIN bands_e e
  ON t.band = e.band AND t.k1 = e.k1 AND t.k2 = e.k2
  AND t.k3 = e.k3 AND t.k4 = e.k4
GROUP BY t.id, e.id
"""


def _mh_bands(df: DataFrame) -> DataFrame:
    """doc → distinct 4-gram shingles → 8 portable minhashes → banded
    (band, k1..k4) keys. Mirrors dedup_minhash_portable's chain."""
    toks = df.select(
        F.col("id"), tokenize_ws("text").alias("toks")
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
    bands = None
    for b in range(_MH_BANDS):
        part = sig.select(
            "id",
            F.lit(b).alias("band"),
            *[
                F.col(f"h{_MH_ROWS * b + r}").alias(f"k{r + 1}")
                for r in range(_MH_ROWS)
            ],
        )
        bands = part if bands is None else bands.unionByName(part)
    return bands


@query(
    "contamination_minhash",
    oracle=CONTAM_MINHASH_ORACLE,
    category="llm-quality",
)
def contamination_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark contamination at the NEAR-duplicate level: eval
    documents (perturbed copies of every 23rd doc — the planted
    leak fixture) are MinHash-banded with the same portable
    md5-polynomial family as dedup_minhash_portable, and any train
    doc sharing a band bucket with an eval doc is flagged. This
    catches the lightly-edited leak that contamination_ngram_overlap
    (exact 8-gram match) misses. The eval side is benchmark-sized —
    its band table broadcasts — so the probe adds ZERO shuffle to
    the train side beyond the signature aggregate, which runs at
    scan parallelism; at 100 TB the cost is one pass over train.
    Whole chain value-oracled (hash family is dialect-portable)."""
    d = load_table(spark, sf_dir, "documents")
    train = d.select(F.col("doc_id").alias("id"), "text")
    ws = tokenize_ws("text")
    evald = d.filter(F.col("doc_id") % _CONTAM_EVAL_MOD == 0).select(
        (F.col("doc_id") + _CONTAM_EVAL_BASE).alias("id"),
        F.array_join(
            F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))), " "
        ).alias("text"),
    )
    bt = _mh_bands(train)
    be = F.broadcast(_mh_bands(evald))
    keys = ["band", "k1", "k2", "k3", "k4"]
    return (
        bt.alias("t")
        .join(be.alias("e"), keys)
        .groupBy(
            F.col("t.id").alias("train_id"), F.col("e.id").alias("eval_id")
        )
        .agg(F.count("*").alias("n_bands"))
    )


# --- BPE merge induction -------------------------------------------

_BPE_VOCAB = 200   # corpus pass reduces to this many (word, cnt) rows
_BPE_ROUNDS = 3
_BPE_TOPK = 25


def _bpe_pair_cte(src: str, pn: str) -> str:
    return f"""{pn} AS (
  SELECT pcs[i] AS pa, pcs[i+1] AS pb, CAST(SUM(cnt) AS BIGINT) AS total
  FROM (SELECT cnt, pcs, unnest(range(1, len(pcs))) AS i
        FROM (SELECT cnt, list_filter(string_split(st, '|'), x -> x <> '') AS pcs
              FROM {src}) WHERE len(pcs) >= 2)
  GROUP BY pa, pb
)"""


def _bpe_apply_cte(src: str, mn: str, sn: str) -> str:
    pat = f"'|' || {mn}.pa || '|' || {mn}.pb || '|'"
    rep = f"'|' || {mn}.pa || {mn}.pb || '|'"
    return f"""{sn} AS (
  SELECT word, cnt, replace(replace(st, {pat}, {rep}), {pat}, {rep}) AS st
  FROM {src} CROSS JOIN {mn}
)"""


def _bpe_oracle() -> str:
    ctes = [
        f"""wf AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest({_DUCK_TOKS}) AS word FROM documents)
  WHERE regexp_matches(word, '^[a-z0-9]+$')
  GROUP BY word ORDER BY cnt DESC, word LIMIT {_BPE_VOCAB}
)""",
        r"""s0 AS (
  SELECT word, cnt, '|' || regexp_replace(word, '(.)', '\1|', 'g') AS st FROM wf
)""",
    ]
    for r in range(1, _BPE_ROUNDS + 1):
        ctes.append(_bpe_pair_cte(f"s{r - 1}", f"p{r}"))
        ctes.append(
            f"m{r} AS (SELECT pa, pb FROM p{r} ORDER BY total DESC, pa, pb LIMIT 1)"
        )
        ctes.append(_bpe_apply_cte(f"s{r - 1}", f"m{r}", f"s{r}"))
    merge_cols = ",\n  ".join(
        f"(SELECT pa || '+' || pb FROM m{r}) AS merge{r}"
        for r in range(1, _BPE_ROUNDS + 1)
    )
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT word, cnt, st AS pieces,
  {merge_cols}
FROM s{_BPE_ROUNDS} ORDER BY cnt DESC, word LIMIT {_BPE_TOPK}
"""
    )


BPE_ORACLE = _bpe_oracle()


@query("vocab_bpe_merges", oracle=BPE_ORACLE, category="llm-text")
def vocab_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge induction, the iterative heart of tokenizer training:
    count word frequencies over the corpus, then repeatedly merge the
    most frequent adjacent piece pair (3 unrolled rounds here),
    re-segmenting the vocab after each merge. Output = the top-25
    words' final segmentations plus the learned merges — every merge
    choice is value-checked through the segmentations it produced.

    All arithmetic is exact bigint (pair supports are integer sums),
    so the chain is hash-stable with NO float pinning. Merge
    application is two `replace` passes over a '|'-separated piece
    string — leftmost-non-overlapping semantics probed IDENTICAL in
    Spark and DuckDB on the adversarial overlap cases
    (tests/test_selection.py pins them); vocab is restricted to
    ^[a-z0-9]+$ words so the separator never collides.

    Scale shape mirrors production BPE trainers: ONE corpus-scale
    pass (token-count shuffle with map-side combine + TakeOrdered
    top-V) reduces 100 TB to a vocab-sized frequency table; the merge
    loop then runs on that reduction. Following the repo's
    literal-data determinism rule, the vocab table is collected and
    re-shipped via createDataFrame, so each round's argmax (a 1-row
    bounded collect) can never be re-derived differently under AQE
    recompute, and the loop adds zero corpus re-scans."""
    d = load_table(spark, sf_dir, "documents")
    wf = (
        d.select(F.explode(tokenize_ws("text")).alias("word"))
        .filter(F.col("word").rlike("^[a-z0-9]+$"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(_BPE_VOCAB)
    )
    rows = [(r["word"], int(r["cnt"])) for r in wf.collect()]
    states = spark.createDataFrame(rows, "word string, cnt bigint").withColumn(
        "st",
        F.concat(F.lit("|"), F.regexp_replace("word", "(.)", "$1|")),
    )
    merges = []
    for _ in range(_BPE_ROUNDS):
        staged = states.withColumn(
            "__pcs", F.filter(F.split("st", "\\|"), lambda x: x != "")
        ).filter(F.size("__pcs") >= 2)
        pairs = (
            staged.select(
                "cnt",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.size("__pcs") - 2),
                        lambda i: F.struct(
                            F.col("__pcs")[i].alias("pa"),
                            F.col("__pcs")[i + 1].alias("pb"),
                        ),
                    )
                ).alias("p"),
            )
            .select("cnt", "p.pa", "p.pb")
            .groupBy("pa", "pb")
            .agg(F.sum("cnt").cast("bigint").alias("total"))
        )
        top = pairs.orderBy(F.desc("total"), "pa", "pb").limit(1).collect()[0]
        pa, pb = top["pa"], top["pb"]
        merges.append(f"{pa}+{pb}")
        pat, rep = F.lit(f"|{pa}|{pb}|"), F.lit(f"|{pa}{pb}|")
        states = states.withColumn(
            "st", F.replace(F.replace("st", pat, rep), pat, rep)
        )
    out = states.select(
        "word",
        "cnt",
        F.col("st").alias("pieces"),
        *[F.lit(m).alias(f"merge{i + 1}") for i, m in enumerate(merges)],
    )
    return out.orderBy(F.desc("cnt"), "word").limit(_BPE_TOPK)


# --- weighted sampling without replacement -------------------------

_WS_K = 50
_WS_MOD = 16777216
_WS_HASH = _md5_mod("doc_id", "wsamp", _WS_MOD)
# u in (0,1): (h+1)/(mod+2) — exactly representable inputs to ln on
# both engines; key = ln(u)/w is the Efraimidis-Spirakis exponent
# (monotone in u^(1/w)), floored at 9 dp so the top-k ORDER is pinned
# to identical grids across engines, with doc_id as the unique tie-break
_WS_KEY = (
    f"floor(ln(({_WS_HASH} + 1) / {_WS_MOD + 2}.0)"
    " / n_chars * 1e9) / 1e9"
)

WEIGHTED_SAMPLE_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
    {_WS_KEY} AS skey
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, weight, skey FROM keyed
ORDER BY skey DESC, doc_id
LIMIT {_WS_K}
"""


@query(
    "sample_weighted_noreplace",
    oracle=WEIGHTED_SAMPLE_ORACLE,
    category="llm-curation",
)
def sample_weighted_noreplace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    A-ES): each doc draws key = u^(1/w) — here the monotone exponent
    ln(u)/w — and the k largest keys ARE a weighted sample without
    replacement; longer documents (weight = n_chars) are
    proportionally likelier, the training-mix sampler's workhorse.
    u comes from the portable md5-polynomial hash of doc_id, so the
    SAME sample falls out on every run, partitioning, and engine
    (value-oracled, unlike rand()-based sampleBy). The key is floored
    to the 1e-9 grid with doc_id tie-break so cross-engine ordering
    can't flip on a final-ulp difference. One narrow projection +
    TakeOrderedAndProject per-partition heaps: no shuffle of the
    corpus, no global sort — at 100 TB the reduction is k-sized per
    partition, then k-sized at the driver."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    return (
        d.select(
            "doc_id",
            F.col("n_chars").cast("bigint").alias("weight"),
            F.expr(_WS_KEY).alias("skey"),
        )
        .orderBy(F.desc("skey"), "doc_id")
        .limit(_WS_K)
    )


# --- add-one-smoothed bigram LM document scoring -------------------
#
# The KenLM-perplexity quality filter's shape (CCNet / Gopher /
# RedPajama pipelines): train a corpus bigram LM, score every document
# by its mean per-bigram negative log-likelihood, flag the tail. A
# real pipeline trains on a held-out high-quality corpus; here the LM
# trains on the corpus itself (self-perplexity), which keeps the whole
# chain — counts, smoothing, ln terms, per-doc mean — in exact SQL on
# both engines.
#
# Determinism: each bigram's term ln(c1+V) - ln(c12+1) is floored to
# the 1e-9 grid FIRST (order-invariant exact bigint sum — the entropy
# gate's discipline), the per-doc mean is an integer division.

BIGRAM_LM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
),
uni AS (
  SELECT u.w AS w, CAST(COUNT(*) AS BIGINT) AS c1
  FROM toks, unnest(toks.toks) AS u(w) GROUP BY u.w
),
vocab AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM uni),
big AS (
  SELECT doc_id, (toks)[g.i] AS w1, (toks)[g.i + 1] AS w2
  FROM toks, unnest(generate_series(1, len(toks) - 1)) AS g(i)
  WHERE len(toks) >= 2
),
cbig AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM big GROUP BY w1, w2
),
terms AS (
  SELECT b.doc_id,
    CAST(floor((ln(u.c1 + v.v) - ln(cb.c12 + 1)) * 1e9) AS BIGINT) AS t
  FROM big b
  JOIN cbig cb ON cb.w1 = b.w1 AND cb.w2 = b.w2
  JOIN uni u ON u.w = b.w1, vocab v
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
  CAST(CAST(SUM(t) AS BIGINT) // (COUNT(*) * 1000) AS BIGINT) / 1e6
    AS nll_per_bigram
FROM terms GROUP BY doc_id
"""


@query("text_bigram_lm_score", oracle=BIGRAM_LM_ORACLE, category="llm-quality")
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean per-bigram negative log-likelihood of every document under
    an add-one-smoothed corpus bigram LM (see block comment: the
    perplexity-filter shape, self-trained so it stays value-oracled).
    High nll = improbable token transitions = gibberish/boilerplate
    candidates.

    Scale: unigram and bigram count tables combine map-side; the score
    pass joins documents' bigrams to the count tables on the bigram
    key (hash-partitionable; xxhash64 8-byte keys at real scale). The
    unigram table and V broadcast. Self-training is one extra pass
    over the same shuffle keys — a held-out-LM variant just swaps the
    count tables' source."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokenize_ws("text").alias("toks"))
    big = (
        toks.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> struct(toks[i - 1] AS w1, toks[i] AS w2))"
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
    )
    uni = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c1"))
    )
    vocab = uni.agg(F.count("*").alias("v"))
    cbig = big.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    terms = (
        big.join(cbig, ["w1", "w2"])
        .join(F.broadcast(uni), big["w1"] == uni["w"])
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.floor(
                (F.log(F.col("c1") + F.col("v")) - F.log(F.col("c12") + 1))
                * F.lit(1e9)
            )
            .cast("bigint")
            .alias("t"),
        )
    )
    return terms.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        (
            F.expr("sum(t) div (count(*) * 1000)").cast("bigint") / F.lit(1e6)
        ).alias("nll_per_bigram"),
    )


# ---------------------------------------------------------------------------
# BPE tokenizer APPLICATION (encode with a trained merge list)
# ---------------------------------------------------------------------------

# The trained artifact: merge list induced greedily from this corpus
# (see vocab_bpe_merges for the induction op). Applied in rank order
# with the repo's pinned double-replace overlap semantics — identical
# literal chain on both engines.
_BPE_MERGES = (("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"))


def _bpe_apply_chain(col: str) -> str:
    """Nested replace() chain applying every merge (x2 for overlap)."""
    expr = col
    for pa, pb in _BPE_MERGES:
        pat, rep = f"'|{pa}|{pb}|'", f"'|{pa}{pb}|'"
        expr = f"replace(replace({expr}, {pat}, {rep}), {pat}, {rep})"
    return expr


def _bpe_apply_oracle() -> str:
    chain = _bpe_apply_chain("st")
    return f"""
WITH occ AS (
  SELECT doc_id, unnest({_DUCK_TOKS}) AS token FROM documents
), vocab AS (
  SELECT DISTINCT token FROM occ
), enc AS (
  SELECT token,
    CAST(len(list_filter(string_split({chain}, '|'), x -> x <> '')) AS BIGINT)
      AS n_pieces_tok
  FROM (SELECT token, '|' || regexp_replace(token, '(.)', '\\1|', 'g') AS st
        FROM vocab)
), agg AS (
  SELECT o.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
    CAST(SUM(e.n_pieces_tok) AS BIGINT) AS n_pieces
  FROM occ o JOIN enc e ON o.token = e.token
  GROUP BY o.doc_id
)
SELECT doc_id, n_tokens, n_pieces,
  CAST(n_pieces * 1000 // n_tokens AS BIGINT) AS pieces_per_token_milli
FROM agg
"""


@query("text_bpe_apply", oracle=_bpe_apply_oracle(), category="llm-text")
def text_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION: encode every document with a trained BPE
    merge list (the artifact `vocab_bpe_merges` induces), reporting
    per-doc subword counts and the pieces-per-token ratio — the
    fertility metric tokenizer teams track per corpus slice. The
    merge list is literal (shared by both engines); merges apply in
    rank order with the pinned double-replace overlap semantics. The
    encode runs on the DISTINCT-token vocabulary, then joins counts
    back to occurrences — the 100 TB move: merge work is
    vocabulary-sized (thousands), never corpus-sized (trillions); the
    join broadcasts the encoded vocab. All counts are exact BIGINTs."""
    d = load_table(spark, sf_dir, "documents")
    occ = d.select(
        "doc_id", F.explode(tokenize_ws("text")).alias("token")
    )
    vocab = occ.select("token").distinct()
    enc = vocab.withColumn(
        "st", F.concat(F.lit("|"), F.regexp_replace("token", "(.)", "$1|"))
    )
    chain = F.col("st")
    for pa, pb in _BPE_MERGES:
        pat, rep = F.lit(f"|{pa}|{pb}|"), F.lit(f"|{pa}{pb}|")
        chain = F.replace(F.replace(chain, pat, rep), pat, rep)
    enc = enc.select(
        "token",
        F.size(F.filter(F.split(chain, "\\|"), lambda x: x != ""))
        .cast("bigint")
        .alias("n_pieces_tok"),
    )
    agg = (
        occ.join(F.broadcast(enc), "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum("n_pieces_tok").cast("bigint").alias("n_pieces"),
        )
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_pieces",
        F.expr("n_pieces * 1000 div n_tokens").cast("bigint").alias(
            "pieces_per_token_milli"
        ),
    )
