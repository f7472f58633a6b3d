"""Round-14 follow-on: upgrade doc-family 100x evidence from
rows-stable (the r12 63/63 sweep) to exact VALUE checks, using the
derived-expected construction from probe_r14_graph_100x.

Clone: documents 100x with doc_id shifted by 1e8 per clone (1e8, not
1e6 — dedup_exact's oracle unions an internal doc_id+1e6 copy, and a
1e6 clone stride would collide with it). Texts identical per clone,
so the scaling law per query is provable:

- text_stopword_topterms: corpus word counts scale exactly x100;
  (freq DESC, word) ranking and rn unchanged -> base with freq*100.
- text_vocab_build: token counts x100, top-4096 ranking and vocab_id
  unchanged -> base with n*100.
- text_tfidf: output is restricted to doc_id < 100 (clone 0 only);
  tf invariant, and idf = ln(N/df) with N and df both x100 is
  BIT-identical (100N/100df is the correctly-rounded value of the
  same rational as N/df, IEEE division) -> base EXACTLY.
- dedup_exact: every text's global MIN(doc_id) representative is the
  clone-0 original (all shifted ids are larger) -> base EXACTLY —
  dedup under 100x exact duplication returns the identical canonical
  set, which is the operator's actual job description.
- line_dedup_corpus: first-occurrence is ordered by (doc_id,
  line_no), so clone-0 rows reproduce the 1x answer and every line
  in clones >0 is already seen -> base UNION (shifted doc_id,
  n_lines, 0 kept, 0.0 frac) per clone >0.
- contamination_ngram_overlap: the eval split doc_id % 10 = 7 is
  shift-invariant (1e8 % 10 = 0) and the train gram SET is unchanged
  by cloning -> base rows replicated per clone with shifted doc_id.
- agg_count_min_topk (lineitem CMS, uses the probe_r13 ORDER-shifted
  basket clone): partkey ids unchanged so every (seed, bucket)
  counter, the min-over-seeds estimate, the true counts, and the
  overcount all scale exactly x100; (est DESC, partkey) order
  preserved -> base with est/true_cnt/overcount *100.

Usage: python scripts/probe_r14_docs_value_100x.py [names...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probe_r13_basket_100x import OUT as BASKET_OUT  # noqa: E402
from probe_r13_basket_100x import build_clone as build_basket_clone  # noqa: E402

SF = "/root/testdata/sf0.1"
DOCS_OUT = "/tmp/spark_graft_probe_docsval_100x"
FACTOR = 100
DOC_SHIFT = 100_000_000
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

CLONES = f"(SELECT unnest(generate_series(0, {FACTOR - 1})) AS c)"

# name -> (clone dir, SQL over `base` = the un-modified 1x oracle
# output producing the EXACT expected 100x frame)
CASES: dict[str, tuple[str, str]] = {
    "text_stopword_topterms": (
        DOCS_OUT,
        "SELECT word, CAST(freq * 100 AS BIGINT) AS freq, rn FROM base",
    ),
    "text_vocab_build": (
        DOCS_OUT,
        "SELECT token, CAST(n * 100 AS BIGINT) AS n, vocab_id FROM base",
    ),
    # df is corpus-global (x100) even though the output is restricted
    # to clone-0 doc_ids; tf, tfidf (ln(100N/100df) bit-identical to
    # ln(N/df)), and the per-doc ranking are invariant.
    "text_tfidf": (
        DOCS_OUT,
        """SELECT doc_id, token, tf, CAST(df * 100 AS BIGINT) AS df,
               tfidf, rn FROM base""",
    ),
    "dedup_exact": (DOCS_OUT, "SELECT * FROM base"),
    "line_dedup_corpus": (
        DOCS_OUT,
        f"""SELECT doc_id, n_lines, n_kept, kept_frac FROM base
        UNION ALL
        SELECT doc_id + c.c * {DOC_SHIFT} AS doc_id, n_lines,
               CAST(0 AS BIGINT) AS n_kept, 0.0 AS kept_frac
        FROM base CROSS JOIN {CLONES} c WHERE c.c > 0""",
    ),
    "contamination_ngram_overlap": (
        DOCS_OUT,
        f"""SELECT doc_id + c.c * {DOC_SHIFT} AS doc_id, n_grams, n_hit,
               contam_frac, contaminated
        FROM base CROSS JOIN {CLONES} c""",
    ),
    "agg_count_min_topk": (
        BASKET_OUT,
        """SELECT l_partkey, CAST(est * 100 AS BIGINT) AS est,
               CAST(true_cnt * 100 AS BIGINT) AS true_cnt,
               CAST(overcount * 100 AS BIGINT) AS overcount
        FROM base""",
    ),
}


def build_docs_clone() -> None:
    import duckdb

    if os.path.exists(f"{DOCS_OUT}/documents.parquet"):
        return
    os.makedirs(DOCS_OUT, exist_ok=True)
    duckdb.connect().execute(
        f"""COPY (
          SELECT d.doc_id + t.c * {DOC_SHIFT} AS doc_id,
                 d.* EXCLUDE (doc_id)
          FROM read_parquet('{SF}/documents.parquet') d
          CROSS JOIN {CLONES} t
        ) TO '{DOCS_OUT}/documents.parquet' (FORMAT parquet)"""
    )
    for t in TABLES:
        dst = f"{DOCS_OUT}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SF}/{t}.parquet", dst)


def _compare(spark_df, duck_res) -> str:
    """Dtype-strict compare via parity.compare_pandas (toPandas/.df
    + astype(str) — the r4 HUGEINT rule; ADVICE r14 fix)."""
    from glue_etl_pyspark_spark.parity import compare_pandas

    return compare_pandas(spark_df, duck_res)


def main() -> None:
    from glue_etl_pyspark_spark.parity import duckdb_connect
    from glue_etl_pyspark_spark.registry import load_all
    from glue_etl_pyspark_spark.session import get_spark

    names = sys.argv[1:] or list(CASES)
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    build_docs_clone()
    if any(CASES[n][0] == BASKET_OUT for n in names):
        build_basket_clone()
    con = duckdb_connect(SF)
    reg = load_all()
    for name in names:
        clone_dir, scale_sql = CASES[name]
        t0 = time.time()
        sp100 = reg[name].fn(spark, clone_dir)
        sp100.persist()
        n100 = sp100.count()
        wall = time.time() - t0
        t0 = time.time()
        exp = con.execute(f"WITH base AS ({reg[name].oracle}) {scale_sql}")
        verdict = _compare(sp100, exp)
        print(
            f"{name}: 100x {n100} rows/{wall:.1f}s; derived-expected "
            f"check @100x: {verdict} ({time.time() - t0:.1f}s oracle side)",
            flush=True,
        )
        sp100.unpersist()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
