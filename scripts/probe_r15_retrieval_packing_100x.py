"""Round-15: extend 100x VALUE coverage to the retrieval/packing
families (VERDICT r14 item 6) — the last big families on 10x-only
evidence. Reuses probe_r14_docs_value_100x's clone (documents with
doc_id shifted 1e8 per clone; texts identical per clone) and its two
constructions, derived-expected and full-reconstruction, both
dtype-strict via parity.compare_pandas.

Scaling laws (each provable from the clone structure):

- text_bm25_topk: tf/dl/avgdl are clone-invariant (avgdl = 100S/100N
  is the correctly-rounded value of the same rational as S/N, the
  tfidf precedent), but idf is NOT scale-free — (100N - 100df + 0.5)
  / (100df + 0.5) is a different rational than the 1x one because the
  +0.5 smoothing does not scale. Expected therefore comes from the
  1x oracle with n_docs and df literally scaled x100 inside the
  score (string-patched CTEs, asserted), replicated per clone and
  re-ranked globally under the query's own (bm25 DESC, doc_id).
- text_inverted_index: df/cf scale x100; the posting list is the
  per-clone 1x posting list concatenated in clone order (clone
  shifts preserve doc_id order across clones), rebuilt with
  list_transform on the 1x postings string. This also stress-tests
  the documented single-row-budget ceiling: head-term postings grow
  100x into multi-MB cells (the docstring's shard-by-(token, doc_id
  div R) scale path exists for exactly this).
- doc_pack_sequences: one GLOBAL prefix sum in doc_id order, so
  clone c's running sum starts at c*S (S = 1x corpus tokens):
  s' = bin_id*CTX + bin_offset + c*S, re-split into (s' DIV CTX,
  s' MOD CTX). Bins genuinely straddle clone boundaries — the
  expected frame is NOT a per-clone replica, which is what makes
  this a real check of the two-phase prefix sum at 100x.
- doc_pack_greedy: sharded by doc_id DIV 1000 and the clone stride
  is a multiple of 1000, so clones are shard-disjoint and the walk
  replays per clone: bin_id' = bin_id + c*(SHIFT/1000)*1e9.
- length_bucket_packing: per-bucket ROW_NUMBER in doc_id order means
  clone c's docs occupy rns (c*bcnt, (c+1)*bcnt]; batches of 8
  straddle clones when bcnt % 8 != 0 — expected reconstructs the
  full 100x per-doc frame from the 1x bucketed CTE and re-batches.

hybrid_search_rrf is deliberately NOT probed on this clone: its
dense leg ranks the (un-cloned, symlinked) embeddings table, so a
documents-only clone scales one leg and degenerates the fusion; its
BM25 leg is covered here and its dense leg by the knn family's
embedding-side evidence.

Usage: python scripts/probe_r15_retrieval_packing_100x.py [names...]
Results land as rows in SCALING.md (round-15 section).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probe_r14_docs_value_100x import (  # noqa: E402
    DOC_SHIFT,
    DOCS_OUT,
    FACTOR,
    build_docs_clone,
)

SF = "/root/testdata/sf0.1"
CLONES = f"(SELECT unnest(generate_series(0, {FACTOR - 1})) AS c)"


def _strip_limit(oracle: str) -> str:
    i = oracle.rstrip().rfind("ORDER BY")
    tail = oracle[i:]
    # guard the textual assumption (ADVICE r14): the stripped tail must
    # be the final ORDER BY ... LIMIT clause (no nested SELECT), or the
    # probe would silently truncate mid-query after an oracle edit
    assert "LIMIT" in tail and "SELECT" not in tail.upper(), (
        f"_strip_limit tail looks wrong: {tail[:80]!r}"
    )
    return oracle[:i]


def _expected_bm25() -> str:
    from glue_etl_pyspark_spark.queries.retrieval import BM25_ORACLE, _BM25_TOPK

    body = _strip_limit(BM25_ORACLE)
    patches = [
        (
            "CAST(COUNT(*) AS BIGINT) AS n_docs",
            f"CAST(COUNT(*) * {FACTOR} AS BIGINT) AS n_docs",
        ),
        (
            "SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tfs GROUP BY term",
            f"SELECT term, CAST(COUNT(*) * {FACTOR} AS BIGINT) AS df "
            "FROM tfs GROUP BY term",
        ),
    ]
    for old, new in patches:
        assert body.count(old) == 1, f"BM25 oracle drifted; patch {old!r}"
        body = body.replace(old, new)
    return f"""WITH base AS ({body})
    SELECT doc_id + c.c * {DOC_SHIFT} AS doc_id, bm25
    FROM base CROSS JOIN {CLONES} c
    ORDER BY bm25 DESC, doc_id LIMIT {_BM25_TOPK}"""


def _expected_inverted() -> str:
    from glue_etl_pyspark_spark.queries.llm_text import INVERTED_INDEX_ORACLE

    return f"""WITH base AS ({INVERTED_INDEX_ORACLE}),
    shifted AS (
      SELECT token, df, cf, c.c AS c,
        array_to_string(list_transform(string_split(postings, ','),
          x -> CAST(CAST(string_split(x, ':')[1] AS BIGINT)
                    + c.c * {DOC_SHIFT} AS VARCHAR)
               || ':' || string_split(x, ':')[2]), ',') AS p
      FROM base CROSS JOIN {CLONES} c
    )
    SELECT token, CAST(df * {FACTOR} AS BIGINT) AS df,
      CAST(cf * {FACTOR} AS BIGINT) AS cf,
      string_agg(p, ',' ORDER BY c) AS postings
    FROM shifted GROUP BY token, df, cf"""


def _expected_pack_sequences() -> str:
    from glue_etl_pyspark_spark.queries.llm_pack import _CTX, PACK_ORACLE

    return f"""WITH base AS ({PACK_ORACLE}),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS s_total FROM base)
    SELECT doc_id + c.c * {DOC_SHIFT} AS doc_id, n_tokens,
      CAST((bin_id * {_CTX} + bin_offset + c.c * s_total) // {_CTX}
           AS BIGINT) AS bin_id,
      CAST((bin_id * {_CTX} + bin_offset + c.c * s_total) % {_CTX}
           AS BIGINT) AS bin_offset
    FROM base CROSS JOIN tot CROSS JOIN {CLONES} c"""


def _expected_pack_greedy() -> str:
    from glue_etl_pyspark_spark.queries.llm_pack import (
        _SHARD_SPAN,
        GREEDY_ORACLE,
    )

    assert DOC_SHIFT % _SHARD_SPAN == 0
    stride = (DOC_SHIFT // _SHARD_SPAN) * 1_000_000_000
    return f"""WITH base AS ({GREEDY_ORACLE})
    SELECT doc_id + c.c * {DOC_SHIFT} AS doc_id, n_tokens,
      CAST(bin_id + c.c * {stride} AS BIGINT) AS bin_id, bin_fill
    FROM base CROSS JOIN {CLONES} c"""


def _expected_length_buckets() -> str:
    from glue_etl_pyspark_spark.queries.llm_pack import _BUCKET_SQL
    from glue_etl_pyspark_spark.queries.llm_text import _DUCK_TOKS

    return f"""WITH sized AS (
      SELECT doc_id, CAST(len({_DUCK_TOKS}) AS BIGINT) AS n_tokens
      FROM documents
    ),
    bucketed AS (
      SELECT n_tokens, CAST({_BUCKET_SQL} AS BIGINT) AS bucket_len,
        ROW_NUMBER() OVER (PARTITION BY {_BUCKET_SQL} ORDER BY doc_id) AS rn,
        COUNT(*) OVER (PARTITION BY {_BUCKET_SQL}) AS bcnt
      FROM sized
    ),
    r100 AS (
      SELECT bucket_len, n_tokens, rn + c.c * bcnt AS rn
      FROM bucketed CROSS JOIN {CLONES} c
    )
    SELECT bucket_len, CAST(floor((rn - 1) / 8.0) AS BIGINT) AS batch_id,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
      CAST(COUNT(*) AS BIGINT) * bucket_len
        - CAST(SUM(n_tokens) AS BIGINT) AS pad_tokens
    FROM r100
    GROUP BY bucket_len, CAST(floor((rn - 1) / 8.0) AS BIGINT)"""


CASES = {
    "text_bm25_topk": _expected_bm25,
    "text_inverted_index": _expected_inverted,
    "doc_pack_sequences": _expected_pack_sequences,
    "doc_pack_greedy": _expected_pack_greedy,
    "length_bucket_packing": _expected_length_buckets,
}


def main() -> None:
    from glue_etl_pyspark_spark.parity import compare_pandas, duckdb_connect
    from glue_etl_pyspark_spark.registry import load_all

    from glue_etl_pyspark_spark.session import get_spark

    names = sys.argv[1:] or list(CASES)
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    build_docs_clone()
    con = duckdb_connect(SF)
    reg = load_all()
    for name in names:
        t0 = time.time()
        sp100 = reg[name].fn(spark, DOCS_OUT)
        sp100.persist()
        n100 = sp100.count()
        wall = time.time() - t0
        t0 = time.time()
        exp = con.execute(CASES[name]())
        verdict = compare_pandas(sp100, exp)
        print(
            f"{name}: 100x {n100} rows/{wall:.1f}s; derived-expected "
            f"check @100x: {verdict} ({time.time() - t0:.1f}s oracle side)",
            flush=True,
        )
        sp100.unpersist()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
