"""Round-16 scale probe for the new LCP-interval ops
(text_longest_repeat_per_doc, text_exactsubstr_cut) at 10x/100x doc
clones (probe_r15_suffix_scale's clone: doc_id shifted 1e8 per clone,
texts identical).

Derived-expected law for N >= 2 text-identical clones: EVERY suffix
then occurs at another (doc, pos) — its clone twin — so rep_len(p) =
slen(p) = n_tokens - p for every position. Hence per doc:

- longest repeat  = (n_tokens at pos 0, sample = first min(n, 8)
  tokens) for every clone member;
- cut: the pos-0 interval [0, n) covers everything once any interval
  fires, and intervals need slen >= K, so cut_tokens = n and
  kept_text = '' when n >= K, else nothing is cut (kept = the full
  lowercased token join).

Degenerate by construction (only the duplicate-group code path on the
rank side) — the singleton/LCP path is value-pinned by the sf0.01
driver oracle, the sf0.1 sweep, and the brute-force hypothesis gate;
this probe's job is the 35M-suffix ranking volume plus the interval
sweep and token re-join at 100x.

Usage: python scripts/probe_r16_lcp_100x.py [factor ...]  (default
10 100). Results land in SCALING.md round-16.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probe_r15_suffix_scale import DOC_SHIFT, SF, build_clone  # noqa: E402


def expected_sql(name: str, factor: int) -> str:
    from glue_etl_pyspark_spark.queries.llm_text import _DUCK_TOKS
    from glue_etl_pyspark_spark.queries.suffixes import _CUT_K, _SAMPLE_TOKS

    head = f"""
WITH toks AS (
  SELECT doc_id, {_DUCK_TOKS} AS toks
  FROM read_parquet('{SF}/documents.parquet')
),
clones AS (SELECT unnest(generate_series(0, {factor - 1})) AS c)
"""
    if name == "text_longest_repeat_per_doc":
        return f"""{head}
SELECT CAST(t.doc_id + cl.c * {DOC_SHIFT} AS BIGINT) AS doc_id,
       CAST(len(t.toks) AS BIGINT) AS n_tokens,
       CAST(len(t.toks) AS BIGINT) AS rep_len,
       CAST(0 AS BIGINT) AS rep_pos,
       COALESCE(array_to_string(
         t.toks[1:CAST(least(len(t.toks), {_SAMPLE_TOKS}) AS BIGINT)],
         ' '), '') AS sample
FROM toks t CROSS JOIN clones cl
WHERE len(t.toks) > 0
ORDER BY doc_id
"""
    return f"""{head}
SELECT CAST(t.doc_id + cl.c * {DOC_SHIFT} AS BIGINT) AS doc_id,
       CAST(len(t.toks) AS BIGINT) AS n_tokens,
       CAST(CASE WHEN len(t.toks) >= {_CUT_K}
                 THEN len(t.toks) ELSE 0 END AS BIGINT) AS cut_tokens,
       CASE WHEN len(t.toks) >= {_CUT_K} THEN ''
            ELSE COALESCE(array_to_string(t.toks, ' '), '')
       END AS kept_text
FROM toks t CROSS JOIN clones cl
WHERE len(t.toks) > 0
ORDER BY doc_id
"""


def main() -> None:
    import duckdb

    from glue_etl_pyspark_spark.parity import compare_pandas
    from glue_etl_pyspark_spark.registry import load_all

    from glue_etl_pyspark_spark.session import get_spark

    factors = [int(a) for a in sys.argv[1:]] or [10, 100]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    con = duckdb.connect()
    for name in ("text_longest_repeat_per_doc", "text_exactsubstr_cut"):
        fn = reg[name].fn
        t0 = time.time()
        n1 = fn(spark, SF).count()
        print(f"{name} 1x: {n1} rows/{time.time() - t0:.1f}s", flush=True)
        for factor in factors:
            clone = build_clone(factor)
            t0 = time.time()
            sp = fn(spark, clone)
            sp.persist()
            n = sp.count()
            wall = time.time() - t0
            t0 = time.time()
            verdict = compare_pandas(sp, con.execute(expected_sql(name, factor)))
            print(
                f"{name} {factor}x: {n} rows/{wall:.1f}s; "
                f"derived-expected: {verdict} "
                f"({time.time() - t0:.1f}s oracle side)",
                flush=True,
            )
            sp.unpersist()
            spark.catalog.clearCache()


if __name__ == "__main__":
    main()
