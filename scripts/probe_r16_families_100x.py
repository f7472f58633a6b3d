"""Round-16 scale probe for text_repeat_families at 10x/100x doc
clones (probe_r15_suffix_scale's clone: doc_id shifted 1e8 per clone,
texts identical).

Derived-expected law for N text-identical clones. Family membership
is the connectivity of the "docs share a _FAM_K-gram" relation — a
pure function of the TEXTS, so id-shifting cannot perturb it (the
id-hashing caveat of the graph probes does not apply: the star-edge
hub choice affects edges but never components). Clone (c, d) shares
every gram with (c', d), so:

- every base component C over docs with >= K tokens (including base
  singletons!) lifts to ONE family of N * |C| members: label/min_doc
  = min(C) (clone 0), max_doc = max(C) + (N-1) * DOC_SHIFT;
- docs with < K tokens have no grams and stay singletons in EVERY
  clone: N families of 1 each;
- n_families = (#base components over >=K-token docs) + N * (#short
  docs).

The expected frame re-runs the base-corpus closure oracle (1x DuckDB
work) and applies the lift — a full re-derivation, never a rescale of
output values (the BM25 smoothing lesson does not bite: component
structure is scale-free by the argument above).

Usage: python scripts/probe_r16_families_100x.py [factor ...]
(default 10 100). Results land in SCALING.md round-16.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probe_r15_suffix_scale import DOC_SHIFT, SF, build_clone  # noqa: E402


def expected_sql(factor: int) -> str:
    from glue_etl_pyspark_spark.queries.llm_text import _DUCK_TOKS
    from glue_etl_pyspark_spark.queries.suffixes import _FAM_K, _FAM_TOPK

    return f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, {_DUCK_TOKS} AS toks
  FROM read_parquet('{SF}/documents.parquet')
),
grams AS MATERIALIZED (
  SELECT DISTINCT doc_id, array_to_string(toks[i : i + {_FAM_K - 1}], ' ') AS gram
  FROM (SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - {_FAM_K - 1})) AS i
        FROM toks WHERE len(toks) >= {_FAM_K})
),
hubs AS MATERIALIZED (
  SELECT gram, MIN(doc_id) AS hub, COUNT(*) AS n FROM grams GROUP BY gram
),
sedges AS MATERIALIZED (
  SELECT DISTINCT h.hub AS u, g.doc_id AS v
  FROM grams g JOIN hubs h USING (gram)
  WHERE h.n >= 2 AND g.doc_id <> h.hub
),
edges AS MATERIALIZED (
  SELECT u, v FROM sedges UNION ALL SELECT v, u FROM sedges
),
nodes AS MATERIALIZED (
  SELECT doc_id AS node FROM toks WHERE len(toks) >= {_FAM_K}
),
reach(node, lbl) AS (
  SELECT node, node AS lbl FROM nodes
  UNION
  SELECT e.u AS node, r.lbl FROM edges e JOIN reach r ON r.node = e.v
),
comp AS MATERIALIZED (
  SELECT node, MIN(lbl) AS label FROM reach GROUP BY node
),
basefam AS MATERIALIZED (
  SELECT label AS family, COUNT(*) AS base_n,
         MIN(node) AS mn, MAX(node) AS mx
  FROM comp GROUP BY label
),
shorts AS (SELECT doc_id FROM toks WHERE len(toks) < {_FAM_K}),
clones AS (SELECT unnest(generate_series(0, {factor - 1})) AS c),
fams AS MATERIALIZED (
  SELECT CAST(family AS BIGINT) AS family,
         CAST(base_n * {factor} AS BIGINT) AS n_docs,
         CAST(mn AS BIGINT) AS min_doc,
         CAST(mx + {(factor - 1) * DOC_SHIFT} AS BIGINT) AS max_doc
  FROM basefam
  UNION ALL
  SELECT CAST(s.doc_id + cl.c * {DOC_SHIFT} AS BIGINT),
         CAST(1 AS BIGINT),
         CAST(s.doc_id + cl.c * {DOC_SHIFT} AS BIGINT),
         CAST(s.doc_id + cl.c * {DOC_SHIFT} AS BIGINT)
  FROM shorts s CROSS JOIN clones cl
)
SELECT family, n_docs, min_doc, max_doc,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM fams) AS n_families
FROM fams ORDER BY n_docs DESC, family LIMIT {_FAM_TOPK}
"""


def main() -> None:
    import duckdb

    from glue_etl_pyspark_spark.parity import compare_pandas
    from glue_etl_pyspark_spark.registry import load_all
    from glue_etl_pyspark_spark.session import get_spark

    factors = [int(a) for a in sys.argv[1:]] or [10, 100]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    fn = load_all()["text_repeat_families"].fn
    con = duckdb.connect()
    t0 = time.time()
    n1 = fn(spark, SF).count()
    print(f"text_repeat_families 1x: {n1} rows/{time.time() - t0:.1f}s",
          flush=True)
    for factor in factors:
        clone = build_clone(factor)
        t0 = time.time()
        sp = fn(spark, clone)
        sp.persist()
        n = sp.count()
        wall = time.time() - t0
        t0 = time.time()
        verdict = compare_pandas(sp, con.execute(expected_sql(factor)))
        print(
            f"text_repeat_families {factor}x: {n} rows/{wall:.1f}s; "
            f"derived-expected: {verdict} "
            f"({time.time() - t0:.1f}s oracle side)",
            flush=True,
        )
        sp.unpersist()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
