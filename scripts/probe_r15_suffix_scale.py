"""Round-15: scale probe for text_repeated_substrings (suffix
ranking) at 10x and 100x doc clones (doc_id shifted 1e8 per clone,
texts identical — probe_r14_docs_value_100x's clone).

Derived-expected law for N disjoint text-identical clones: every 1x
rank group's token sequence recurs in each clone, so each group gains
N-1 extra members.

- adjacent (LCP) pairs: reps stay the clone-0 members (smallest
  doc_ids) -> identical to the 1x adj pairs.
- tie pairs of 1x groups with >=2 members: the two smallest members
  are both clone-0 -> identical to 1x.
- 1x-UNIQUE groups become N-member groups whose second member is the
  clone-1 copy -> a NEW full-length tie pair (doc, pos, doc+SHIFT,
  pos, slen) for every 1x-unique suffix. These dominate the top-20
  (whole-document repeats across clones) — degenerate-looking but
  exactly what ExactSubstr must report for a corpus of exact
  duplicates.

The expected frame is built by re-using the 1x oracle's CTE chain up
to ties and appending the clone_ties construction — entirely DuckDB,
dtype-strict compare. Round COUNT is domain-bounded (doc length), so
cloning leaves it unchanged: wall growth is pure per-round volume.

Usage: python scripts/probe_r15_suffix_scale.py [factor ...]
(default: 10 100). Results land in SCALING.md round-15.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
DOC_SHIFT = 100_000_000
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def build_clone(factor: int) -> str:
    import duckdb

    out = f"/tmp/spark_graft_probe_suffix_{factor}x"
    if not os.path.exists(f"{out}/documents.parquet"):
        os.makedirs(out, exist_ok=True)
        duckdb.connect().execute(
            f"""COPY (
              SELECT d.doc_id + t.c * {DOC_SHIFT} AS doc_id,
                     d.* EXCLUDE (doc_id)
              FROM read_parquet('{SF}/documents.parquet') d
              CROSS JOIN (SELECT unnest(generate_series(0, {factor - 1})) AS c) t
            ) TO '{out}/documents.parquet' (FORMAT parquet)"""
        )
        for t in TABLES:
            dst = f"{out}/{t}.parquet"
            if not os.path.exists(dst):
                os.symlink(f"{SF}/{t}.parquet", dst)
    return out


def expected_sql() -> str:
    from glue_etl_pyspark_spark.queries.suffixes import (
        REPEATED_SUBSTR_ORACLE,
        _SAMPLE_TOKS,
        _SUF_TOPK,
    )

    cut = REPEATED_SUBSTR_ORACLE.index("allp AS (")
    head = REPEATED_SUBSTR_ORACLE[:cut]
    return f"""{head}
clone_ties AS (
  SELECT a.doc_id AS doc_a, a.pos AS pos_a,
         a.doc_id + {DOC_SHIFT} AS doc_b, a.pos AS pos_b,
         a.slen AS lcp, a.ta
  FROM wrep a LEFT JOIN sec s USING (r) WHERE s.r IS NULL
),
allp AS (
  SELECT * FROM adj UNION ALL SELECT * FROM ties
  UNION ALL SELECT * FROM clone_ties
)
SELECT CAST(lcp AS BIGINT) AS lcp, CAST(doc_a AS BIGINT) AS doc_a,
  CAST(pos_a AS BIGINT) AS pos_a, CAST(doc_b AS BIGINT) AS doc_b,
  CAST(pos_b AS BIGINT) AS pos_b,
  COALESCE(array_to_string(
    ta[1:CAST(least(lcp, {_SAMPLE_TOKS}) AS BIGINT)], ' '), '') AS sample
FROM allp
ORDER BY lcp DESC, doc_a, pos_a, doc_b, pos_b LIMIT {_SUF_TOPK}
"""


def main() -> None:
    from glue_etl_pyspark_spark.parity import compare_pandas, duckdb_connect
    from glue_etl_pyspark_spark.registry import load_all
    from glue_etl_pyspark_spark.session import get_spark

    factors = [int(a) for a in sys.argv[1:]] or [10, 100]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    fn = load_all()["text_repeated_substrings"].fn
    t0 = time.time()
    n1 = fn(spark, SF).count()
    print(f"1x: {n1} rows/{time.time() - t0:.1f}s", flush=True)
    con = duckdb_connect(SF)
    for factor in factors:
        clone = build_clone(factor)
        t0 = time.time()
        sp = fn(spark, clone)
        sp.persist()
        n = sp.count()
        wall = time.time() - t0
        t0 = time.time()
        exp = con.execute(expected_sql())
        verdict = compare_pandas(sp, exp)
        print(
            f"{factor}x: {n} rows/{wall:.1f}s; derived-expected check: "
            f"{verdict} ({time.time() - t0:.1f}s oracle side)",
            flush=True,
        )
        sp.unpersist()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
