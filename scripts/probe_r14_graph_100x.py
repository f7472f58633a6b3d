"""Round-14 100x probes (VERDICT r13 items 2 + 4).

Two gaps left by r13: graph_kcore_peel and text_rake_keywords were
probed at 10x only, and graph_label_propagation's 100x row carried no
external value evidence (the full unrolled oracle exhausts DuckDB's
temp disk at 100x against Spark's own spills).

The trick that fixes both at once: clone with EVERY key shifted per
clone — l_orderkey AND l_partkey for the graph ops, doc_id for RAKE —
so the 100x input is 100 DISJOINT copies of the 1x input. Then the
exact 100x answer is DERIVABLE in DuckDB from the full (un-LIMITed)
1x oracle, which DuckDB computes comfortably:

- kcore: per-node core_deg identical per clone; k threshold is a
  ratio (count*3 DIV nodes*4) so it is clone-invariant; n_core scales
  exactly 100x; top-20 by (core_deg DESC, node) = the globally best
  core_deg rows with the smallest shifted node ids.
- RAKE: freq/deg/n_occ/deg_sum/freq_sum all scale exactly 100x and
  score_ppm = deg_sum*1e6 // freq_sum is invariant under the common
  factor (floor of an unchanged rational), so ordering is unchanged.
- LPA is the exception (see probe_lpa docstring): the KNN tie-break
  hash mixes absolute ids, so clones are NOT isomorphic — it gets a
  per-clone full-oracle subset check instead.

Each expected frame is computed END-TO-END IN DUCKDB (1x oracle minus
LIMIT + a clone cross join + the query's own ORDER BY/LIMIT) and
compared dtype-strict (toPandas/.df + astype(str), never fetchall —
the r4 HUGEINT rule) against Spark running the real query on the 100x
clone. That is external value evidence AT 100x, not rows-stable.

Usage: python scripts/probe_r14_graph_100x.py [kcore|lpa|rake|cc|msf ...]
Derived data stays in /tmp; results land as rows in SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
GRAPH_OUT = "/tmp/spark_graft_probe_graph_100x"
DOCS_OUT = "/tmp/spark_graft_probe_rakedocs_100x"
FACTOR = 100
ORDER_SHIFT = 10_000_000   # sf0.1 orderkeys < 10M
PART_SHIFT = 1_000_000     # sf0.1 partkeys < 1M (20k parts)
DOC_SHIFT = 1_000_000      # sf0.1 doc_ids < 1M
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _symlink_rest(out: str) -> None:
    for t in TABLES:
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SF}/{t}.parquet", dst)


def build_graph_clone() -> None:
    import duckdb

    if os.path.exists(f"{GRAPH_OUT}/lineitem.parquet"):
        return
    os.makedirs(GRAPH_OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"""COPY (
          SELECT l.l_orderkey + t.c * {ORDER_SHIFT} AS l_orderkey,
                 l.l_partkey + t.c * {PART_SHIFT} AS l_partkey
          FROM read_parquet('{SF}/lineitem.parquet') l
          CROSS JOIN (SELECT unnest(generate_series(0, {FACTOR - 1})) AS c) t
        ) TO '{GRAPH_OUT}/lineitem.parquet' (FORMAT parquet)"""
    )
    _symlink_rest(GRAPH_OUT)


def build_docs_clone() -> None:
    import duckdb

    if os.path.exists(f"{DOCS_OUT}/documents.parquet"):
        return
    os.makedirs(DOCS_OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"""COPY (
          SELECT d.doc_id + t.c * {DOC_SHIFT} AS doc_id,
                 d.* EXCLUDE (doc_id)
          FROM read_parquet('{SF}/documents.parquet') d
          CROSS JOIN (SELECT unnest(generate_series(0, {FACTOR - 1})) AS c) t
        ) TO '{DOCS_OUT}/documents.parquet' (FORMAT parquet)"""
    )
    _symlink_rest(DOCS_OUT)


def _strip_limit(oracle: str) -> str:
    """Drop the trailing ORDER BY ... LIMIT k from an oracle (every
    graph/RAKE oracle ends with exactly one)."""
    i = oracle.rstrip().rfind("ORDER BY")
    assert i != -1, "_strip_limit: oracle has no ORDER BY clause to strip"
    tail = oracle[i:]
    # guard the textual assumption (ADVICE r14): the stripped tail must
    # be the final ORDER BY ... LIMIT clause (no nested SELECT), or the
    # probe would silently truncate mid-query after an oracle edit
    assert "LIMIT" in tail and "SELECT" not in tail.upper(), (
        f"_strip_limit tail looks wrong: {tail[:80]!r}"
    )
    return oracle[:i]


def _compare(spark_df, duck_res) -> str:
    """Dtype-strict compare via parity.compare_pandas (toPandas/.df
    + astype(str) — the r4 HUGEINT rule; ADVICE r14 fix)."""
    from glue_etl_pyspark_spark.parity import compare_pandas

    return compare_pandas(spark_df, duck_res)


def probe_kcore(spark, con) -> None:
    from glue_etl_pyspark_spark.queries.graph import KCORE_ORACLE, _KCORE_TOPK
    from glue_etl_pyspark_spark.registry import load_all

    fn = load_all()["graph_kcore_peel"].fn
    t0 = time.time()
    n1 = fn(spark, SF).count()
    anchor = time.time() - t0
    t0 = time.time()
    sp100 = fn(spark, GRAPH_OUT)
    sp100.persist()
    n100 = sp100.count()
    cold = time.time() - t0
    # expected 100x from the full 1x core table: replicate per clone,
    # n_core scales by FACTOR, k invariant, re-rank globally
    body = _strip_limit(KCORE_ORACLE)
    t0 = time.time()
    exp = con.execute(
        f"""WITH base AS ({body})
        SELECT node + c.c * {PART_SHIFT} AS node, core_deg,
               CAST(n_core * {FACTOR} AS BIGINT) AS n_core, k_threshold
        FROM base CROSS JOIN
          (SELECT unnest(generate_series(0, {FACTOR - 1})) AS c) c
        ORDER BY core_deg DESC, node LIMIT {_KCORE_TOPK}"""
    )
    verdict = _compare(sp100, exp)
    print(
        f"graph_kcore_peel: 1x {n1} rows/{anchor:.1f}s -> 100x {n100} rows/"
        f"{cold:.1f}s; derived-expected check @100x: {verdict} "
        f"({time.time() - t0:.1f}s oracle side)",
        flush=True,
    )
    sp100.unpersist()


def probe_lpa(spark, con) -> None:
    """LPA cannot use the replicate-the-1x-answer construction kcore
    and RAKE use: the KNN cap's tie-break hash mixes ABSOLUTE node
    ids, so an id-shifted clone selects a (deterministically)
    DIFFERENT capped graph — clones are not isomorphic copies and
    community sizes legitimately differ per clone (measured: max size
    1648 in clone 0 vs 3349 in clone 1). Deterministic for any given
    id space, so production semantics are fine; only the naive
    derived-expected probe is invalid.

    Instead, the VERDICT-r13-item-4 subset check: every community in
    Spark's 100x top-20 belongs to an identifiable clone
    (community DIV PART_SHIFT); for each such clone, run the FULL 1x
    oracle in DuckDB over that clone's shifted lineitem (1x-scale
    work — the 100x whole-graph oracle exhausts DuckDB temp) and
    require the Spark row to appear EXACTLY (community, n_members,
    min_node, max_node) in that clone's community table."""
    import duckdb

    from glue_etl_pyspark_spark.queries.graph import LPA_ORACLE
    from glue_etl_pyspark_spark.registry import load_all

    fn = load_all()["graph_label_propagation"].fn
    t0 = time.time()
    n1 = fn(spark, SF).count()
    anchor = time.time() - t0
    t0 = time.time()
    rows = fn(spark, GRAPH_OUT).collect()
    cold = time.time() - t0
    body = _strip_limit(LPA_ORACLE)
    t0 = time.time()
    clones = sorted({int(r.community) // PART_SHIFT for r in rows})
    expected: set[tuple] = set()
    for c in clones:
        cc = duckdb.connect()
        cc.execute(
            f"""CREATE VIEW lineitem AS
            SELECT l_orderkey + {c} * {ORDER_SHIFT} AS l_orderkey,
                   l_partkey + {c} * {PART_SHIFT} AS l_partkey
            FROM read_parquet('{SF}/lineitem.parquet')"""
        )
        for t in cc.execute(body).fetchall():
            expected.add(tuple(t))
        cc.close()
    missing = [
        r
        for r in rows
        if (r.community, r.n_members, r.min_node, r.max_node) not in expected
    ]
    verdict = (
        f"MATCH (all {len(rows)} top-k rows exact in their clones' full "
        f"1x-oracle community tables; {len(clones)} clones checked)"
        if not missing
        else f"FAIL: {len(missing)} rows absent, first {missing[:2]}"
    )
    print(
        f"graph_label_propagation: 1x {n1} rows/{anchor:.1f}s -> 100x "
        f"{len(rows)} rows/{cold:.1f}s; per-clone subset check @100x: "
        f"{verdict} ({time.time() - t0:.1f}s oracle side)",
        flush=True,
    )


def probe_rake(spark, con) -> None:
    from glue_etl_pyspark_spark.queries.llm_text import RAKE_ORACLE, _RAKE_TOPK
    from glue_etl_pyspark_spark.registry import load_all

    fn = load_all()["text_rake_keywords"].fn
    t0 = time.time()
    n1 = fn(spark, SF).count()
    anchor = time.time() - t0
    t0 = time.time()
    sp100 = fn(spark, DOCS_OUT)
    sp100.persist()
    n100 = sp100.count()
    cold = time.time() - t0
    body = _strip_limit(RAKE_ORACLE)
    t0 = time.time()
    exp = con.execute(
        f"""WITH base AS ({body})
        SELECT phrase, CAST(n_occ * {FACTOR} AS BIGINT) AS n_occ,
               CAST(deg_sum * {FACTOR} AS BIGINT) AS deg_sum,
               CAST(freq_sum * {FACTOR} AS BIGINT) AS freq_sum,
               score_ppm
        FROM base
        ORDER BY score_ppm DESC, phrase LIMIT {_RAKE_TOPK}"""
    )
    verdict = _compare(sp100, exp)
    print(
        f"text_rake_keywords: 1x {n1} rows/{anchor:.1f}s -> 100x {n100} "
        f"rows/{cold:.1f}s; derived-expected check @100x: {verdict} "
        f"({time.time() - t0:.1f}s oracle side)",
        flush=True,
    )
    sp100.unpersist()


def probe_cc(spark) -> None:
    """connected components shares LPA's non-isomorphic-clone property
    (the SPARSIFIER hash mixes absolute ids), but its per-clone oracle
    is so cheap (0.4 s at sf0.1) that the FULL expected 100x answer is
    affordable: run the un-LIMITed 1x oracle over every clone's
    shifted lineitem, take the global top-20 by (n_members DESC,
    component), and sum the per-clone component counts for the exact
    global n_components. Whole-answer external evidence at 100x."""
    import duckdb

    from glue_etl_pyspark_spark.parity import int_frame
    from glue_etl_pyspark_spark.queries.graph import CC_ORACLE, _CC_TOPK
    from glue_etl_pyspark_spark.registry import load_all

    fn = load_all()["graph_connected_components"].fn
    t0 = time.time()
    n1 = fn(spark, SF).count()
    anchor = time.time() - t0
    t0 = time.time()
    spark_pd = fn(spark, GRAPH_OUT).toPandas()
    cold = time.time() - t0
    body = _strip_limit(CC_ORACLE)
    t0 = time.time()
    all_comms: list[tuple] = []
    n_total = 0
    for c in range(FACTOR):
        cc = duckdb.connect()
        cc.execute(
            f"""CREATE VIEW lineitem AS
            SELECT l_orderkey + {c} * {ORDER_SHIFT} AS l_orderkey,
                   l_partkey + {c} * {PART_SHIFT} AS l_partkey
            FROM read_parquet('{SF}/lineitem.parquet')"""
        )
        clone_rows = int_frame(cc.execute(body).df(), f"cc clone {c}")
        cc.close()
        # columns: component, n_members, min_node, max_node, n_components
        # (per-clone count — replaced by the global total below)
        n_total += clone_rows[0][4] if clone_rows else 0
        all_comms.extend(r[:4] for r in clone_rows)
    all_comms.sort(key=lambda r: (-r[1], r[0]))
    expected = [r + (n_total,) for r in all_comms[:_CC_TOPK]]
    got = int_frame(
        spark_pd[["component", "n_members", "min_node", "max_node",
                  "n_components"]],
        "cc spark 100x",
    )
    verdict = (
        f"MATCH (exact whole answer incl global n_components={n_total})"
        if got == expected
        else f"FAIL: got {got[:2]} expected {expected[:2]}"
    )
    print(
        f"graph_connected_components: 1x {n1} rows/{anchor:.1f}s -> 100x "
        f"{len(got)} rows/{cold:.1f}s; full per-clone expected @100x: "
        f"{verdict} ({time.time() - t0:.1f}s oracle side)",
        flush=True,
    )


def probe_msf(spark) -> None:
    """Borůvka MSF gets the CC treatment (its sparsifier and selection
    keys hash/compare absolute ids, so clones are not isomorphic):
    per-clone un-LIMITed 1x oracles build the exact global 100x
    answer — forest top-20 by (w DESC, part_a, part_b) over the union,
    with n_forest_edges / total_forest_w / n_components_after summed
    across clones."""
    import duckdb

    from glue_etl_pyspark_spark.parity import int_frame
    from glue_etl_pyspark_spark.queries.graph import MSF_ORACLE, _MSF_TOPK
    from glue_etl_pyspark_spark.registry import load_all

    fn = load_all()["graph_boruvka_msf"].fn
    t0 = time.time()
    n1 = fn(spark, SF).count()
    anchor = time.time() - t0
    t0 = time.time()
    spark_pd = fn(spark, GRAPH_OUT).toPandas()
    cold = time.time() - t0
    body = _strip_limit(MSF_ORACLE)
    t0 = time.time()
    all_edges: list[tuple] = []
    tot_edges = tot_w = tot_comp = 0
    for c in range(FACTOR):
        cc = duckdb.connect()
        cc.execute(
            f"""CREATE VIEW lineitem AS
            SELECT l_orderkey + {c} * {ORDER_SHIFT} AS l_orderkey,
                   l_partkey + {c} * {PART_SHIFT} AS l_partkey
            FROM read_parquet('{SF}/lineitem.parquet')"""
        )
        clone_rows = int_frame(cc.execute(body).df(), f"msf clone {c}")
        cc.close()
        # columns: part_a, part_b, w, n_forest_edges, total_forest_w,
        # n_components_after (per-clone constants -> summed below)
        if clone_rows:
            tot_edges += clone_rows[0][3]
            tot_w += clone_rows[0][4]
            tot_comp += clone_rows[0][5]
        all_edges.extend(r[:3] for r in clone_rows)
    all_edges.sort(key=lambda r: (-r[2], r[0], r[1]))
    expected = [r + (tot_edges, tot_w, tot_comp) for r in all_edges[:_MSF_TOPK]]
    got = int_frame(
        spark_pd[["part_a", "part_b", "w", "n_forest_edges",
                  "total_forest_w", "n_components_after"]],
        "msf spark 100x",
    )
    verdict = (
        f"MATCH (exact whole answer; forest {tot_edges} edges, total_w "
        f"{tot_w}, components {tot_comp})"
        if got == expected
        else f"FAIL: got {got[:2]} expected {expected[:2]}"
    )
    print(
        f"graph_boruvka_msf: 1x {n1} rows/{anchor:.1f}s -> 100x "
        f"{len(got)} rows/{cold:.1f}s; full per-clone expected @100x: "
        f"{verdict} ({time.time() - t0:.1f}s oracle side)",
        flush=True,
    )


def main() -> None:
    from glue_etl_pyspark_spark.parity import duckdb_connect
    from glue_etl_pyspark_spark.session import get_spark

    which = set(sys.argv[1:]) or {"kcore", "lpa", "rake", "cc", "msf"}
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    if {"kcore", "lpa", "cc", "msf"} & which:
        build_graph_clone()
    if "rake" in which:
        build_docs_clone()
    con = duckdb_connect(SF)
    if "kcore" in which:
        probe_kcore(spark, con)
    if "lpa" in which:
        probe_lpa(spark, con)
    if "rake" in which:
        probe_rake(spark, con)
    if "cc" in which:
        probe_cc(spark)
    if "msf" in which:
        probe_msf(spark)


if __name__ == "__main__":
    main()
