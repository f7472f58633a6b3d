"""Property tests for the degree-oriented triangle counter: the
adjacency-intersection plan must agree with brute-force enumeration
on adversarial shapes (cliques, stars, paths, random graphs) —
orientation bugs show up exactly here, not on the TPC-H fixture."""

from __future__ import annotations

from itertools import combinations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from glue_etl_pyspark_spark.queries.graph import triangle_node_counts


def _brute(edges: set[tuple[int, int]]) -> dict[int, int]:
    nodes = sorted({n for e in edges for n in e})
    out: dict[int, int] = {}
    for a, b, c in combinations(nodes, 3):
        if (a, b) in edges and (b, c) in edges and (a, c) in edges:
            for n in (a, b, c):
                out[n] = out.get(n, 0) + 1
    return out


def _check(spark, edges: set[tuple[int, int]]):
    df = spark.createDataFrame(sorted(edges), "u bigint, v bigint")
    got = {r.node: r.n_tri for r in triangle_node_counts(df).collect()}
    assert got == _brute(edges)


@pytest.mark.parametrize(
    "edges",
    [
        {(a, b) for a, b in combinations(range(5), 2)},      # K5 clique
        {(0, i) for i in range(1, 8)},                       # star: no triangles
        {(i, i + 1) for i in range(6)},                      # path: no triangles
        {(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4)},    # two triangles sharing a node
    ],
)
def test_triangles_known_shapes(spark, edges):
    _check(spark, edges)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.sets(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).map(
            lambda t: (min(t), max(t))
        ).filter(lambda t: t[0] < t[1]),
        min_size=1,
        max_size=20,
    )
)
def test_triangles_random_graphs(spark, edges):
    _check(spark, edges)


def test_knn_graph_cap_and_width_determinism(spark, sf_dir):
    """The capped KNN co-purchase graph (shared input of
    graph_label_propagation and graph_jaccard_linkpred) must (a) cap
    every out-list at _KNN_CAP, (b) break weight ties by the hash mix,
    not by id (an id tie-break hands the smallest parts ~n_nodes
    indegree and re-creates the quadratic hub the cap exists to kill),
    and (c) give bit-identical query outputs across shuffle widths —
    both queries are window+join chains whose determinism rests on the
    unique (w DESC, mix, v) / (wsum DESC, label) orderings."""
    from glue_etl_pyspark_spark.queries.graph import (
        _KNN_CAP,
        _copurchase_knn,
        graph_jaccard_linkpred,
        graph_label_propagation,
    )
    from pyspark.sql import functions as F

    _, knn = _copurchase_knn(spark, sf_dir)
    deg = knn.groupBy("u").agg(F.count("*").alias("d"))
    assert deg.agg(F.max("d")).collect()[0][0] <= _KNN_CAP
    # id tie-break would concentrate indegree on the smallest part ids;
    # the hash mix keeps the max indegree within a small multiple of
    # the cap (measured 23 vs cap 8 at sf0.1; generous bound here)
    max_in = (
        knn.groupBy("v").agg(F.count("*").alias("d")).agg(F.max("d")).collect()
    )[0][0]
    assert max_in <= _KNN_CAP * 8, f"indegree hub {max_in} — tie-break broken?"

    runs_lpa, runs_lp = [], []
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for parts in ("2", "32", "200"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            runs_lpa.append(
                [tuple(r) for r in graph_label_propagation(spark, sf_dir).collect()]
            )
            runs_lp.append(
                [tuple(r) for r in graph_jaccard_linkpred(spark, sf_dir).collect()]
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert all(r == runs_lpa[0] for r in runs_lpa[1:]), "LPA varies with width"
    assert all(r == runs_lp[0] for r in runs_lp[1:]), "linkpred varies with width"


def test_r13_additions_width_determinism(spark, sf_dir):
    """Same bit-stability gate for the round's other additions: RAKE
    (window islands + HOF phrase assembly), HLL overlap (checkpointed
    register frame + unions), and weighted SSSP (checkpointed rounds)
    must return identical rows at shuffle widths 2/32/200."""
    from glue_etl_pyspark_spark.registry import load_all

    reg = load_all()
    names = (
        "text_rake_keywords", "sketch_hll_overlap",
        "graph_sssp_bounded", "graph_kcore_peel",
    )
    runs: dict[str, list] = {n: [] for n in names}
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for parts in ("2", "32", "200"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            for n in names:
                runs[n].append(
                    sorted(tuple(r) for r in reg[n].fn(spark, sf_dir).collect())
                )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    for n in names:
        assert all(r == runs[n][0] for r in runs[n][1:]), f"{n} varies with width"


def _cc_brute(edges: set[tuple[int, int]]) -> dict[int, int]:
    """True component min-label per node, driver-side BFS."""
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    label: dict[int, int] = {}
    for start in sorted(adj):
        if start in label:
            continue
        comp, todo = [], [start]
        seen = {start}
        while todo:
            n = todo.pop()
            comp.append(n)
            for nb in adj[n]:
                if nb not in seen:
                    seen.add(nb)
                    todo.append(nb)
        m = min(comp)
        for n in comp:
            label[n] = m
    return label


@pytest.mark.parametrize(
    "edges,rounds",
    [
        ({(i, i + 1) for i in range(7)}, 3),                 # 8-path: needs the jump
        ({(0, 1), (2, 3), (4, 5), (6, 7)}, 1),               # 4 disjoint pairs
        ({(a, b) for a, b in combinations(range(5), 2)}, 1), # K5
        ({(0, 1), (1, 2), (3, 4), (5, 6), (6, 7), (7, 8)}, 2),
    ],
)
def test_cc_known_shapes(spark, edges, rounds):
    """Hash-to-min + pointer jump reaches the true component min in
    few rounds: 1 round covers radius ~2-3, the jump doubles it — an
    8-node path converges in 3 rounds where pure min-propagation
    needs 7."""
    from glue_etl_pyspark_spark.queries.graph import cc_labels

    df = spark.createDataFrame(sorted(edges), "u bigint, v bigint")
    und = df.unionAll(df.selectExpr("v as u", "u as v"))
    got = {r.node: r.label for r in cc_labels(und, rounds).collect()}
    assert got == _cc_brute(edges)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.sets(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).map(
            lambda t: (min(t), max(t))
        ).filter(lambda t: t[0] < t[1]),
        min_size=1,
        max_size=20,
    )
)
def test_cc_random_graphs(spark, edges):
    """On ≤10-node graphs (diameter ≤ 9) 3 jump rounds always reach
    the true components."""
    from glue_etl_pyspark_spark.queries.graph import cc_labels

    df = spark.createDataFrame(sorted(edges), "u bigint, v bigint")
    und = df.unionAll(df.selectExpr("v as u", "u as v"))
    got = {r.node: r.label for r in cc_labels(und, 3).collect()}
    assert got == _cc_brute(edges)


def test_r14_additions_width_determinism(spark, sf_dir):
    """The r13 bit-stability gate extended to the r14 additions:
    graph_connected_components (checkpointed jump rounds + adaptive
    sparsifier threshold) and graph_boruvka_msf (per-component
    row_number selection + jump contraction) must return identical
    rows at shuffle widths 2/32/200."""
    from glue_etl_pyspark_spark.registry import load_all

    reg = load_all()
    # quantile_bisect_exact lives here with the other r14 iterative
    # checkpoint-loop additions — same gate, same round
    names = (
        "graph_connected_components",
        "graph_boruvka_msf",
        "quantile_bisect_exact",
    )
    runs: dict[str, list] = {n: [] for n in names}
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for parts in ("2", "32", "200"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            for n in names:
                runs[n].append(
                    sorted(tuple(r) for r in reg[n].fn(spark, sf_dir).collect())
                )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    for n in names:
        assert all(r == runs[n][0] for r in runs[n][1:]), f"{n} varies with width"


def _sim_boruvka(edges_w: dict[tuple[int, int], int], rounds: int):
    """Driver-side simulation of the IDENTICAL bounded algorithm:
    per-component min edge under the (w, least, greatest) total
    order, then full contraction (== the bounded pointer jumps on
    toy-sized supernode graphs, diameter <= 9 < the 3-round radius
    14)."""
    nodes = sorted({n for e in edges_w for n in e})
    label = {n: n for n in nodes}
    forest: set[tuple[int, int, int]] = set()
    for _ in range(rounds):
        best: dict[int, tuple] = {}
        for (u, v), w in edges_w.items():
            for a, b in ((u, v), (v, u)):
                cu, cv = label[a], label[b]
                if cu == cv:
                    continue
                key = (w, min(a, b), max(a, b))
                if cu not in best or key < best[cu][0]:
                    best[cu] = (key, (a, b, w))
        if not best:
            break
        sedges: set[tuple[int, int]] = set()
        for _cu, (_key, (a, b, w)) in best.items():
            forest.add((min(a, b), max(a, b), w))
            sedges.add((label[a], label[b]))
        adj: dict[int, set[int]] = {}
        for x, y in sedges:
            adj.setdefault(x, set()).add(y)
            adj.setdefault(y, set()).add(x)
        newl: dict[int, int] = {}
        for start in sorted(adj):
            if start in newl:
                continue
            comp, seen, todo = [start], {start}, [start]
            while todo:
                n = todo.pop()
                for nb in adj[n]:
                    if nb not in seen:
                        seen.add(nb)
                        todo.append(nb)
                        comp.append(nb)
            m = min(comp)
            for n in comp:
                newl[n] = m
        label = {n: newl.get(label[n], label[n]) for n in nodes}
    return label, forest


def _kruskal_mst(edges_w: dict[tuple[int, int], int]) -> set:
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    mst = set()
    for (u, v), w in sorted(edges_w.items(), key=lambda kv: (kv[1], kv[0])):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            mst.add((u, v, w))
    return mst


def _check_boruvka(spark, edges_w: dict[tuple[int, int], int], rounds: int = 2):
    from glue_etl_pyspark_spark.queries.graph import boruvka_forest

    rows = [(u, v, w) for (u, v), w in sorted(edges_w.items())]
    df = spark.createDataFrame(rows, "u bigint, v bigint, w bigint")
    und = df.unionAll(df.selectExpr("v as u", "u as v", "w"))
    labels, forest = boruvka_forest(und, rounds, 3)
    got_labels = {r.node: r.label for r in labels.collect()}
    got_forest = {(r.part_a, r.part_b, r.w) for r in forest.collect()}
    exp_labels, exp_forest = _sim_boruvka(edges_w, rounds)
    assert got_forest == exp_forest
    assert got_labels == exp_labels
    # cycle-freedom + the cut property: with DISTINCT weights every
    # Borůvka-selected edge belongs to the unique MST
    if len(set(edges_w.values())) == len(edges_w):
        assert got_forest <= _kruskal_mst(edges_w)


@pytest.mark.parametrize(
    "edges_w",
    [
        {(i, i + 1): 10 + i for i in range(7)},               # weighted path
        {(0, 1): 5, (2, 3): 1, (4, 5): 9, (6, 7): 2},          # disjoint pairs
        {e: 1 for e in combinations(range(5), 2)},             # K5, all ties
        {(0, 1): 3, (1, 2): 1, (0, 2): 2,                      # two triangles
         (2, 3): 7, (3, 4): 4, (2, 4): 6},
        {(0, i): i for i in range(1, 8)},                      # star
    ],
)
def test_boruvka_known_shapes(spark, edges_w):
    _check_boruvka(spark, edges_w)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.dictionaries(
        st.tuples(st.integers(0, 7), st.integers(0, 7)).map(
            lambda t: (min(t), max(t))
        ).filter(lambda t: t[0] < t[1]),
        st.integers(1, 9),
        min_size=1,
        max_size=14,
    )
)
def test_boruvka_random_graphs(spark, edges_w):
    _check_boruvka(spark, edges_w)
