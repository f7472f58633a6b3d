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
