"""Exogenous gates for the suffix-ranking machinery (round 15): the
prefix-doubling ranks and the repeated-substring top-k must match
driver-side Python (sorted tuples — code shared with neither the
Spark path nor the DuckDB closure oracle) on adversarial toy corpora
and at smoke scale, and be bit-stable across shuffle widths."""

from __future__ import annotations

import os as _os
import re

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st


def _hyp_n(default: int) -> int:
    return int(_os.environ.get("SPARK_GRAFT_HYP_EXAMPLES", "0") or 0) or default


def _py_toks(text: str) -> list[str]:
    return [w for w in re.split(r"\s+", text.lower()) if w]


def _py_ranks(texts: list[tuple[int, str]]) -> dict[tuple[int, int], int]:
    sufs = []
    for i, t in texts:
        tk = _py_toks(t)
        for p in range(len(tk)):
            sufs.append(((i, p), tuple(tk[p:])))
    order = sorted({s for _, s in sufs})
    rank = {s: i + 1 for i, s in enumerate(order)}
    return {k: rank[s] for k, s in sufs}


def _py_topk(texts: list[tuple[int, str]], k: int = 20):
    """Adjacent-pair LCPs + duplicate-group pairs, the query's exact
    contract, computed by direct sort."""
    sufs = []
    for i, t in texts:
        tk = _py_toks(t)
        for p in range(len(tk)):
            sufs.append((tuple(tk[p:]), i, p))
    groups: dict[tuple, list[tuple[int, int]]] = {}
    for s, d, p in sufs:
        groups.setdefault(s, []).append((d, p))
    order = sorted(groups)
    pairs = []
    for j, s in enumerate(order):
        mem = sorted(groups[s])
        if len(mem) >= 2:  # tie pair: two smallest members, full match
            pairs.append((len(s), *mem[0], *mem[1], s))
        if j + 1 < len(order):  # adjacent distinct pair
            t2 = order[j + 1]
            l = 0
            m = min(len(s), len(t2))
            while l < m and s[l] == t2[l]:
                l += 1
            pairs.append((l, *mem[0], *sorted(groups[t2])[0], t2 if l else s))
    rows = [
        (l, da, pa, db, pb, " ".join(sfx[: min(l, 8)]))
        for (l, da, pa, db, pb, sfx) in pairs
    ]
    rows.sort(key=lambda r: (-r[0], r[1], r[2], r[3], r[4]))
    return rows[:k]


_TOK = st.sampled_from(["a", "b", "ab", "ba", "x"])
_TEXT = st.lists(_TOK, min_size=1, max_size=10).map(" ".join)


@settings(max_examples=_hyp_n(10), deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@example(texts=["a a a a a a", "a a a"])          # all-ties: never unique
@example(texts=["a b a b a", "b a b a b"])        # maximal overlap
@example(texts=["x"])                             # single-token doc
@given(st.lists(_TEXT, min_size=1, max_size=5))
def test_suffix_ranks_random_corpora(spark, texts):
    from glue_etl_pyspark_spark.operators.ranks import suffix_ranks

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {(r.doc_id, r.pos): r.r for r in suffix_ranks(df).collect()}
    assert got == _py_ranks(docs)


def test_repeated_substrings_smoke_exogenous(spark, smoke_dir):
    """The registered query vs a direct Python suffix sort on the
    smoke corpus — an exogenous ground truth sharing no code with the
    DuckDB oracle (the CC union-find gate discipline). Compares the
    full (lcp, positions) tuples; samples are compared too since the
    Python side rebuilds them from the winning suffix."""
    from glue_etl_pyspark_spark.registry import load_all

    import duckdb

    texts = duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{smoke_dir}/documents.parquet')"
    ).fetchall()
    exp = _py_topk(texts)
    got = [
        (r.lcp, r.doc_a, r.pos_a, r.doc_b, r.pos_b, r.sample)
        for r in load_all()["text_repeated_substrings"]
        .fn(spark, smoke_dir)
        .collect()
    ]
    assert got == exp


def test_repeated_substrings_width_determinism(spark, sf_dir):
    """Bit-stability across shuffle widths 2/32/200 — the sharded
    dense rank's driver-literal offsets must make the ranks (and so
    the whole top-k) independent of partitioning."""
    from glue_etl_pyspark_spark.registry import load_all

    fn = load_all()["text_repeated_substrings"].fn
    runs = []
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for parts in ("2", "32", "200"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            runs.append([tuple(r) for r in fn(spark, sf_dir).collect()])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert all(r == runs[0] for r in runs[1:]), "varies with width"
