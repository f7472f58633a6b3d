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


# ---------------------------------------------------------------------------
# Round 16: LCP-interval ops (per-doc longest repeat + ExactSubstr cut)


def _py_rep_lengths(texts: list[tuple[int, str]]) -> dict[tuple[int, int], int]:
    """Brute-force ALL-PAIRS per-suffix repeat length — a genuinely
    different algorithm from both the Spark adjacency construction
    and the DuckDB sorted-suffix oracle (the CC third-algorithm
    discipline): max LCP of each suffix against every other suffix."""
    sufs = []
    for i, t in texts:
        tk = _py_toks(t)
        for p in range(len(tk)):
            sufs.append((i, p, tuple(tk[p:])))
    out = {}
    for i, p, s in sufs:
        best = 0
        for j, q, s2 in sufs:
            if (i, p) == (j, q):
                continue
            l = 0
            m = min(len(s), len(s2))
            while l < m and s[l] == s2[l]:
                l += 1
            best = max(best, l)
        out[(i, p)] = best
    return out


def _py_rep_lengths_sorted(
    texts: list[tuple[int, str]]
) -> dict[tuple[int, int], int]:
    """Per-suffix repeat length via Python suffix SORT + rank-adjacent
    LCPs (group members get slen) — O(n log n), used at smoke scale
    where all-pairs is infeasible. The hypothesis test cross-checks it
    against the brute-force version on every tiny corpus."""
    groups: dict[tuple, list[tuple[int, int]]] = {}
    for i, t in texts:
        tk = _py_toks(t)
        for p in range(len(tk)):
            groups.setdefault(tuple(tk[p:]), []).append((i, p))
    order = sorted(groups)
    nbr: dict[int, int] = {}
    for j in range(len(order) - 1):
        s, t2 = order[j], order[j + 1]
        l = 0
        m = min(len(s), len(t2))
        while l < m and s[l] == t2[l]:
            l += 1
        nbr[j] = max(nbr.get(j, 0), l)
        nbr[j + 1] = max(nbr.get(j + 1, 0), l)
    out = {}
    for j, s in enumerate(order):
        mem = groups[s]
        for k in mem:
            out[k] = len(s) if len(mem) >= 2 else nbr.get(j, 0)
    return out


def _py_longest(texts: list[tuple[int, str]], rl=None):
    rl = rl if rl is not None else _py_rep_lengths(texts)
    rows = []
    for i, t in sorted(texts):
        tk = _py_toks(t)
        if not tk:
            continue
        L, negp = max((rl[(i, p)], -p) for p in range(len(tk)))
        p = -negp
        rows.append((i, len(tk), L, p, " ".join(tk[p : p + min(L, 8)])))
    return rows


def _py_cut(texts: list[tuple[int, str]], k: int, rl=None):
    rl = rl if rl is not None else _py_rep_lengths(texts)
    rows = []
    for i, t in sorted(texts):
        tk = _py_toks(t)
        if not tk:
            continue
        covered = [False] * len(tk)
        for p in range(len(tk)):
            if rl[(i, p)] >= k:
                for q in range(p, p + rl[(i, p)]):
                    covered[q] = True
        kept = " ".join(tk[q] for q in range(len(tk)) if not covered[q])
        rows.append((i, len(tk), sum(covered), kept))
    return rows


@settings(max_examples=_hyp_n(10), deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@example(texts=["a a a a a a", "a a a"])       # duplicate-heavy: full-cover
@example(texts=["a b a b a", "b a b a b"])     # overlapping repeats
@example(texts=["x"])                          # singleton: rep_len 0
@example(texts=["a b x a b", "a b x a b"])     # exact dup docs: kept ''
@given(st.lists(_TEXT, min_size=1, max_size=5))
def test_lcp_interval_ops_random_corpora(spark, texts):
    """Both LCP-interval queries vs brute-force all-pairs Python on
    random corpora. k=2 (not the query's production _CUT_K=5) so the
    cut path actually fires on <=10-token docs."""
    from glue_etl_pyspark_spark.queries.suffixes import (
        exactsubstr_cut_frame,
        longest_repeat_frame,
    )

    docs = list(enumerate(texts))
    # the fast sorted-adjacency Python ref must agree with brute force
    assert _py_rep_lengths_sorted(docs) == _py_rep_lengths(docs)
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got_long = [
        (r.doc_id, r.n_tokens, r.rep_len, r.rep_pos, r.sample)
        for r in longest_repeat_frame(df).collect()
    ]
    assert got_long == _py_longest(docs)
    got_cut = [
        (r.doc_id, r.n_tokens, r.cut_tokens, r.kept_text)
        for r in exactsubstr_cut_frame(df, k=2).collect()
    ]
    assert got_cut == _py_cut(docs, k=2)


# ---------------------------------------------------------------------------
# Round 16: cross-doc repeat families


def _py_families(texts: list[tuple[int, str]], k: int) -> dict[int, int]:
    """doc_id -> min-doc family label via UNION-FIND over 'docs share a
    k-gram' — a third algorithm sharing no code with either the Spark
    cc_labels fixpoint or the DuckDB recursive-closure oracle (the CC
    gate discipline)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    gram_docs: dict[tuple, list[int]] = {}
    for i, t in texts:
        parent[i] = i
        tk = _py_toks(t)
        for p in range(len(tk) - k + 1):
            gram_docs.setdefault(tuple(tk[p : p + k]), []).append(i)
    for docs in gram_docs.values():
        for d in docs[1:]:
            union(docs[0], d)
    return {i: find(i) for i, _ in texts}


@settings(max_examples=_hyp_n(10), deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@example(texts=["a b c", "a b c", "c a b"])      # chained families
@example(texts=["x", "x", "a b"])                # 1-token docs: k=2 singletons
@example(texts=["a a a", "a a b", "b a a"])      # hub != smallest sometimes
@given(st.lists(_TEXT, min_size=1, max_size=6))
def test_repeat_families_random_corpora(spark, texts):
    """repeat_families_frame (k=2 so <=10-token docs actually connect)
    vs Python union-find on random corpora; also pins the span<=>gram
    equivalence by checking a k=3 run against 3-gram union-find."""
    from glue_etl_pyspark_spark.queries.suffixes import repeat_families_frame

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    for k in (2, 3):
        got = {
            r.doc_id: r.family
            for r in repeat_families_frame(df, k=k).collect()
        }
        assert got == _py_families(docs, k)


def test_repeat_families_smoke_exogenous(spark, smoke_dir):
    """The registered query (production _FAM_K) vs union-find on the
    smoke corpus, plus structural invariants: families partition the
    docs, every family label is its own min member, n_families is the
    partition size."""
    import duckdb

    from glue_etl_pyspark_spark.queries.suffixes import _FAM_K
    from glue_etl_pyspark_spark.registry import load_all

    texts = duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{smoke_dir}/documents.parquet')"
    ).fetchall()
    docs = [(int(i), t) for i, t in texts]
    lab = _py_families(docs, _FAM_K)
    fams: dict[int, list[int]] = {}
    for d, f in lab.items():
        fams.setdefault(f, []).append(d)
    exp = sorted(
        ((f, len(m), min(m), max(m), len(fams)) for f, m in fams.items()),
        key=lambda r: (-r[1], r[0]),
    )[:20]
    got = [
        (r.family, r.n_docs, r.min_doc, r.max_doc, r.n_families)
        for r in load_all()["text_repeat_families"].fn(spark, smoke_dir).collect()
    ]
    assert got == exp
    for f, n, mn, mx, _ in got:
        assert f == mn and mn <= mx and n >= 1


def test_repeat_families_width_determinism(spark, sf_dir):
    """Bit-stability across shuffle widths 2/32/200 — the persisted
    gram/edge frames plus the cc_labels fixpoint must make the family
    table independent of partitioning (the repeated-run stress the
    repo requires of every persist-using query)."""
    from glue_etl_pyspark_spark.registry import load_all

    fn = load_all()["text_repeat_families"].fn
    runs = []
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for parts in ("2", "32", "200"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            runs.append([tuple(r) for r in fn(spark, sf_dir).collect()])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert all(r == runs[0] for r in runs[1:]), "varies with width"


def test_exactsubstr_cut_smoke_exogenous(spark, smoke_dir):
    """The registered cut query (production _CUT_K) vs the brute-force
    Python reference on the smoke corpus, and the structural
    invariants: cut_tokens + len(kept) == n_tokens, kept_text is a
    subsequence of the doc tokens."""
    import duckdb

    from glue_etl_pyspark_spark.registry import load_all

    texts = duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{smoke_dir}/documents.parquet')"
    ).fetchall()
    docs = [(int(i), t) for i, t in texts]
    exp = _py_cut(docs, k=5, rl=_py_rep_lengths_sorted(docs))
    got = [
        (r.doc_id, r.n_tokens, r.cut_tokens, r.kept_text)
        for r in load_all()["text_exactsubstr_cut"].fn(spark, smoke_dir).collect()
    ]
    assert got == exp
    for _, n, cut, kept in got:
        assert cut + len([w for w in kept.split(" ") if w]) == n
