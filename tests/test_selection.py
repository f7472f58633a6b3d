"""Gates for the late-round-5 selection/audit queries.

The BPE merge applier leans on `replace` having IDENTICAL
leftmost-non-overlapping semantics in Spark and DuckDB — pinned here
on the adversarial overlap cases so an engine upgrade that changes
scan/resume behavior fails loudly instead of as a driver hash flake.
"""

from __future__ import annotations

import duckdb
import pytest

from glue_etl_pyspark_spark.queries.selection import (
    _BPE_ROUNDS,
    contamination_minhash,
    vocab_bpe_merges,
)

# (state, pattern, replacement) — double-pass application, as shipped
_OVERLAP_CASES = [
    ("|a|a|a|", "|a|a|", "|aa|"),
    ("|a|a|a|a|", "|a|a|", "|aa|"),
    ("|a|b|a|b|", "|a|b|", "|ab|"),
    ("|a|b|a|b|a|b|", "|a|b|", "|ab|"),
    ("|x|a|b|b|a|b|", "|a|b|", "|ab|"),
]


@pytest.mark.parametrize("state,pat,rep", _OVERLAP_CASES)
def test_replace_overlap_semantics_pinned(spark, state, pat, rep):
    expr = f"replace(replace('{state}', '{pat}', '{rep}'), '{pat}', '{rep}')"
    got_spark = spark.sql(f"SELECT {expr} AS r").collect()[0]["r"]
    got_duck = duckdb.sql(f"SELECT {expr} AS r").fetchone()[0]
    assert got_spark == got_duck, (state, got_spark, got_duck)


def test_bpe_merges_well_formed(spark, smoke_dir):
    rows = vocab_bpe_merges(spark, smoke_dir).collect()
    assert rows
    for r in rows:
        # piece strings stay '|'-delimited with no empty pieces
        assert r["pieces"].startswith("|") and r["pieces"].endswith("|")
        assert "||" not in r["pieces"]
        # re-joining the pieces reconstructs the word exactly
        assert "".join(p for p in r["pieces"].split("|") if p) == r["word"]
        for i in range(1, _BPE_ROUNDS + 1):
            assert "+" in r[f"merge{i}"]


def test_contamination_minhash_catches_planted_leaks(spark, smoke_dir):
    from glue_etl_pyspark_spark.io import load_table
    from glue_etl_pyspark_spark.queries.selection import (
        _CONTAM_EVAL_BASE,
        _CONTAM_EVAL_MOD,
    )

    flagged = contamination_minhash(spark, smoke_dir)
    hits = {
        (r["train_id"], r["eval_id"]) for r in flagged.collect()
    }
    planted = {
        r["doc_id"]
        for r in load_table(spark, smoke_dir, "documents")
        .filter(f"doc_id % {_CONTAM_EVAL_MOD} = 0")
        .select("doc_id")
        .collect()
    }
    # every perturbed eval twin must collide with its origin
    missed = {
        d for d in planted if (d, d + _CONTAM_EVAL_BASE) not in hits
    }
    assert not missed, f"planted leaks not flagged: {sorted(missed)}"


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    pieces=st.lists(st.sampled_from(["a", "b", "c", "ab"]), min_size=1, max_size=10),
    pa=st.sampled_from(["a", "b", "c"]),
    pb=st.sampled_from(["a", "b", "c"]),
)
def test_bpe_replace_chain_matches_python_reference(spark, pieces, pa, pb):
    """Both engines' double-pass replace must equal Python's
    str.replace chain (identical leftmost-non-overlapping semantics)
    on arbitrary piece strings — the generalization of the pinned
    adversarial cases."""
    state = "|" + "|".join(pieces) + "|"
    pat, rep = f"|{pa}|{pb}|", f"|{pa}{pb}|"
    want = state.replace(pat, rep).replace(pat, rep)
    expr = (
        f"replace(replace('{state}', '{pat}', '{rep}'), '{pat}', '{rep}')"
    )
    got_spark = spark.sql(f"SELECT {expr} AS r").collect()[0]["r"]
    got_duck = duckdb.sql(f"SELECT {expr} AS r").fetchone()[0]
    assert got_spark == want and got_duck == want, (state, pat, got_spark, got_duck, want)


def test_entropy_gate_matches_python_reference(spark, smoke_dir):
    """Third-engine check: recompute the floored-bigint entropy in
    pure Python (pandas + math.log) and require exact equality with
    the Spark result — independent of the DuckDB oracle, so a shared
    SQL-dialect misunderstanding can't hide."""
    import math

    import pandas as pd

    from glue_etl_pyspark_spark.queries.selection import text_entropy_gate

    got = {
        r.doc_id: r
        for r in text_entropy_gate(spark, smoke_dir).collect()
    }
    docs = pd.read_parquet(f"{smoke_dir}/documents.parquet")
    checked = 0
    for _, row in docs.iterrows():
        toks = [t for t in row.text.lower().split() if t]
        if not toks:
            assert row.doc_id not in got
            continue
        counts: dict[str, int] = {}
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
        n = len(toks)
        s = sum(math.floor(c * math.log(c) * 1e9) for c in counts.values())
        num = max(math.floor(math.log(n) * 1e9) * n - s, 0)
        ent = (num // (n * 1000)) / 1e6
        r = got[row.doc_id]
        assert (r.n_tokens, r.n_uniq) == (n, len(counts))
        assert r.entropy == ent, (row.doc_id, r.entropy, ent)
        assert r.kept == int(ent >= 3.0)
        checked += 1
    assert checked > 0


def test_winsorize_and_mad_match_python_reference(spark, smoke_dir):
    """Third-engine check for the picked-rank statistics: recompute
    P01/P99 bounds and median/MAD in pure Python over the same
    parquet and require exact equality (no tolerance — every output
    is a picked input value or one exact subtraction)."""
    import pandas as pd

    from glue_etl_pyspark_spark.queries.analytics import (
        dq_outliers_mad,
        events_winsorize_bounds,
    )

    ev = pd.read_parquet(f"{smoke_dir}/events.parquet")
    wz = {r.event_type: r for r in events_winsorize_bounds(spark, smoke_dir).collect()}
    mad = {r.event_type: r for r in dq_outliers_mad(spark, smoke_dir).collect()}
    for etype, g in ev.groupby("event_type"):
        vals = sorted(zip(g.value, g.event_id))
        n = len(vals)
        lo_r, hi_r = max(1, n // 100), n - max(1, n // 100) + 1
        r = wz[etype]
        assert (r.n, r.p01, r.p99) == (n, vals[lo_r - 1][0], vals[hi_r - 1][0])
        assert r.n_below == lo_r - 1 and r.n_above == n - hi_r
        med = vals[(n + 1) // 2 - 1][0]
        devs = sorted((abs(v - med), eid) for v, eid in vals)
        m = devs[(n + 1) // 2 - 1][0]
        rm = mad[etype]
        assert (rm.med, rm.mad) == (med, m)
        assert rm.n_outliers == sum(1 for d, _ in devs if d > 3 * m)


def test_bigram_pmi_matches_python_reference(spark, smoke_dir):
    """Third-engine check: recompute the top-25 PMI collocations in
    pure Python with the identical fixed-order ln sum and floor."""
    import math

    import pandas as pd

    from glue_etl_pyspark_spark.queries.selection import text_bigram_pmi

    docs = pd.read_parquet(f"{smoke_dir}/documents.parquet")
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    n_tok = n_bi = 0
    for text in docs.text:
        toks = [t for t in text.lower().split() if t]
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        n_tok += len(toks)
        for x, y in zip(toks, toks[1:]):
            bi[(x, y)] = bi.get((x, y), 0) + 1
            n_bi += 1
    top = sorted(bi.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    want = {}
    for (x, y), c in top:
        raw = (math.log(c) + math.log(n_tok) + math.log(n_tok)
               - math.log(n_bi) - math.log(uni[x]) - math.log(uni[y]))
        want[(x, y)] = (c, math.floor(raw * 1e6) / 1e6)
    got = {
        (r.tok_a, r.tok_b): (r.c_ab, r.pmi)
        for r in text_bigram_pmi(spark, smoke_dir).collect()
    }
    assert got == want


def test_bigram_lm_matches_python_reference(spark, smoke_dir):
    """Third-engine check: recompute the add-one bigram-LM nll in pure
    Python and require exact equality with the Spark result (same
    1e-9-grid per-term floor, exact integer mean)."""
    import math
    from collections import Counter

    import pandas as pd

    from glue_etl_pyspark_spark.queries.selection import text_bigram_lm_score

    got = {r.doc_id: r for r in text_bigram_lm_score(spark, smoke_dir).collect()}
    docs = pd.read_parquet(f"{smoke_dir}/documents.parquet")
    uni: Counter = Counter()
    cbig: Counter = Counter()
    doc_bigrams: dict[int, list[tuple[str, str]]] = {}
    for _, row in docs.iterrows():
        toks = [t for t in row.text.lower().split() if t]
        uni.update(toks)
        bgs = list(zip(toks, toks[1:]))
        cbig.update(bgs)
        if bgs:
            doc_bigrams[row.doc_id] = bgs
    v = len(uni)
    checked = 0
    for doc_id, bgs in doc_bigrams.items():
        s = sum(
            math.floor(
                (math.log(uni[w1] + v) - math.log(cbig[(w1, w2)] + 1)) * 1e9
            )
            for w1, w2 in bgs
        )
        nll = (s // (len(bgs) * 1000)) / 1e6
        r = got[doc_id]
        assert r.n_bigrams == len(bgs)
        assert r.nll_per_bigram == nll, (doc_id, r.nll_per_bigram, nll)
        checked += 1
    assert checked > 0 and set(got) == set(doc_bigrams)
