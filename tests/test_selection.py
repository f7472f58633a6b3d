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
