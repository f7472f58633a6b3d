"""Registry-contract tests.

Two invariants the driver depends on:

1. Every oracled query projects only atomic output columns — the
   driver's order-insensitive value-hash pandas-sorts each column and
   dies on list/dict cells (round-1 ERRs: agg_collect_set,
   func_map_ops). Arrays/maps must be serialized (array_join/to_json)
   at the query boundary.

2. ``load_all()`` emits queries in DRIVER_PRIORITY order: the driver
   checks a bounded prefix (50 names in round 1) in dict-insertion
   order, so the prefix must contain the queries that still need an
   external correctness row, and oracle-less rows-only queries must
   come last.
"""

from __future__ import annotations

import pytest

from glue_etl_pyspark_spark.registry import DRIVER_PRIORITY, load_all

# Queries whose bodies are driven by sinks/streams and are exercised by
# dedicated tests; building them here would redundantly re-run writes.
# They have no array outputs by construction (checked in test_parity).
_SKIP_BUILD: set[str] = set()


def _oracled_names():
    return sorted(n for n, s in load_all().items() if s.oracle is not None)


@pytest.mark.parametrize("name", _oracled_names())
def test_oracled_outputs_are_atomic(spark, smoke_dir, name):
    spec = load_all()[name]
    df = spec.fn(spark, smoke_dir)
    bad = [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.dataType.typeName() in ("array", "map", "struct")
    ]
    assert not bad, (
        f"{name} projects non-atomic columns {bad}; the driver's pandas "
        "canonicalizer crashes on list/dict cells — serialize with "
        "array_join/to_json on BOTH engines"
    )


def test_registry_order_is_priority_prefix():
    names = list(load_all())
    present_prio = [n for n in DRIVER_PRIORITY if n in set(names)]
    assert names[: len(present_prio)] == present_prio

    # every oracle-less (rows-only) query sorts after every oracled one,
    # outside the explicit priority block
    tail = names[len(present_prio) :]
    specs = load_all()
    seen_rows_only = False
    for n in tail:
        if specs[n].oracle is None:
            seen_rows_only = True
        else:
            assert not seen_rows_only, f"oracled {n} after rows-only query"


def test_priority_window_targets_external_coverage_gaps():
    """Round-5 rotation: the driver window (first 50) leads with the
    only never-checked query (agg_histogram), then the two r4
    hash-FAILs whose packer was reworked, then every query whose
    values or oracle CHANGED in round 5 (they are green in old rounds
    but that evidence no longer describes the shipped code), then the
    six new round-5 queries, and fills the rest with the stalest
    (round-1-green) refresh block."""
    import json
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1]
    green: set[str] = set()
    for fname in (
        "CORRECTNESS_r01.json",
        "CORRECTNESS_r02.json",
        "CORRECTNESS_r03.json",
        "CORRECTNESS_r04.json",
    ):
        for n, row in json.loads((root / fname).read_text()).items():
            if isinstance(row, dict) and row.get("hash_match"):
                green.add(n)
    specs = load_all()
    names = list(specs)[:50]
    assert names[0] == "agg_histogram"
    # the r4 hash-FAIL pair must re-earn evidence immediately
    assert "doc_pack_sequences" in names[:3]
    assert "llm_training_manifest" in names[:3]
    # every oracled query with NO hash-green row through r4 sits inside
    # — unless the window is already saturated with never-green names,
    # in which case only the documented final-additions tail may spill
    never_green = [
        n for n in specs if specs[n].oracle is not None and n not in green
    ]
    missing = [n for n in never_green if n not in names]
    if missing:
        # a spill is legitimate ONLY when every window slot is spent on
        # a never-green name or a documented round-5 value-change (no
        # slot wasted on a merely-stale refresh)
        r5_changed_early = {
            "doc_pack_sequences", "llm_training_manifest",
            "corpus_mix_resample", "text_idf_quality",
            "graph_pagerank_topk", "q1_pricing_summary",
            "agg_rollup", "length_bucket_packing",
        }
        wasted = [
            n for n in names
            if n not in set(never_green) and n not in r5_changed_early
        ]
        assert not wasted, f"{missing} spilled while window wastes slots on {wasted}"
        assert len(missing) <= 59, f"spill grew past the documented tail: {missing}"
    # slots re-spent on already-green queries are ONLY the documented
    # round-5 changed set + the r1-stale refresh filler
    r5_changed = {
        "doc_pack_sequences", "llm_training_manifest", "corpus_mix_resample",
        "text_idf_quality", "graph_pagerank_topk", "q1_pricing_summary",
        "agg_rollup", "length_bucket_packing",
    }
    r1_only: set[str] = set()
    r1 = json.loads((root / "CORRECTNESS_r01.json").read_text())
    later: set[str] = set()
    for fname in (
        "CORRECTNESS_r02.json",
        "CORRECTNESS_r03.json",
        "CORRECTNESS_r04.json",
    ):
        for n, row in json.loads((root / fname).read_text()).items():
            if isinstance(row, dict) and row.get("hash_match"):
                later.add(n)
    for n, row in r1.items():
        if isinstance(row, dict) and row.get("hash_match") and n not in later:
            r1_only.add(n)
    unexplained = [
        n for n in names
        if n in green and n not in r5_changed and n not in r1_only
    ]
    assert not unexplained, f"window wastes slots on {unexplained}"
