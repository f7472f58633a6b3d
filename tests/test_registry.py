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
    """Round-6 rotation (evidence round): every slot of the driver
    window (first 50) is spent on a query that has NEVER been
    externally checked through round 5 — with two documented
    exceptions: multimodal_features (the board's one stale-err: its r3
    row was a driver-hasher crash, its r4 row rows-only) and any
    ADVICE-r5-changed query (fresh code, fresh evidence). No slot is
    wasted on a merely-stale refresh while never-checked names spill."""
    import json
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1]
    ever_checked: set[str] = set()
    for r in range(1, 6):
        fname = f"CORRECTNESS_r{r:02d}.json"
        ever_checked |= set(json.loads((root / fname).read_text()))
    specs = load_all()
    names = list(specs)[:50]
    advice_changed = {
        "cluster_medoids", "dq_sampler_chi2", "events_rolling_correlation",
        "basket_association_rules", "knn_ivf_persisted", "scan_binary_files",
        "stream_state_inspect",
    }
    # the changed queries lead the window
    assert set(names[:7]) == advice_changed
    assert names[7] == "multimodal_features"
    wasted = [
        n for n in names
        if n in ever_checked and n not in advice_changed
        and n != "multimodal_features"
    ]
    assert not wasted, f"window wastes slots on already-checked {wasted}"
