"""Smoke tests for the driver contract module itself."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) == 10


def test_contract_shapes(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 1
    # every oracle key must be a real query
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name
