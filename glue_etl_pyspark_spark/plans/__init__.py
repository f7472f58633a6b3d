"""Explain-plan inspection utilities (SURVEY.md §4.2).

The optimizer rewrites in §4.2 are all Catalyst built-ins — the
engineering obligation is *verifying they fire* for our query shapes.
These helpers turn `.explain("formatted")` output into assertions the
test suite can pin, so a regression that silently de-optimizes a plan
(lost pushdown, broadcast fallback to sort-merge, dead column read)
fails CI instead of costing 100x at scale.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """The PushedFilters lists of every file scan in the plan."""
    out = []
    for line in explain_str(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            out.append(line.removeprefix("PushedFilters:").strip())
    return out

def read_schemas(df: DataFrame) -> list[str]:
    """The ReadSchema of every file scan (column-pruning evidence)."""
    return [
        line.strip().removeprefix("ReadSchema:").strip()
        for line in explain_str(df).splitlines()
        if line.strip().startswith("ReadSchema:")
    ]


def operator_counts(df: DataFrame) -> dict[str, int]:
    """Count physical operators by name from the formatted plan's
    numbered tree (e.g. {'BroadcastHashJoin': 4, 'Scan parquet': 5})."""
    counts: dict[str, int] = {}
    for line in explain_str(df).splitlines():
        s = line.strip()
        if s.startswith(("(", "*(")) and ")" in s:
            name = s.split(")", 1)[1].strip().split("[")[0].strip()
            if name:
                counts[name] = counts.get(name, 0) + 1
    return counts


def assert_no_sort_merge_join(df: DataFrame) -> None:
    ops = operator_counts(df)
    smj = [k for k in ops if "SortMergeJoin" in k]
    assert not smj, f"expected broadcast-only joins, found {smj} in plan"


def assert_broadcast_joins(df: DataFrame, at_least: int = 1) -> None:
    ops = operator_counts(df)
    n = sum(v for k, v in ops.items() if "BroadcastHashJoin" in k)
    assert n >= at_least, f"expected >= {at_least} BroadcastHashJoin, got {n}: {ops}"


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    pf = pushed_filters(df)
    assert any(fragment in p for p in pf), (
        f"no pushed filter containing {fragment!r}; PushedFilters={pf}"
    )
