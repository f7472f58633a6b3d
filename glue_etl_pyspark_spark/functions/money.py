"""Order-independent money aggregation.

A double SUM's result depends on summation order: partial-aggregate
tree shape, partition count, engine. At sf0.01 the drift hides under a
6-dp comparison; at sf0.1 a 1e9-magnitude revenue sum drifts ~2e-6
across engines and the same query becomes flaky — caught by the
full-registry parity sweep at sf0.1. At 100 TB the drift is worse and
also RUN-dependent (AQE re-plans change the tree shape).

``dsum`` accumulates in DECIMAL instead: each per-row double product
is cast once to a fixed-scale decimal (deterministic per-row, both
engines agree), and decimal addition is exact and associative — the
sum is bit-identical regardless of partitioning, plan shape, or
engine. The result is cast back to double so output schemas stay
engine-neutral. DuckDB oracle twin:
``CAST(SUM(CAST(expr AS DECIMAL(28,6))) AS DOUBLE)``.

DECIMAL(28,6) per-element keeps 22 integer digits (a narrower 18,6
would return NULL SILENTLY past 1e12 per value under non-ANSI
overflow); Spark widens the sum to DECIMAL(38,6). Width is free:
measured 0.057s vs 0.076s for 18,6 over 600k rows — the sum buffer is
non-compact either way. Same money-math stance as ``agg_decimal_exact``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DSUM_SQL = "CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE)"


def dsum(expr: Column, scale: str = "decimal(28,6)") -> Column:
    """Exact, order-independent sum of a money-valued double column."""
    return F.sum(expr.cast(scale)).cast("double")
