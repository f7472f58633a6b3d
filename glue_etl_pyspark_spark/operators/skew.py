"""Skew mitigation utilities (SURVEY.md §4.3).

AQE's skew-join splitting handles most cases at runtime; these
helpers are for the pathological keys AQE can't fix (a single key
exceeding one executor's memory in an aggregation, or a dimension
join where one key is >50% of the fact table).

Salting is deterministic here — the salt comes from hashing stable
row content, never rand(): re-runs and oracle comparisons stay
reproducible.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_cols: Sequence[str],
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``left`` is skewed on ``on``: left rows get a
    deterministic salt in [0, buckets) from hashing ``salt_cols``
    (stable non-key columns), and ``right`` is exploded ``buckets``
    times so every (key, salt) partner exists. The hot key's rows
    spread over ``buckets`` shuffle partitions instead of one.

    Cost: right side replicated x buckets — use only when right is
    small-ish (a dimension) and the skew is real. Join semantics are
    preserved for inner/left joins keyed on ``on``.
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in salt_cols]), F.lit(buckets))
    l_salted = left.withColumn("__salt", salt)
    r_salted = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return l_salted.join(r_salted, on=[on, "__salt"], how=how).drop("__salt")


def salted_agg_count(
    df: DataFrame, key: str, salt_cols: Sequence[str], buckets: int = 16
) -> DataFrame:
    """Two-phase skew-safe count per key: partial count on
    (key, salt), final sum on key. The hot key's partial state is
    bounded by 1/buckets per task. (Spark's hash aggregate already
    map-side-combines; this helper is the explicit pattern for custom
    aggregates that don't, and documents the technique.)
    Emits (key, cnt)."""
    salt = F.pmod(F.hash(*[F.col(c) for c in salt_cols]), F.lit(buckets))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return partial.groupBy(key).agg(F.sum("__partial").alias("cnt"))
