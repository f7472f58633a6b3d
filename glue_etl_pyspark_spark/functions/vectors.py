"""Embedding/vector math as pure Spark SQL higher-order functions.

No UDFs: ``zip_with`` + ``aggregate`` compile to JVM-side expressions
inside whole-stage codegen, so similarity math runs at columnar speed
and needs no Python worker round-trip (SURVEY.md §8.3). Every lambda
casts float32 elements to DOUBLE before accumulating — float32
accumulation drifts from DuckDB/numpy at ~1e-8.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length array<float|double> columns."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda s, x: s + x,
    )


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm of an array column."""
    return F.sqrt(
        F.aggregate(
            _c(a), F.lit(0.0), lambda s, x: s + x.cast("double") * x.cast("double")
        )
    )


def l2_normalize(a: Column | str) -> Column:
    """Unit-scale an array column (NULL-safe: zero vectors stay zero).

    The norm must NOT be captured inside a per-element ``transform``
    lambda — captured expressions re-evaluate per element, turning the
    O(d) norm into O(d²) per vector. ``zip_with`` against an
    ``array_repeat`` of the norm evaluates both inputs once.
    """
    a = _c(a)
    n = l2_norm(a)
    return F.when(n == 0, a.cast("array<double>")).otherwise(
        F.zip_with(
            a, F.array_repeat(n, F.size(a)), lambda x, nn: x.cast("double") / nn
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na == 0) | (nb == 0), F.lit(None).cast("double")).otherwise(
        dot(a, b) / (na * nb)
    )
