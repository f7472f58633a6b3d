"""Projection / column operators (SURVEY.md §2.2).

Glue equivalents: ApplyMapping, SelectFields, DropFields, RenameField,
ResolveChoice, DropNullFields, FillMissingValues. Unlike the Glue
originals (record-at-a-time DynamicFrame transforms that bypass the
optimizer), these compile to plain Catalyst projections, so column
pruning and predicate pushdown see straight through them.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Mapping4 = tuple[str, str, str, str]  # (src, src_type, dst, dst_type)


def apply_mapping(df: DataFrame, mappings: Sequence[Mapping4]) -> DataFrame:
    """Select + rename + cast in one projection (Glue ``ApplyMapping``).

    ``mappings`` rows are ``(src_col, src_type, dst_col, dst_type)``;
    ``src_type`` is advisory (Glue uses it to disambiguate choice
    types — here the input schema is authoritative).
    """
    cols = [F.col(src).cast(dst_type).alias(dst) for src, _src_t, dst, dst_type in mappings]
    return df.select(*cols)


def select_fields(df: DataFrame, paths: Sequence[str]) -> DataFrame:
    """Keep only the listed columns (Glue ``SelectFields``)."""
    return df.select(*paths)


def drop_fields(df: DataFrame, paths: Sequence[str]) -> DataFrame:
    """Remove the listed columns (Glue ``DropFields``)."""
    return df.drop(*paths)


def rename_field(df: DataFrame, old: str, new: str) -> DataFrame:
    """Rename one column (Glue ``RenameField``)."""
    return df.withColumnRenamed(old, new)


def resolve_choice(
    df: DataFrame, specs: Sequence[tuple[str, str]]
) -> DataFrame:
    """Collapse mixed-type (choice) columns (Glue ``ResolveChoice``).

    Spark has no union type, so a "choice" column arrives as string.
    Actions:

    - ``("col", "cast:TYPE")``  — ``try_cast`` to TYPE; unparseable
      values become NULL (Glue's ``cast`` semantics).
    - ``("col", "project:TYPE")`` — same cast, but keeps only rows
      where the cast succeeds or the value was already NULL.
    - ``("col", "make_cols:TYPE")`` — split into ``col_TYPE`` (the
      try_cast) and ``col_string`` (values that did not cast),
      mirroring Glue's per-type column split.
    - ``("col", "make_struct:TYPE")`` — keep one column holding a
      struct<TYPE, string> with exactly one branch non-null (Glue's
      union-as-struct representation).
    """
    out = df
    for col, action in specs:
        if action.startswith("cast:"):
            t = action.split(":", 1)[1]
            out = out.withColumn(col, F.expr(f"try_cast({col} AS {t})"))
        elif action.startswith("project:"):
            t = action.split(":", 1)[1]
            casted = F.expr(f"try_cast({col} AS {t})")
            # filter BEFORE the overwrite — afterwards a failed cast is
            # indistinguishable from an originally-NULL value
            out = out.filter(casted.isNotNull() | F.col(col).isNull())
            out = out.withColumn(col, casted)
        elif action.startswith("make_cols:"):
            t = action.split(":", 1)[1]
            casted = F.expr(f"try_cast({col} AS {t})")
            out = (
                out.withColumn(f"{col}_{t}", casted)
                .withColumn(
                    f"{col}_string",
                    F.when(casted.isNull(), F.col(col).cast("string")),
                )
                .drop(col)
            )
        elif action.startswith("make_struct:"):
            t = action.split(":", 1)[1]
            casted = F.expr(f"try_cast({col} AS {t})")
            out = out.withColumn(
                col,
                F.struct(
                    casted.alias(t),
                    F.when(casted.isNull(), F.col(col).cast("string")).alias("string"),
                ),
            )
        else:
            raise ValueError(f"unknown resolve_choice action {action!r}")
    return out


def drop_null_fields(df: DataFrame) -> DataFrame:
    """Drop columns that are entirely NULL (Glue ``DropNullFields``).

    Needs one aggregate pass to learn which columns are all-null —
    a single map-side-combinable job emitting one row, so it is safe
    at any scale (no per-row driver traffic).
    """
    counts = df.agg(
        *[F.count(F.col(c)).alias(c) for c in df.columns]
    ).collect()[0]
    keep = [c for c in df.columns if counts[c] > 0]
    return df.select(*keep)


def fill_missing(
    df: DataFrame, values: Mapping[str, object] | object, subset: Iterable[str] | None = None
) -> DataFrame:
    """Replace NULLs with defaults (Glue ``FillMissingValues``)."""
    if isinstance(values, Mapping):
        return df.na.fill(dict(values))
    return df.na.fill(values, subset=list(subset) if subset else None)
