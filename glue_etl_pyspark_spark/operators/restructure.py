"""Nested-data restructuring operators (SURVEY.md §2.8) — the
reference's signature transforms: Relationalize, UnnestFrame, Unbox.

All pure projections/explodes: no shuffles are introduced by
flattening itself, so these compose freely before joins/aggs at any
scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType


def unnest_frame(df: DataFrame, sep: str = ".") -> DataFrame:
    """Flatten nested structs to top-level columns (Glue
    ``UnnestFrame``): ``a: struct<b,c>`` becomes ``a.b``, ``a.c``
    (``sep`` configurable — use ``"_"`` for SQL-friendly names).
    Arrays are left in place (see ``relationalize``)."""
    cols = []

    def walk(prefix_expr: str | None, prefix_name: str, schema: StructType) -> None:
        for f in schema.fields:
            expr = f"{prefix_expr}.{f.name}" if prefix_expr else f.name
            name = f"{prefix_name}{sep}{f.name}" if prefix_name else f.name
            if isinstance(f.dataType, StructType):
                walk(expr, name, f.dataType)
            else:
                cols.append(F.col(expr).alias(name))

    walk(None, "", df.schema)
    return df.select(*cols)


def relationalize(
    df: DataFrame,
    root_name: str,
    key_cols: Sequence[str],
    sep: str = "_",
) -> dict[str, DataFrame]:
    """Flatten a nested frame into a set of flat tables (Glue
    ``Relationalize``): structs are unnested in place; each array
    column becomes a child table ``{root}{sep}{col}`` with the parent
    key columns, the element position ``pos``, and the element value
    ``val`` (itself unnested if it is a struct).

    Glue links child tables with generated surrogate ids; we require
    *natural* ``key_cols`` instead — generated ids
    (``monotonically_increasing_id``) are partition-layout-dependent,
    which breaks determinism/oracle checks and re-runs at scale.
    """
    flat = unnest_frame(df, sep=sep)
    arrays = [f.name for f in flat.schema.fields if isinstance(f.dataType, ArrayType)]
    root = flat.drop(*arrays)
    out = {root_name: root}
    for arr in arrays:
        child = flat.select(*key_cols, F.posexplode(arr).alias("pos", "val"))
        elem_t = flat.schema[arr].dataType.elementType
        if isinstance(elem_t, StructType):
            child = unnest_frame(child, sep=sep)
        out[f"{root_name}{sep}{arr}"] = child
    return out


def unbox(df: DataFrame, col: str, fmt: str = "json", schema: str | None = None,
          options: dict[str, str] | None = None) -> DataFrame:
    """Parse a string column into a struct (Glue ``Unbox``): JSON via
    ``from_json``, delimited via ``from_csv``. The parsed struct
    replaces the string column under the same name."""
    if schema is None:
        raise ValueError("unbox requires an explicit schema (e.g. 'k INT')")
    if fmt == "json":
        parsed = F.from_json(F.col(col), schema, options or {})
    elif fmt == "csv":
        parsed = F.from_csv(F.col(col), F.lit(schema), options or {})
    else:
        raise ValueError(f"unbox format must be json|csv, got {fmt!r}")
    return df.withColumn(col, parsed)
