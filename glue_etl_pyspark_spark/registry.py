"""Named-query registry backing the driver contract.

Every operator/query the engine claims is registered here with:
- a Spark callable ``(spark, sf_dir) -> DataFrame``
- an optional DuckDB oracle SQL string (ANSI SQL over the
  pre-registered views region/nation/.../embeddings). Queries without
  an oracle get the driver's weaker rows-only check — reserved for
  streaming/randomized/UDF-backed ops.

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over
this registry.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    category: str
    doc: str = field(default="")


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, category: str = "relational"):
    """Decorator registering a named query.

    >>> @query("q1_pricing_summary", oracle="SELECT ...", category="agg")
    ... def q1(spark, sf_dir): ...
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(name, fn, oracle, category, (fn.__doc__ or "").strip())
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import all query modules (side effect: registration) and return the registry."""
    from . import queries  # noqa: F401  (imports submodules in its __init__)

    return QUERIES
