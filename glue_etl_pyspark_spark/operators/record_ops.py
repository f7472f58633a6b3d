"""Glue ``Map.apply`` / ``Filter.apply`` compatibility (SURVEY.md
§2.8, §2.11): arbitrary per-record Python callbacks.

Glue runs these record-at-a-time over DynamicRecords (bypassing the
optimizer). Here they run over Arrow batches via ``mapInPandas`` —
the callback still sees one plain dict per record, but serialization
is batched and the Python worker is reused, so this is the least-bad
way to honor the contract. Native column expressions remain the
default; reach for these only when the logic genuinely needs Python.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def glue_map(df: DataFrame, fn: Callable[[dict], dict], schema: str) -> DataFrame:
    """Apply ``fn(record_dict) -> record_dict`` to every record
    (Glue ``Map.apply``). ``schema`` declares the output columns."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out = [fn(rec) for rec in pdf.to_dict("records")]
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=schema)


def glue_filter(df: DataFrame, predicate: Callable[[dict], bool]) -> DataFrame:
    """Keep records where ``predicate(record_dict)`` is truthy (Glue
    ``Filter.apply``). Schema is unchanged."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            mask = pd.Series([bool(predicate(rec)) for rec in pdf.to_dict("records")])
            yield pdf[mask.values]

    return df.mapInPandas(run, schema=df.schema)
