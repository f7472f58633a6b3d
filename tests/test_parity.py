"""Mirror of the driver's t2 gate: every registered query with an
oracle must hash-match DuckDB at sf0.01; oracle-less queries must at
least run and return a DataFrame."""

from __future__ import annotations

import pytest

from glue_etl_pyspark_spark.parity import check_query
from glue_etl_pyspark_spark.registry import load_all


def _names():
    return sorted(load_all().keys())


@pytest.mark.parametrize("name", _names())
def test_query_parity(spark, sf_dir, oracle_con, name):
    result = check_query(spark, sf_dir, name, con=oracle_con)
    assert result.ok, f"{name}: {result.detail}"
