"""Format sources/sinks (SURVEY.md §2.1).

Glue equivalents: ``create_dynamic_frame.from_options(format=...)`` /
``write_dynamic_frame``. Spark-first: ``spark.read.<fmt>`` with
explicit options; schema inference is available for CSV/JSON ingest
(Glue's crawler behavior) but engine tables always re-declare
explicit schemas after ingest.

Scale notes: every writer here partitions output by Spark task
(many files, no driver funnel); ``write_partitioned_parquet`` adds
hive-style directory partitioning so downstream filters on the
partition column prune whole directories (verified in
tests/test_plans.py).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

_SCRATCH_ROOT: str | None = None


def scratch_dir(label: str) -> str:
    """A per-process scratch directory for sink round-trips."""
    global _SCRATCH_ROOT
    if _SCRATCH_ROOT is None:
        _SCRATCH_ROOT = tempfile.mkdtemp(prefix="glue_etl_pyspark_spark_io_")
    d = os.path.join(_SCRATCH_ROOT, label)
    return d


def write_csv(df: DataFrame, path: str, header: bool = True, sep: str = ",") -> str:
    df.write.mode("overwrite").option("header", header).option("sep", sep).csv(path)
    return path


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = True,
    sep: str = ",",
    infer: bool = False,
) -> DataFrame:
    reader = spark.read.option("header", header).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def write_json(df: DataFrame, path: str) -> str:
    df.write.mode("overwrite").json(path)
    return path


def read_json(
    spark: SparkSession, path: str, schema: str | None = None, multiline: bool = False
) -> DataFrame:
    reader = spark.read.option("multiLine", multiline)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_orc(df: DataFrame, path: str) -> str:
    df.write.mode("overwrite").orc(path)
    return path


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str]
) -> str:
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    return path


def write_avro(df: DataFrame, path: str) -> str:
    """Avro sink. The spark-avro module is an external jar not present
    in this environment (no network to fetch it); the call surfaces
    Spark's own guidance if missing. Plumbing is format("avro") either
    way."""
    df.write.mode("overwrite").format("avro").save(path)
    return path


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan (see write_avro note on module availability)."""
    return spark.read.format("avro").load(path)
