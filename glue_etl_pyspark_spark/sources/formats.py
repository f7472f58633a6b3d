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

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

_SCRATCH_ROOT: str | None = None


def _scratch_root() -> str:
    """The per-process scratch root, removed at interpreter exit.

    atexit (not eager cleanup) because several callers return LAZY
    frames that read their staging dir only when the driver collects —
    the dir must outlive the DataFrame, and process exit is the first
    moment that is guaranteed. This bounds the former per-run /tmp
    leak (IVF index copies, .bin staging, statestore checkpoints) to
    one root per process, deleted on exit."""
    global _SCRATCH_ROOT
    if _SCRATCH_ROOT is None:
        _SCRATCH_ROOT = tempfile.mkdtemp(prefix="glue_etl_pyspark_spark_io_")
        atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)
    return _SCRATCH_ROOT


def scratch_dir(label: str) -> str:
    """A per-process scratch directory for sink round-trips."""
    return os.path.join(_scratch_root(), label)


def staging_dir(prefix: str) -> str:
    """A unique staging directory under the atexit-cleaned scratch
    root — for queries that persist an artifact (IVF index, binary
    fixture, streaming checkpoint) a lazy result frame later reads."""
    return tempfile.mkdtemp(prefix=prefix, dir=_scratch_root())


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


# Spark 4.1 ships the avro connector classes inside spark-sql itself,
# but keeps the short name "avro" gated behind the external-module
# ServiceLoader registration (absent without the spark-avro jar on the
# session classpath). The fully-qualified FileFormat class bypasses the
# short-name lookup and uses those bundled classes directly — verified
# end-to-end in this environment (snappy .avro part files, lossless
# round-trip). Keep trying the short name first: a deployment WITH the
# spark-avro package gets the DSv2 path and options like avroSchema.
_AVRO_FQCN = "org.apache.spark.sql.avro.AvroFileFormat"


def _avro_formats() -> tuple[str, ...]:
    return ("avro", _AVRO_FQCN)


def write_avro(df: DataFrame, path: str) -> str:
    """Avro sink: short name when the spark-avro module is deployed,
    falling back to the bundled AvroFileFormat class (see note)."""
    last: Exception | None = None
    for fmt in _avro_formats():
        try:
            df.write.mode("overwrite").format(fmt).save(path)
            return path
        except Exception as ex:  # AnalysisException: failed to find source
            last = ex
    raise last


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan (same short-name-then-bundled-class fallback)."""
    last: Exception | None = None
    for fmt in _avro_formats():
        try:
            df = spark.read.format(fmt).load(path)
            df.schema  # force source resolution now, not at first action
            return df
        except Exception as ex:
            last = ex
    raise last


def jdbc_options(
    url: str,
    dbtable: str,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
    push_down_predicate: str | None = None,
    **extra: str,
) -> dict[str, str]:
    """Validated option map for Spark's JDBC source (Glue
    ``create_dynamic_frame.from_options(connection_type="jdbc")``).

    Kept as a pure builder so the partitioned-read contract is unit-
    testable without a live database (none exists in this
    environment — no RDBMS, no network): reading in parallel requires
    the FULL (partition_column, lower_bound, upper_bound,
    num_partitions) quartet, otherwise Spark silently does a
    single-connection scan — the #1 JDBC-at-scale footgun. A filter
    passed as ``push_down_predicate`` lands in the WHERE clause of
    every partition's query (it becomes a dbtable subquery), mirroring
    Glue's push_down_predicate."""
    opts: dict[str, str] = {"url": url, "fetchsize": str(fetchsize)}
    if push_down_predicate is not None:
        opts["dbtable"] = f"(SELECT * FROM {dbtable} WHERE {push_down_predicate}) spark_pushdown"
    else:
        opts["dbtable"] = dbtable
    for k, v in (("user", user), ("password", password), ("driver", driver)):
        if v is not None:
            opts[k] = v
    part = (partition_column, lower_bound, upper_bound, num_partitions)
    if any(p is not None for p in part):
        if any(p is None for p in part):
            raise ValueError(
                "partitioned JDBC reads need ALL of partition_column/"
                "lower_bound/upper_bound/num_partitions — a partial spec "
                "silently degrades to a single-connection scan"
            )
        opts["partitionColumn"] = str(partition_column)
        opts["lowerBound"] = str(lower_bound)
        opts["upperBound"] = str(upper_bound)
        opts["numPartitions"] = str(num_partitions)
    opts.update({k: str(v) for k, v in extra.items()})
    return opts


def read_jdbc(spark: SparkSession, url: str, dbtable: str, **kwargs) -> DataFrame:
    """JDBC scan: ``spark.read.format("jdbc")`` with the validated
    option map from ``jdbc_options``. Tested END-TO-END against
    embedded Derby (jars ship with Spark — see
    ``sink_jdbc_roundtrip``): partitioned 4-connection scan +
    pushdown predicate, no network required."""
    return spark.read.format("jdbc").options(**jdbc_options(url, dbtable, **kwargs)).load()


def write_jdbc(
    df: DataFrame, url: str, dbtable: str, mode: str = "append", **kwargs
) -> None:
    """JDBC sink (end-to-end tested like read_jdbc); ``mode``
    follows DataFrameWriter semantics (append/overwrite/...)."""
    df.write.format("jdbc").options(**jdbc_options(url, dbtable, **kwargs)).mode(mode).save()
