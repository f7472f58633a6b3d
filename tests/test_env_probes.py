"""Environment-capability probes pinned as tests (VERDICT r8 item 8).

COVERAGE.md §2.18 records two capabilities as NOT SUPPORTABLE in this
sandbox, with emulations/alternates standing in:

- SQL ``MERGE INTO``: Spark 4.1 parses it, but the parquet
  ``spark_catalog`` lacks SupportsRowLevelOperations — needs a
  Delta/Iceberg-class v2 catalog (absent, no network). The oracled
  anti-join+union emulation ``cdc_upsert_merge`` is the engine's MERGE
  surface.
- ``to_avro``/``from_avro`` column codecs: the SQL functions gate on
  the spark-avro module registration, absent without the package; the
  avro FILE surface is covered via the bundled AvroFileFormat by FQCN
  (``sink_avro_roundtrip``).

These tests assert the EXACT error class, so they are loud canaries:
if an environment upgrade adds Delta/Iceberg or spark-avro, the
matching test FAILS and the capability should be implemented for real
(native MERGE query; to_avro/from_avro roundtrip) instead of the
emulation-only story.
"""

from __future__ import annotations

import pytest
from pyspark.errors.exceptions.captured import UnsupportedOperationException
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException


def test_merge_into_unsupported_on_parquet_catalog(spark, tmp_path):
    """MERGE INTO must fail with UNSUPPORTED_FEATURE.TABLE_OPERATION on
    a parquet v1 catalog table. If this starts PASSING the parse+plan,
    a row-level-operation catalog (Delta/Iceberg) appeared — implement
    native MERGE and retire the emulation-only note in COVERAGE §2.18."""
    spark.sql("DROP TABLE IF EXISTS merge_probe_target")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id int, v string"
    ).write.mode("overwrite").saveAsTable("merge_probe_target")
    try:
        with pytest.raises(UnsupportedOperationException) as exc:
            spark.sql(
                """
                MERGE INTO merge_probe_target t
                USING (SELECT 2 AS id, 'bb' AS v) s
                ON t.id = s.id
                WHEN MATCHED THEN UPDATE SET t.v = s.v
                WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)
                """
            ).collect()
        assert exc.value.getErrorClass() == "UNSUPPORTED_FEATURE.TABLE_OPERATION", (
            "MERGE INTO failed with a DIFFERENT error than the pinned "
            f"capability probe ({exc.value.getErrorClass()}); re-probe the "
            "environment and update COVERAGE.md §2.18"
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS merge_probe_target")


def test_avro_column_codecs_unloaded(spark):
    """to_avro must raise AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE while
    the spark-avro package is absent. If this FAILS because the call
    succeeded, the package appeared — implement a real
    to_avro/from_avro roundtrip query (the Kafka-payload codec surface)
    and drop this canary."""
    from pyspark.sql.avro.functions import to_avro

    df = spark.range(3).select(F.col("id").cast("long").alias("id"))
    with pytest.raises(AnalysisException) as exc:
        df.select(to_avro(F.struct("id")).alias("payload")).collect()
    assert "AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE" in str(exc.value), (
        "to_avro failed with a different error than the pinned probe: "
        f"{exc.value}"
    )
