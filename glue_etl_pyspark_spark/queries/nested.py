"""Nested-data / restructuring queries (SURVEY.md §2.8) exercising
unbox, unnest_frame, relationalize, and explode."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators import relationalize, unbox, unnest_frame
from ..registry import query

UNBOX_ORACLE = """
SELECT event_id, event_type,
  CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
"""


@query("unbox_props", oracle=UNBOX_ORACLE, category="nested")
def unbox_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Glue Unbox: parse the JSON props string into a struct, then
    filter on the parsed field."""
    ev = load_table(spark, sf_dir, "events")
    parsed = unbox(ev, "props", fmt="json", schema="k INT")
    return parsed.select(
        "event_id", "event_type", F.col("props.k").alias("prop_k")
    ).filter(F.col("prop_k") > 50)


UNNEST_ORACLE = """
SELECT event_id, event_type AS meta_type, value AS meta_value, user_id
FROM events
"""


@query("unnest_struct", oracle=UNNEST_ORACLE, category="nested")
def unnest_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Glue UnnestFrame: a nested struct is flattened back to
    top-level columns (sep='_' for SQL-friendly names)."""
    ev = load_table(spark, sf_dir, "events")
    nested = ev.select(
        "event_id",
        F.struct(
            F.col("event_type").alias("type"), F.col("value")
        ).alias("meta"),
        "user_id",
    )
    flat = unnest_frame(nested, sep="_")
    return flat.withColumnRenamed("meta_type", "meta_type").select(
        "event_id", "meta_type", F.col("meta_value"), "user_id"
    )


RELATIONALIZE_ORACLE = """
SELECT doc_id,
  CAST(generate_subscripts(ws, 1) - 1 AS INTEGER) AS pos,
  unnest(ws) AS val
FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
"""


@query("relationalize_words", oracle=RELATIONALIZE_ORACLE, category="nested")
def relationalize_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Glue Relationalize: the array column becomes a child table
    keyed by the parent's natural key + element position (generated
    surrogate ids are refused by design — they're partition-dependent
    and break re-runs at scale)."""
    d = load_table(spark, sf_dir, "documents")
    nested = d.select("doc_id", F.split("text", " ").alias("ws"))
    tables = relationalize(nested, "docs", key_cols=["doc_id"])
    return tables["docs_ws"]


EXPLODE_ORACLE = """
SELECT doc_id, unnest(ws) AS word
FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
WHERE len(ws) > 0
"""


@query("explode_words", oracle=EXPLODE_ORACLE, category="nested")
def explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain explode: one row per array element."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select("doc_id", F.split("text", " ").alias("ws"))
    return words.filter(F.size("ws") > 0).select(
        "doc_id", F.explode("ws").alias("word")
    )
