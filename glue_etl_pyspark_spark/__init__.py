"""glue_etl_pyspark_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference repo
``asksmruti/glue-etl-pyspark`` (an AWS Glue ETL / PySpark job repo;
capability surface = the public ``awsglue`` transform library + the
Spark DataFrame API — see SURVEY.md §0 for why), extended with
LLM-training-data pipeline operators (dedup, similarity search,
multimodal columns, text analysis), every operator designed for
100 TB scale.

Layout
------
- ``session``    SparkSession builder with the configs this engine needs
- ``io``         table loaders (incl. the events TIMESTAMP(NANOS) fix)
- ``registry``   named-query registry backing the driver contract
- ``operators``  Glue-transform-shaped DataFrame ops (ApplyMapping, ResolveChoice, ...)
- ``functions``  scalar/array helpers (vector math, text analysis)
- ``queries``    named queries, each with a DuckDB oracle where SQL-expressible
- ``streaming``  Structured Streaming ops over the events table
- ``plans``      explain-plan inspection utilities (pushdown/broadcast assertions)
"""

__version__ = "0.1.0"
