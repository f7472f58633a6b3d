"""Named queries. Importing this package populates the registry.

Modules register queries via ``glue_etl_pyspark_spark.registry.query``;
each module covers one SURVEY.md §2 area.
"""

from . import (  # noqa: F401
    aggregates,
    analytics,
    curation,
    etl_patterns,
    extras,
    filters,
    governance,
    graph,
    io_q,
    joins_q,
    linalg,
    llm_dedup,
    llm_knn,
    llm_pack,
    llm_quality,
    llm_text,
    nested,
    profiling,
    projection,
    relational,
    retrieval,
    scalars,
    selection,
    sketches,
    setops,
    streamingq,
    suffixes,
    tpch_like,
    udfs,
    windows,
)
