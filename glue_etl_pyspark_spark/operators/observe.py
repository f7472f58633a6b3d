"""In-flight pipeline metrics via ``DataFrame.observe`` (SURVEY.md §2
data-quality adjunct: the Glue job-metrics surface, Spark-first).

``observe`` attaches named aggregate metrics to a plan node; they are
computed DURING the action that consumes the frame — at 100 TB this is
the difference between free counters and a second full scan per metric
(a ``.count()``-based quality check doubles the pipeline's IO).

Batch: read the metrics from the returned observation after the action.
Streaming: the same call surfaces metrics per micro-batch in
``StreamingQueryProgress.observedMetrics``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observe_quality(
    df: DataFrame, name: str, metrics: dict[str, Column]
) -> tuple[DataFrame, Observation]:
    """Attach named metric expressions (aggregates over the full frame)
    to ``df``. Returns (instrumented frame, observation); read
    ``observation.get`` AFTER an action has consumed the frame.

    >>> inst, obs = observe_quality(df, "after_filter", {
    ...     "rows": F.count(F.lit(1)),
    ...     "null_keys": F.count_if(F.col("k").isNull()),
    ... })
    >>> inst.write.parquet(path)   # metrics ride this action
    >>> obs.get["null_keys"]
    """
    observation = Observation(name)
    cols = [expr.alias(alias) for alias, expr in metrics.items()]
    return df.observe(observation, *cols), observation
