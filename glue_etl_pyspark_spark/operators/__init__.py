"""Glue-transform-shaped operators, re-expressed as pure DataFrame ops.

Each public function mirrors one transform from the reference's
capability surface (the ``awsglue`` library — SURVEY.md §2) but is
implemented Spark-first: declarative column expressions that Catalyst
can push down / prune through, never record-at-a-time callbacks.
"""

from .columns import (
    apply_mapping,
    drop_fields,
    drop_null_fields,
    fill_missing,
    rename_field,
    resolve_choice,
    select_fields,
)
from .joins import asof_join, glue_join, range_join
from .observe import observe_quality
from .restructure import relationalize, unbox, unnest_frame
from .splits import spigot, split_fields, split_rows

__all__ = [
    "apply_mapping",
    "select_fields",
    "drop_fields",
    "rename_field",
    "resolve_choice",
    "drop_null_fields",
    "fill_missing",
    "glue_join",
    "observe_quality",
    "asof_join",
    "range_join",
    "split_fields",
    "split_rows",
    "spigot",
    "relationalize",
    "unnest_frame",
    "unbox",
]
