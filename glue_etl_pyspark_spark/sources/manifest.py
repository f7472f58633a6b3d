"""Manifest-listed table layout with min/max file skipping — the
Iceberg/Delta planning pattern re-expressed on plain parquet
(SURVEY.md §2.1 analog; VERDICT r8 item 9's endorsed breadth).

An open-table format's scan planning is: read a FILE-COUNT-sized
manifest (per data file: path, row count, per-column min/max), prune
files whose stat range can't satisfy the predicate, and hand the
surviving file list to the scan. The data never moves through the
driver — only the manifest does, and manifests are bounded by file
count, not row count (Iceberg caps ~100k files per manifest-list for
the same reason).

At 100 TB this is the difference between "scan 25k files" and "scan
the 40 whose o_orderdate range overlaps the query window" — partition
pruning generalized to ANY clustered column without hive directory
layout. The layout writer range-partitions on the tracked column so
file stat ranges are tight and disjoint; an unclustered column would
still be correct (every file overlaps → zero pruning), just useless,
same as in Iceberg.

Correctness contract: pruning must be invisible — the pruned scan
equals full-scan + filter exactly (oracled via the driver's DuckDB
check on ``manifest_pruned_scan`` and pinned file-count-wise in
tests/test_operators.py).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_manifest.json"


def write_manifest_table(
    df: DataFrame,
    path: str,
    stat_col: str,
    n_files: int,
) -> dict:
    """Write ``df`` as ``n_files`` parquet files range-clustered on
    ``stat_col`` and build the manifest: one JSON record per data file
    with row count and the tracked column's min/max.

    Stats collection is ONE distributed pass grouped by
    ``input_file_name()`` (a file-count-sized aggregate, the same
    shuffle shape however many rows each file holds); only the
    manifest — bounded by ``n_files`` — is collected to the driver,
    per the repo's bounded-collect rule."""
    data_dir = os.path.join(path, "data")
    (
        df.repartitionByRange(n_files, F.col(stat_col))
        .write.mode("overwrite")
        .parquet(data_dir)
    )
    spark = df.sparkSession
    stats = (
        spark.read.parquet(data_dir)
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.min(stat_col).alias("min_v"),
            F.max(stat_col).alias("max_v"),
        )
        .collect()
    )
    assert len(stats) <= max(n_files * 2, 64), (
        f"manifest stats pass returned {len(stats)} files for a "
        f"{n_files}-file layout — the per-file aggregate must stay "
        "file-count-sized"
    )
    manifest = {
        "stat_col": stat_col,
        "files": sorted(
            (
                {
                    "path": r["file"],
                    "rows": r["rows"],
                    "min": _json_safe(r["min_v"]),
                    "max": _json_safe(r["max_v"]),
                }
                for r in stats
            ),
            key=lambda e: (str(e["min"]), e["path"]),
        ),
    }
    with open(os.path.join(path, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1, default=str)
    return manifest


def _json_safe(v):
    """Dates/timestamps to ISO strings so the manifest is plain JSON;
    ISO order == value order for same-typed stats, so string compare
    in the pruner is exact for them as well as for str columns."""
    return v if isinstance(v, (int, float, str, type(None))) else v.isoformat()


def _bound_key(v, widen: str):
    """Render a pruning bound in the manifest's ISO format. A DATE
    hi-bound against TIMESTAMP file stats must cover the WHOLE day —
    comparing hi '1996-12-31' against a min of '1996-12-31T00:00:00'
    string-wise would prune a file whose midnight rows the row filter
    keeps — so the hi date bound widens to day-end before rendering.

    The lo bound must NOT widen: the 10-char ISO date is a strict
    string prefix of its own day-start datetime, so it compares LESS
    — against DATE-typed stats a widened lo ('1996-01-01T00:00:00')
    makes ``max < lo_k`` true for a file whose max equals the lo date
    and wrongly prunes rows the filter keeps. Unwidened lo is already
    exact for timestamp stats too: '...T00:00:00' > '1996-01-01'
    keeps the boundary file."""
    import datetime

    if (
        widen == "hi"
        and isinstance(v, datetime.date)
        and not isinstance(v, datetime.datetime)
    ):
        return datetime.datetime.combine(v, datetime.time.max).isoformat()
    return _json_safe(v)


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST_NAME)) as f:
        return json.load(f)


def manifest_pruned_read(
    spark: SparkSession,
    path: str,
    lo,
    hi,
) -> DataFrame:
    """Scan only the data files whose [min,max] overlaps [lo, hi] on
    the manifest's tracked column, then re-apply the row-level filter
    (file stats admit whole files; rows inside still need the
    predicate — exactly Iceberg's planning/execution split).

    Driver work is file-count-sized (read manifest, compare ranges);
    the row-level scan+filter stays fully distributed and the
    predicate still pushes down into the surviving files' parquet
    row groups."""
    m = read_manifest(path)
    lo_k, hi_k = _bound_key(lo, widen="lo"), _bound_key(hi, widen="hi")
    keep = [
        e["path"]
        for e in m["files"]
        if e["min"] is not None
        and not (e["max"] < lo_k or e["min"] > hi_k)
    ]
    col = m["stat_col"]
    if not keep:
        # preserve schema for the empty result
        return (
            spark.read.parquet(os.path.join(path, "data"))
            .filter(F.lit(False))
        )
    return spark.read.parquet(*keep).filter(F.col(col).between(lo, hi))
