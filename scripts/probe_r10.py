"""Round-10 scale probe (VERDICT r9 item 7): the manifest source's
stats pass must be file-count-sized, not row-count-sized.

``write_manifest_table`` builds per-file (rows, min, max) stats with a
single distributed groupBy(input_file_name()) — the shuffle carries one
record per FILE, so the pass's cost beyond the raw column scan must be
flat in rows. Probe: same 16-file layout over orders at sf0.01 (check
scale) and sf0.1 (10x), timing the layout write and the stats pass
separately, then the pruned read. Linear-in-rows write + stats (it
scans the column once) with a FILE-COUNT-sized manifest and a pruned
read that touches only surviving files is a pass.

Usage: python scripts/probe_r10.py
Results land as SCALING.md rows.
"""

from __future__ import annotations

import datetime
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe_manifest(spark, sf_dir: str, tag: str) -> None:
    from pyspark.sql import functions as F

    from glue_etl_pyspark_spark.io import load_table
    from glue_etl_pyspark_spark.sources.manifest import (
        manifest_pruned_read,
        write_manifest_table,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    n_rows = orders.count()
    path = f"/tmp/spark_graft_probe_manifest_{tag}"

    t0 = time.time()
    data_dir = os.path.join(path, "data")
    (
        orders.repartitionByRange(16, F.col("o_orderdate"))
        .write.mode("overwrite")
        .parquet(data_dir)
    )
    t_write = time.time() - t0

    # stats pass alone (write_manifest_table repeats the write; time the
    # grouped stats separately by re-invoking on the written layout)
    t0 = time.time()
    m = write_manifest_table(orders, path, "o_orderdate", 16)
    t_full = time.time() - t0
    t_stats = t_full - t_write  # approximation: full = write + stats

    t0 = time.time()
    pruned = manifest_pruned_read(
        spark, path, datetime.date(1996, 1, 1), datetime.date(1996, 12, 31)
    )
    cnt = pruned.count()
    t_read = time.time() - t0
    print(
        f"manifest {tag}: rows={n_rows} files={len(m['files'])} "
        f"write={t_write:.2f}s full(write+stats)={t_full:.2f}s "
        f"stats~={t_stats:.2f}s pruned_files={len(pruned.inputFiles())} "
        f"pruned_rows={cnt} pruned_read={t_read:.2f}s",
        flush=True,
    )


def main() -> None:
    from glue_etl_pyspark_spark.session import get_spark

    spark = get_spark()
    probe_manifest(spark, "/root/testdata/sf0.01", "sf001")
    probe_manifest(spark, "/root/testdata/sf0.1", "sf01")


if __name__ == "__main__":
    main()
