"""Round-13 100x events-family probe: the events fact table is the
one corpus whose analytics family (rolling median, path trigrams,
linear attribution, DAU/WAU, CUSUM) had no 100x row beyond r8's
bitmap-distinct. Clone sf0.1 events 100x (~30M rows) with event_id
AND user_id shifted per clone — the user domain grows 100x, so
per-user windows stay real-width while the key space scales the way
a real deployment's would.

Checks: Spark-side completion + wall vs the 1x anchor for each query,
plus full DuckDB hash parity AT 100x for the two cheapest-oracle
members (rolling median's per-user windows and DAU/WAU's distinct
rollups — DuckDB handles 30M-row windows; the attribution oracle's
segment windows are heavier, parity for it stays at the 10x scan).

Usage: python scripts/probe_r13_events_100x.py
Derived data stays in /tmp; results land in SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
OUT = "/tmp/spark_graft_probe_events_100x"
FACTOR = 100
ID_SHIFT = 100_000_000
USER_SHIFT = 1_000_000
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

QUERIES = (
    "events_rolling_median",
    "events_path_trigrams",
    "events_attribution_linear",
    "events_dau_wau",
    "events_cusum_shift",
)
PARITY_AT_100X = ("events_rolling_median", "events_dau_wau")


def build_clone() -> None:
    import duckdb

    if os.path.exists(f"{OUT}/events.parquet"):
        return
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"""COPY (
          SELECT e.event_id + t.c * {ID_SHIFT} AS event_id,
                 e.ts,
                 e.user_id + t.c * {USER_SHIFT} AS user_id,
                 e.event_type, e.value, e.props
          FROM read_parquet('{SF}/events.parquet') e
          CROSS JOIN (SELECT unnest(generate_series(0, {FACTOR - 1})) AS c) t
        ) TO '{OUT}/events.parquet' (FORMAT parquet)"""
    )
    for t in TABLES:
        dst = f"{OUT}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SF}/{t}.parquet", dst)


def main() -> None:
    from glue_etl_pyspark_spark.parity import check_query
    from glue_etl_pyspark_spark.registry import load_all
    from glue_etl_pyspark_spark.session import get_spark

    spark = get_spark()
    build_clone()
    reg = load_all()
    for name in QUERIES:
        t0 = time.time()
        anchor_rows = reg[name].fn(spark, SF).count()
        anchor_s = time.time() - t0
        t0 = time.time()
        rows = reg[name].fn(spark, OUT).count()
        cold = time.time() - t0
        spark.catalog.clearCache()
        line = (
            f"{name}: 1x {anchor_rows} rows/{anchor_s:.1f}s -> "
            f"100x {rows} rows/{cold:.1f}s"
        )
        if name in PARITY_AT_100X:
            t0 = time.time()
            res = check_query(spark, OUT, name)
            line += (
                f", parity@100x {'MATCH' if res.ok else 'FAIL: ' + str(res.detail)}"
                f" ({time.time() - t0:.1f}s incl oracle)"
            )
        print(line, flush=True)


if __name__ == "__main__":
    main()
