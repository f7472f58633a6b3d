"""Later-r16 100x probe for the four new API-surface queries
(cogrouped applyInPandas, grouped applyInArrow, df.stat.crosstab,
DataFrame.transpose).

Clone construction mirrors probe_r13_events_100x: events cloned 100x
with event_id AND user_id shifted per clone (user domain grows 100x,
per-user volume stays 1x — exactly how a real deployment's key space
scales, and why the per-user micro-unit sums in the two UDF queries
can never overflow: per-key volume is SF-constant). orders cloned
100x with o_orderkey shifted; status/priority/totalprice replicate
verbatim, so crosstab counts and transpose cents are exactly 100x the
base — but we do NOT rescale: parity at 100x runs the FULL DuckDB
oracle on the cloned parquet (these oracles are single GROUP BYs —
cheap even at 60M/15M rows), the strongest evidence class.

All four queries are value-deterministic (no id-hashing, no RNG), so
clone parity is a complete check — no per-clone reconstruction needed.

Usage: python scripts/probe_r16_surfaces_100x.py
Derived data stays in /tmp; results land in SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
OUT = "/tmp/spark_graft_probe_surfaces_100x"
FACTOR = 100
EVENT_SHIFT = 100_000_000
USER_SHIFT = 1_000_000
ORDER_SHIFT = 1_000_000_000
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

QUERIES = (
    "udf_cogrouped_stats",
    "udf_grouped_applyinarrow",
    "profile_crosstab",
    "relational_transpose",
)


def build_clone() -> None:
    import duckdb

    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    if not os.path.exists(f"{OUT}/events.parquet"):
        con.execute(
            f"""COPY (
              SELECT e.event_id + t.c * {EVENT_SHIFT} AS event_id,
                     e.ts,
                     e.user_id + t.c * {USER_SHIFT} AS user_id,
                     e.event_type, e.value, e.props
              FROM read_parquet('{SF}/events.parquet') e
              CROSS JOIN (SELECT unnest(generate_series(0, {FACTOR - 1})) AS c) t
            ) TO '{OUT}/events.parquet' (FORMAT parquet)"""
        )
    if not os.path.exists(f"{OUT}/orders.parquet"):
        con.execute(
            f"""COPY (
              SELECT o.o_orderkey + t.c * {ORDER_SHIFT} AS o_orderkey,
                     o.o_custkey, o.o_orderstatus, o.o_totalprice,
                     o.o_orderdate, o.o_orderpriority
              FROM read_parquet('{SF}/orders.parquet') o
              CROSS JOIN (SELECT unnest(generate_series(0, {FACTOR - 1})) AS c) t
            ) TO '{OUT}/orders.parquet' (FORMAT parquet)"""
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
        t0 = time.time()
        res = check_query(spark, OUT, name)
        print(
            f"{name}: 1x {anchor_rows} rows/{anchor_s:.1f}s -> "
            f"100x {rows} rows/{cold:.1f}s, parity@100x "
            f"{'MATCH' if res.ok else 'FAIL: ' + str(res.detail)}"
            f" ({time.time() - t0:.1f}s incl oracle)",
            flush=True,
        )


if __name__ == "__main__":
    main()
