"""Round-16 100x VALUE probe for the core relational families
(VERDICT r15 item 3): q1, the 5-way star join, rollup, ranking
windows, per-group top-k and the as-of join — the last big families
whose value evidence stopped at 10x (SCALING r11).

Construction: 100x key-shifted clones of the FACT tables only
(lineitem + orders share the orderkey shift so the star join stays
consistent; events shifts event_id AND user_id per the r13 probe so
per-user windows keep real-world width while the key space scales).
Dims (customer/nation/region/...) stay 1x — each customer simply
owns 100x orders, which is exactly how a real 100x deployment skews.

Check style: per-clone FULL-ORACLE — DuckDB runs each query's real
registered oracle over the SAME cloned parquet (no derivation laws
needed; these queries hash no absolute ids, but full-oracle is valid
either way per the r14 graph lesson). Small-output queries compare
dtype-strict via parity.compare_pandas. The two full-table-output
queries (window_ranking ~15M rows, asof ~7.5M rows) compare via a
per-group VALUE DIGEST computed independently by both engines: count
+ sum of the portable md5 hash (sketches._md5_mod polynomial in
DuckDB, its pinned conv() twin in Spark) over every output cell,
floats floor-scaled to integer micro-units before rendering (the
cast-rounds-vs-truncates and float-rendering traps). Digest sums are
24-bit values over <=30M rows — max ~5e14, no bigint overflow.

Usage: python scripts/probe_r16_relational_100x.py [query ...]
Results land in SCALING.md round-16.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
OUT = "/tmp/spark_graft_probe_rel_100x"
FACTOR = 100
ORDER_SHIFT = 100_000_000
EVENT_SHIFT = 100_000_000
USER_SHIFT = 1_000_000
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

DIRECT = (  # small outputs: full dtype-strict compare at 100x
    "q1_pricing_summary",
    "join_multiway_revenue",
    "agg_rollup",
    "topk_per_group",
)
DIGEST = ("window_ranking", "join_asof_purchase_click")


def build_clone() -> None:
    import duckdb

    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    if not os.path.exists(f"{OUT}/lineitem.parquet"):
        con.execute(
            f"""COPY (
              SELECT l.l_orderkey + t.c * {ORDER_SHIFT} AS l_orderkey,
                     l.* EXCLUDE (l_orderkey)
              FROM read_parquet('{SF}/lineitem.parquet') l
              CROSS JOIN (SELECT unnest(generate_series(0, {FACTOR - 1})) AS c) t
            ) TO '{OUT}/lineitem.parquet' (FORMAT parquet)"""
        )
    if not os.path.exists(f"{OUT}/orders.parquet"):
        con.execute(
            f"""COPY (
              SELECT o.o_orderkey + t.c * {ORDER_SHIFT} AS o_orderkey,
                     o.* EXCLUDE (o_orderkey)
              FROM read_parquet('{SF}/orders.parquet') o
              CROSS JOIN (SELECT unnest(generate_series(0, {FACTOR - 1})) AS c) t
            ) TO '{OUT}/orders.parquet' (FORMAT parquet)"""
        )
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
    for t in TABLES:
        dst = f"{OUT}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SF}/{t}.parquet", dst)


# --- digest plumbing -------------------------------------------------------

_DIGEST_MOD = 16_000_003  # < 2^24; 30M-row sums stay < 5e14


def digest_pair(spark_df, con, oracle_sql: str, group_col: str):
    """(spark_digest_df, duck_digest_rel): per-group count + summed
    portable hash over all cells, computed independently per engine."""
    from glue_etl_pyspark_spark.queries.sketches import (
        _md5_mod,
        _md5_mod_spark,
    )

    cols = spark_df.columns
    dtypes = dict(spark_df.dtypes)

    sp_parts, du_parts = [], []
    for c in cols:
        dt = dtypes[c]
        if dt == "double":
            sp_parts.append(f"cast(floor({c} * 1e6 + 0.5) as bigint)")
            du_parts.append(f"CAST(floor({c} * 1e6 + 0.5) AS BIGINT)")
        elif dt.startswith("timestamp"):
            sp_parts.append(f"cast(unix_micros(cast({c} as timestamp)) as bigint)")
            du_parts.append(f"CAST(epoch_us({c}) AS BIGINT)")
        else:
            sp_parts.append(f"cast({c} as string)")
            du_parts.append(f"CAST({c} AS VARCHAR)")
    sp_row = "concat_ws('|', " + ", ".join(sp_parts) + ")"
    du_row = "concat_ws('|', " + ", ".join(du_parts) + ")"

    sp_dig = spark_df.selectExpr(
        f"{group_col} as grp",
        f"{_md5_mod_spark(sp_row, 'dig', _DIGEST_MOD)} as h",
    )
    from pyspark.sql import functions as F

    sp_out = (
        sp_dig.groupBy("grp")
        .agg(
            F.count("*").cast("bigint").alias("cnt"),
            F.sum("h").cast("bigint").alias("digest"),
        )
        .orderBy("grp")
        .selectExpr("cast(grp as string) as grp", "cnt", "digest")
    )
    du_out = con.execute(
        f"""
        SELECT CAST(grp AS VARCHAR) AS grp,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(SUM(h) AS BIGINT) AS digest
        FROM (
          SELECT {group_col} AS grp,
                 {_md5_mod(du_row, 'dig', _DIGEST_MOD)} AS h
          FROM ({oracle_sql.rstrip().rstrip(';')}) q
        ) t
        GROUP BY grp ORDER BY grp
        """
    )
    return sp_out, du_out


def main() -> None:
    from glue_etl_pyspark_spark.parity import compare_pandas, duckdb_connect
    from glue_etl_pyspark_spark.registry import load_all
    from glue_etl_pyspark_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    build_clone()
    reg = load_all()
    con = duckdb_connect(OUT)

    for name in DIRECT:
        if only and name not in only:
            continue
        spec = reg[name]
        t0 = time.time()
        sp = spec.fn(spark, OUT)
        sp.persist()
        n = sp.count()
        wall = time.time() - t0
        t0 = time.time()
        verdict = compare_pandas(sp, con.execute(spec.oracle))
        print(
            f"{name}: {n} rows/{wall:.1f}s spark; {verdict} "
            f"({time.time() - t0:.1f}s oracle)",
            flush=True,
        )
        sp.unpersist()
        spark.catalog.clearCache()

    group_col = {
        "window_ranking": "o_orderstatus",
        "join_asof_purchase_click": "user_id % 16",
    }
    for name in DIGEST:
        if only and name not in only:
            continue
        spec = reg[name]
        t0 = time.time()
        sp = spec.fn(spark, OUT)
        sp_out, du_out = digest_pair(sp, con, spec.oracle, group_col[name])
        sp_out.persist()
        n = sp_out.count()
        wall = time.time() - t0
        t0 = time.time()
        verdict = compare_pandas(sp_out, du_out)
        print(
            f"{name} [digest/{group_col[name]}]: {n} groups/{wall:.1f}s "
            f"spark; {verdict} ({time.time() - t0:.1f}s oracle)",
            flush=True,
        )
        sp_out.unpersist()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
