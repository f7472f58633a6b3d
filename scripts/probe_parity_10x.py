"""Value parity at 10x for the magnitude-sensitive family (round-11).

The sf0.1 parity sweep checks values at 10x the driver's scale; this
probe pushes the MONEY/TPC-H family one notch further (the 10x clone
from probe_vacuous_10x.py, ~sf1 = 100x driver scale) and runs the
full dtype-strict check_query against DuckDB on the same clone. The
target class is magnitude drift: double sums that are green at small
scale and flake as values grow (the dsum/msum design exists exactly
for this — here we verify it held at 6M lineitem rows), plus any
q11-style constant whose VALUE (not just row count) degrades.

Only the bounded family runs — the full oracle set includes CTE
chains (per-token simhash bit explosion, unrolled PageRank) that are
deliberately fixture-scale-only in DuckDB.

Usage: python scripts/probe_vacuous_10x.py --reuse  # build clone once
       python scripts/probe_parity_10x.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CLONE = "/tmp/glue_vacuous_10x"

EXTRA = [
    "q1_pricing_summary",
    "join_multiway_revenue",
    "agg_rollup",
    "agg_decimal_exact",
    "agg_incremental_merge",
]


def duckdb_connect_dirs(sf_dir: str):
    """duckdb_connect twin for Spark-written directory tables."""
    import duckdb

    from glue_etl_pyspark_spark.io import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet({src})"
        )
    return con


def main() -> int:
    from glue_etl_pyspark_spark.parity import check_query
    from glue_etl_pyspark_spark.registry import load_all
    from glue_etl_pyspark_spark.session import get_spark

    spark = get_spark()
    reg = load_all()
    names = [
        n
        for n, s in reg.items()
        if s.oracle is not None and (s.category == "tpch" or n in EXTRA)
    ]
    con = duckdb_connect_dirs(CLONE)
    bad = []
    for n in sorted(names):
        r = check_query(spark, CLONE, n, con=con)
        print(f"{'PASS' if r.ok else 'FAIL'} {n}: rows={r.spark_rows} {r.detail}", flush=True)
        if not r.ok:
            bad.append(n)
    print(f"TOTAL {len(names)} checked, {len(bad)} failed: {bad}", flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
