"""100x adaptive-join probe (round-12, two notches above bench scale).

The 10x probe (`probe_dehinted_10x.py`) showed the first broadcast ->
sort-merge flips (tpch_q12, tpch_q9). This one pushes the de-hinted
star-join family to a 100x FK-consistent clone of sf0.1 (~sf10: 60M
lineitem, 15M customer, 2M part rows) where EVERY SF-scaled dim is far
past `autoBroadcastJoinThreshold` — the regime the old forced hints
would have pinned multi-hundred-MB broadcast relations in. Expectation:
the plans flip to shuffle joins wherever a side outgrew the threshold,
keep broadcast for nation/region, and every query completes with
near-linear wall time vs the 10x run.

Only the relational tables are cloned (region/nation verbatim; keys +
foreign keys shifted by clone x stride, the probe_vacuous recipe) —
the join family reads nothing else. ~3 GB under /tmp, never committed.
Results go to SCALING.md (add-only).

Usage: python scripts/probe_dehinted_100x.py [--reuse]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probe_dehinted_10x import final_join_mix  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
OUT = "/tmp/glue_dehinted_100x"
FACTOR = 100

QUERIES = [
    "join_inner_equi",
    "join_multiway_revenue",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q10_returned_items",
    "tpch_q12_priority_counts",
    "tpch_q14_promo_effect",
    "tpch_q19_disjunctive",
    "q1_pricing_summary",
]


def build_relational_clone(spark) -> None:
    from glue_etl_pyspark_spark.io import load_table

    clones = F.broadcast(
        spark.range(FACTOR).select(F.col("id").cast("long").alias("c"))
    )

    def stride(df, key):
        return df.agg(F.max(key)).collect()[0][0] + 1

    def write(df, name):
        df.write.mode("overwrite").parquet(f"{OUT}/{name}.parquet")

    t0 = time.time()
    for name in ("region", "nation"):
        write(load_table(spark, SF_DIR, name), name)

    cust = load_table(spark, SF_DIR, "customer")
    supp = load_table(spark, SF_DIR, "supplier")
    part = load_table(spark, SF_DIR, "part")
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")

    s_cust = stride(cust, "c_custkey")
    s_supp = stride(supp, "s_suppkey")
    s_part = stride(part, "p_partkey")
    s_ord = stride(orders, "o_orderkey")

    def shifted(df, shifts: dict):
        out = df.crossJoin(clones)
        for col, s in shifts.items():
            out = out.withColumn(col, F.col(col) + F.col("c") * F.lit(s))
        return out

    write(shifted(cust, {"c_custkey": s_cust}).drop("c"), "customer")
    write(shifted(supp, {"s_suppkey": s_supp}).drop("c"), "supplier")
    write(shifted(part, {"p_partkey": s_part}).drop("c"), "part")
    write(
        shifted(orders, {"o_orderkey": s_ord, "o_custkey": s_cust}).drop("c"),
        "orders",
    )
    write(
        shifted(
            li,
            {"l_orderkey": s_ord, "l_partkey": s_part, "l_suppkey": s_supp},
        ).drop("c"),
        "lineitem",
    )
    print(f"# 100x relational clone: {time.time() - t0:.1f}s", flush=True)


def main() -> int:
    from glue_etl_pyspark_spark.registry import load_all
    from glue_etl_pyspark_spark.session import get_spark

    spark = get_spark()
    if "--reuse" not in sys.argv or not os.path.exists(
        f"{OUT}/lineitem.parquet"
    ):
        build_relational_clone(spark)

    reg = load_all()
    bad = []
    for name in QUERIES:
        t0 = time.time()
        row = {"name": name}
        try:
            row["x100"] = final_join_mix(reg[name].fn(spark, OUT))
            row["x100_s"] = round(time.time() - t0, 1)
        except Exception as e:  # noqa: BLE001 — record, keep scanning
            row["x100"] = f"ERR {type(e).__name__}"
            row["x100_s"] = round(time.time() - t0, 1)
            bad.append(name)
        spark.catalog.clearCache()
        print(json.dumps(row), flush=True)
    print(json.dumps({"n": len(QUERIES), "err": bad}), flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
