"""Round-13 100x probe: the basket/cooccurrence self-join family
(VERDICT r12 item 4 — the remaining corpus-scaled MEMORY_AND_DISK
persists the r12 winnow audit classified "fine by construction" but
never executed two orders above bench scale).

These run over lineitem/orders, not documents, so the probe clones
those two tables 100x (sf0.1 lineitem ~600k rows -> ~60M; orders
~150k -> ~15M) with orderkeys shifted per clone so every basket keeps
its real width (~4 lines) and partkeys unchanged so pair supports
genuinely grow 100x. Covered queries:

- cooccurrence_part_pairs: lineitem self-join on l_orderkey (pair
  blowup bounded by basket width), map-side-combined pair counts.
- basket_association_rules: the MEMORY_AND_DISK `baskets` persist
  (corpus-scaled thin rows) + in-array pair generation, no self-join.

Checks, strongest first:
1. Full DuckDB hash parity AT 100x via parity.check_query on the
   clone dir (the same gate the driver runs at sf0.01) — values, not
   just survival. Note the rule set legitimately differs from a
   scaled 1x answer: pairs below minsup at 1x qualify at 100x, so the
   lift-sorted top-50 reshuffles; the oracle reshuffles identically.
2. cooccurrence exact-100x supports: identical baskets per clone mean
   every pair's n_orders multiplies by exactly 100 and top-25
   membership/order is preserved (support-sorted, id tie-break).
3. No OOM / near-linear wall vs the 1x anchor.

Usage: python scripts/probe_r13_basket_100x.py
Results land as rows in SCALING.md; derived data stays in /tmp.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
OUT = "/tmp/spark_graft_probe_basket_100x"
FACTOR = 100
# orderkeys at sf0.1 stay far below 10M; the shift keeps clone key
# spaces disjoint while preserving basket membership within a clone.
SHIFT = 10_000_000
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def build_clone() -> None:
    # DuckDB writes SINGLE parquet files (Spark writes directories,
    # which parity.duckdb_connect's read_parquet views can't open)
    import duckdb

    if os.path.exists(f"{OUT}/lineitem.parquet"):
        return
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"""COPY (
          SELECT l.l_orderkey + t.c * {SHIFT} AS l_orderkey, l.l_partkey
          FROM read_parquet('{SF}/lineitem.parquet') l
          CROSS JOIN (SELECT unnest(generate_series(0, {FACTOR - 1})) AS c) t
        ) TO '{OUT}/lineitem.parquet' (FORMAT parquet)"""
    )
    con.execute(
        f"""COPY (
          SELECT o.o_orderkey + t.c * {SHIFT} AS o_orderkey
          FROM read_parquet('{SF}/orders.parquet') o
          CROSS JOIN (SELECT unnest(generate_series(0, {FACTOR - 1})) AS c) t
        ) TO '{OUT}/orders.parquet' (FORMAT parquet)"""
    )
    for t in TABLES:
        dst = f"{OUT}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SF}/{t}.parquet", dst)


def time_query(spark, name: str):
    from glue_etl_pyspark_spark.registry import load_all

    fn = load_all()[name].fn
    t0 = time.time()
    rows = fn(spark, OUT).collect()
    cold = time.time() - t0
    t0 = time.time()
    fn(spark, OUT).count()
    warm = time.time() - t0
    t0 = time.time()
    anchor = fn(spark, SF).collect()
    anchor_s = time.time() - t0
    return rows, cold, warm, anchor, anchor_s


def main() -> None:
    from glue_etl_pyspark_spark.parity import check_query
    from glue_etl_pyspark_spark.session import get_spark

    spark = get_spark()
    build_clone()

    for name in ("cooccurrence_part_pairs", "basket_association_rules"):
        rows, cold, warm, anchor, anchor_s = time_query(spark, name)
        res = check_query(spark, OUT, name)
        print(
            f"{name} 100x: {len(rows)} rows, cold {cold:.2f}s warm "
            f"{warm:.2f}s (1x anchor {anchor_s:.2f}s), parity@100x "
            f"{'MATCH' if res.ok else 'FAIL: ' + str(res.detail)}",
            flush=True,
        )

    # bonus exactness: cooccurrence supports scale exactly 100x and
    # top-25 membership/order is preserved (uniform scaling keeps the
    # support sort and the id tie-break stable).
    from glue_etl_pyspark_spark.registry import load_all

    fn = load_all()["cooccurrence_part_pairs"].fn
    got = [
        (r["part_a"], r["part_b"], r["n_orders"]) for r in fn(spark, OUT).collect()
    ]
    want = [
        (r["part_a"], r["part_b"], r["n_orders"] * FACTOR)
        for r in fn(spark, SF).collect()
    ]
    print(
        f"cooccurrence exact-100x-support {'OK' if got == want else 'MISMATCH'}",
        flush=True,
    )
    if got != want:
        print(f"  expected {want[:5]} ...\n  got      {got[:5]} ...")


if __name__ == "__main__":
    main()
