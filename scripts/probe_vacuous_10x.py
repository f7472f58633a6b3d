"""Vacuousness scan one notch above bench scale (round-11).

The r11 sf0.1 sweep caught tpch_q11 returning 0 rows on both engines
at 10x part count — a FIXED-CONSTANT predicate whose selectivity
collapses as the key domain grows. The parity guard only sees scales
we have oracleable fixtures for (sf0.01, sf0.1); this probe asks the
same question one notch higher: synthesize an FK-consistent 10x clone
of sf0.1 (~sf1: 6M lineitem, 200k orders-per-month density, 10x key
domains) and run EVERY oracled query Spark-side, recording row counts
at sf0.1 vs 10x.

Flags:
  ZERO   — 0 rows at 10x (the q11 class: dead at the next scale-up)
  SHRUNK — fewer rows at 10x than at sf0.1 (selectivity collapsing;
           a q11 precursor worth reading, not automatically a bug —
           top-k/limit queries are exempted since their size is fixed)

Clone semantics (FK-consistent, judge-checkable):
  - region/nation copied as-is (fixed dims, like TPC-H);
  - every other table's keys shift by clone*stride with FOREIGN keys
    shifted by the SAME stride, so joins hit exactly as at sf0.1;
  - document text gets per-token clone suffixes for clones >0 (the
    probe_r9 recipe: keeps intra-clone duplicate structure, avoids
    manufacturing 9 near-dup twins per doc that would quadratically
    inflate LSH/shingle candidate pairs); n_chars recomputed;
  - embeddings get a deterministic per-clone element perturbation
    (scale_probe recipe) so ANN/cosine ops see near- not exact-dups;
  - values/dates/categories unchanged, so date windows and category
    filters keep their absolute selectivity while density grows 10x.

Derived data lands in /tmp, never committed. Results go to SCALING.md.

Usage: python scripts/probe_vacuous_10x.py [factor] [--reuse]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"
OUT = "/tmp/glue_vacuous_10x"

# fixed-size outputs: a smaller-or-equal count at 10x is by design
FIXED_SIZE_OK = {
    "topk_global",
    "sort_limit_offset",
}


def build_clone(spark, factor: int) -> None:
    from glue_etl_pyspark_spark.io import load_table

    clones = F.broadcast(
        spark.range(factor).select(F.col("id").cast("long").alias("c"))
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
    ev = load_table(spark, SF_DIR, "events")
    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")

    s_cust = stride(cust, "c_custkey")
    s_supp = stride(supp, "s_suppkey")
    s_part = stride(part, "p_partkey")
    s_ord = stride(orders, "o_orderkey")
    s_ev = stride(ev, "event_id")
    s_user = stride(ev, "user_id")
    s_doc = stride(docs, "doc_id")
    s_vec = stride(emb, "vec_id")

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
            {
                "l_orderkey": s_ord,
                "l_partkey": s_part,
                "l_suppkey": s_supp,
            },
        ).drop("c"),
        "lineitem",
    )
    write(
        shifted(ev, {"event_id": s_ev, "user_id": s_user}).drop("c"), "events"
    )

    # documents: clone 0 keeps text verbatim; clones >0 suffix every
    # token with the clone id (probe_r9 recipe — see module docstring)
    d = shifted(docs, {"doc_id": s_doc})
    d = d.withColumn(
        "text",
        F.when(F.col("c") == 0, F.col("text")).otherwise(
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.concat(w, F.col("c").cast("string")),
                ),
                " ",
            )
        ),
    ).withColumn("n_chars", F.length("text").cast("long"))
    write(d.drop("c"), "documents")

    # embeddings: deterministic per-clone perturbation, clone 0 exact
    e = shifted(emb, {"vec_id": s_vec})
    e = e.withColumn(
        "embedding",
        F.transform(
            F.col("embedding"),
            lambda x, i: (
                x
                + (F.col("c").cast("float") * F.lit(0.0013))
                * ((i % 7).cast("float") - F.lit(3.0))
            ).cast("float"),
        ),
    )
    write(e.drop("c"), "embeddings")
    print(f"# clone build: {time.time() - t0:.1f}s", flush=True)


def main() -> int:
    # flags and positionals can come in any order (ADVICE r11:
    # `probe_vacuous_10x.py --reuse` used to crash on int("--reuse"))
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    factor = int(pos[0]) if pos else 10
    from glue_etl_pyspark_spark.registry import load_all
    from glue_etl_pyspark_spark.session import get_spark

    spark = get_spark()
    if "--reuse" not in sys.argv or not os.path.exists(
        f"{OUT}/lineitem.parquet"
    ):
        build_clone(spark, factor)

    reg = load_all()
    oracled = [n for n, s in reg.items() if s.oracle is not None]
    zero, shrunk, errored = [], [], []
    for name in oracled:
        row = {"name": name}
        for tag, d in (("sf01", SF_DIR), ("x10", OUT)):
            t0 = time.time()
            try:
                row[tag] = reg[name].fn(spark, d).count()
                row[f"{tag}_s"] = round(time.time() - t0, 1)
            except Exception as e:  # noqa: BLE001 — record, keep scanning
                row[tag] = f"ERR {type(e).__name__}"
                row[f"{tag}_s"] = round(time.time() - t0, 1)
            spark.catalog.clearCache()
        print(json.dumps(row), flush=True)
        if isinstance(row["x10"], str) or isinstance(row["sf01"], str):
            # a query that CRASHES one notch above bench scale is as
            # bad as a vacuous one — it must fail the probe (ADVICE r11)
            errored.append(name)
        elif row["x10"] == 0:
            zero.append(name)
        elif (
            isinstance(row["x10"], int)
            and isinstance(row["sf01"], int)
            and row["x10"] < row["sf01"]
            and name not in FIXED_SIZE_OK
        ):
            shrunk.append(name)
    print(
        json.dumps(
            {"n": len(oracled), "zero": zero, "shrunk": shrunk, "err": errored}
        ),
        flush=True,
    )
    return 1 if zero or errored else 0


if __name__ == "__main__":
    raise SystemExit(main())
