"""Full-registry driver simulation — the closing-evidence recipe the
round-6 and round-8 sections of SCALING.md quote (it ran ad-hoc both
times; this commits it).

Simulates the external driver's conditions exactly: a FRESH process
run from a DIFFERENT cwd (run it from /tmp), a VANILLA SparkSession
(no engine configs — catches config-at-build-time and pickle-by-
reference bugs pytest never sees), `__spark_entry__` loaded by file
path, t1 entry smoke, then every registered query: oracled names
through parity.check_query (dtype-strict vs DuckDB at sf0.01),
rows-only names executed and counted.

Usage:
    cd /tmp && python /root/repo/scripts/full_registry_sim.py
Exit code 0 only if t1 passes and no query FAILs/ERRs.
"""

from __future__ import annotations

import importlib.util
import sys
import time

REPO = "/root/repo"
SF = "/root/testdata/sf0.01"


def main() -> int:
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession

    b = SparkSession.builder.master("local[8]")
    # optional argv width: a deliberately ODD shuffle width (e.g. 7)
    # flushes partition-order-sensitive nondeterminism the default-200
    # sim and the 32-wide pytest session can't see (r11 addition; the
    # driver itself stays vanilla — never pass a width when simulating
    # the driver's exact conditions)
    if len(sys.argv) > 1:
        b = b.config("spark.sql.shuffle.partitions", sys.argv[1])
    spark = b.getOrCreate()

    from glue_etl_pyspark_spark.parity import check_query, duckdb_connect
    from glue_etl_pyspark_spark.registry import load_all

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", f"{REPO}/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rows = mod.entry(spark).collect()
    print(f"t1 entry: {len(rows)} rows", flush=True)
    if not rows:
        return 1

    con = duckdb_connect(SF)
    reg = load_all()
    n_match = n_rows_only = n_fail = 0
    t_start = time.time()
    for i, name in enumerate(reg):
        t0 = time.time()
        try:
            q = reg[name]
            if q.oracle is None:
                cnt = q.fn(spark, SF).count()
                print(
                    f"{i + 1:3d} ROWS {name}: {cnt} rows"
                    f" ({time.time() - t0:.1f}s)",
                    flush=True,
                )
                n_rows_only += 1
            else:
                r = check_query(spark, SF, name, con=con)
                if r.ok:
                    n_match += 1
                else:
                    n_fail += 1
                tag = "MATCH" if r.ok else "FAIL"
                print(
                    f"{i + 1:3d} {tag} {name} ({time.time() - t0:.1f}s)"
                    + ("" if r.ok else f" {r.detail[:200]}"),
                    flush=True,
                )
        except Exception as e:  # noqa: BLE001 — keep simulating past one bad query
            n_fail += 1
            print(
                f"{i + 1:3d} ERR {name}: {type(e).__name__} {str(e)[:200]}",
                flush=True,
            )
    print(
        f"TOTAL: {n_match} MATCH, {n_rows_only} rows-only, {n_fail} FAIL/ERR"
        f" in {time.time() - t_start:.0f}s",
        flush=True,
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
