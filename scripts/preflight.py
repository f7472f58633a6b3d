"""One-command round-close preflight (VERDICT r9 item 3).

Never commit round-close work unverified: this script is the minimum
gate before any end-of-round (or feature) commit. It runs

1. the full pytest suite (the red manifest test of r9 would have
   blocked the snapshot here), and
2. a driver-style parity check — fresh DuckDB connection, the live
   registry, sf0.01 — for the queries named on the command line
   (default: every query whose registering module changed vs HEAD,
   detected via ``git diff --name-only``).

Usage:
    python scripts/preflight.py                 # suite + changed-query parity
    python scripts/preflight.py q1 q2 ...       # suite + named queries
    python scripts/preflight.py --no-suite q1   # parity only

Exit code 0 = safe to commit. Anything else: do not commit.
"""

from __future__ import annotations

import subprocess
import sys

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.01"


def changed_query_names() -> list[str]:
    """Queries registered by modules that differ from HEAD."""
    out = subprocess.run(
        ["git", "diff", "--name-only", "HEAD"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout.split()
    changed_files = {f for f in out if f.endswith(".py")}
    if not changed_files:
        return []
    from glue_etl_pyspark_spark.registry import load_all

    names = []
    for name, spec in load_all().items():
        mod = sys.modules.get(spec.fn.__module__)
        f = getattr(mod, "__file__", "") or ""
        rel = f.split("/root/repo/")[-1]
        if rel in changed_files:
            names.append(name)
    return names


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    run_suite = "--no-suite" not in sys.argv

    if run_suite:
        # BOTH tiers: the bare run deselects `slow` (pyproject addopts,
        # the driver-facing fast tier); round closes must run everything
        print("== preflight: pytest tests/ (fast + slow tiers) ==", flush=True)
        rc = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/", "-x", "-q",
             "-m", "slow or not slow"]
        ).returncode
        if rc != 0:
            print("PREFLIGHT FAIL: suite red — do not commit")
            return rc

    names = args or changed_query_names()
    if not names:
        print("preflight: no changed queries to parity-check")
        return 0

    print(f"== preflight: parity for {names} ==", flush=True)
    from pyspark.sql import SparkSession

    from glue_etl_pyspark_spark.parity import check_query, duckdb_connect

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    con = duckdb_connect(SF_DIR)
    bad = []
    try:
        for n in names:
            r = check_query(spark, SF_DIR, n, con=con)
            print(f"  {n}: {'OK' if r.ok else 'FAIL — ' + r.detail}")
            if not r.ok:
                bad.append(n)
    finally:
        con.close()
        spark.stop()
    if bad:
        print(f"PREFLIGHT FAIL: {bad} — do not commit")
        return 1
    print("preflight: all green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
