"""Time every registered query once at sf0.1 (repo session, warm JVM
after a q1 warmup) — the per-query runtime inventory behind the
SCALING.md round-8 table. Writes JSON lines to stdout; sort for the
slow tail. Not a bench (single run, no medians) — a coverage-wide
smoke of where wall time lives at 10x the driver's check scale."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"


def main() -> None:
    from glue_etl_pyspark_spark.registry import load_all
    from glue_etl_pyspark_spark.session import get_spark

    spark = get_spark()
    reg = load_all()
    reg["q1_pricing_summary"].fn(spark, SF).count()  # warm the session
    out = {}
    for name in reg:
        t0 = time.time()
        try:
            reg[name].fn(spark, SF).count()
            out[name] = round(time.time() - t0, 2)
        except Exception as e:  # noqa: BLE001 — record, keep timing the rest
            out[name] = f"ERR {type(e).__name__}"
        print(json.dumps({name: out[name]}), flush=True)
        spark.catalog.clearCache()
    errs = {k: v for k, v in out.items() if isinstance(v, str)}
    total = sum(v for v in out.values() if isinstance(v, float))
    print(json.dumps({"total_sec": round(total, 1), "errors": errs}), flush=True)


if __name__ == "__main__":
    main()
