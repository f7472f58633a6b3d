"""Adaptive-join probe for the r12 de-hinted star joins (VERDICT r11
item 4).

Round 12 removed every forced broadcast() hint from SF-scaled join
sides (orders/customer/part/supplier). This probe demonstrates the
adaptive behavior the de-hint buys, one notch above bench scale:

  - at sf0.1 AND at the 10x clone, run each de-hinted star join to
    completion and read the FINAL adaptive plan (isFinalPlan=true);
  - record wall time plus the BroadcastHashJoin / SortMergeJoin /
    ShuffledHashJoin counts at both scales;
  - the expectation is NOT "always broadcast": it is "size-converted".
    Sides still under spark.sql.autoBroadcastJoinThreshold broadcast;
    a side that outgrows it flips to a shuffle join — the flip is the
    FEATURE (a forced hint would OOM instead at 100 TB).

Reuses the FK-consistent 10x clone from probe_vacuous_10x (builds it
if absent). Results go to SCALING.md (add-only).

Usage: python scripts/probe_dehinted_10x.py [--reuse]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probe_vacuous_10x import OUT, SF_DIR, build_clone  # noqa: E402

QUERIES = [
    "join_inner_equi",
    "join_multiway_revenue",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q12_priority_counts",
    "tpch_q14_promo_effect",
    "tpch_q19_disjunctive",
    "revenue_share_of_region",
    "feature_target_encode",
    "dq_expectations",
    "bloom_prune_join",
]


def final_join_mix(df) -> dict[str, int]:
    """Execute and read the final (post-AQE) physical join operators.

    The executed AdaptiveSparkPlan's toString prints BOTH the final
    plan and an "== Initial Plan ==" section — slice the final section
    off so counts are true operator counts (the r12 SCALING rows were
    recorded from the doubled form; divide those by 2)."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    return {
        op: len(re.findall(rf"\b{op}\b", final))
        for op in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
    }


def main() -> int:
    from glue_etl_pyspark_spark.registry import load_all
    from glue_etl_pyspark_spark.session import get_spark

    spark = get_spark()
    if "--reuse" not in sys.argv or not os.path.exists(
        f"{OUT}/lineitem.parquet"
    ):
        build_clone(spark, 10)

    reg = load_all()
    bad = []
    for name in QUERIES:
        row = {"name": name}
        for tag, d in (("sf01", SF_DIR), ("x10", OUT)):
            t0 = time.time()
            try:
                mix = final_join_mix(reg[name].fn(spark, d))
                row[tag] = mix
                row[f"{tag}_s"] = round(time.time() - t0, 1)
            except Exception as e:  # noqa: BLE001 — record, keep scanning
                row[tag] = f"ERR {type(e).__name__}"
                row[f"{tag}_s"] = round(time.time() - t0, 1)
                bad.append(name)
            spark.catalog.clearCache()
        print(json.dumps(row), flush=True)
    print(json.dumps({"n": len(QUERIES), "err": bad}), flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
