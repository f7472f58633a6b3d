"""Round-17 100x re-measure of the _with_perturbed_copies single-scan
shape (VERDICT r16 item 10). The r16 local A/B rejected
explode(array(orig, twin)) because the generator cost more than the
second 600 KB scan — but at sf0.1 scan I/O is invisible. This probe
re-runs the A/B on the 100x documents clone (500k docs, ~60 MB
parquet) where the union shape genuinely reads the corpus twice.

Timed unit: corpus -> noop (materializes every (doc_id, text) row,
both shapes produce identical rows — asserted before timing).
Interleaved reps. Result lands in SCALING.md round-17 either way.

Usage: python scripts/probe_r17_perturbed_100x.py [reps]
"""

from __future__ import annotations

import importlib.util
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def single_scan_variant(spark, sf_dir):
    """explode(array(orig, twin)) — one scan, generator fan-out."""
    from glue_etl_pyspark_spark.functions.text import tokenize_ws
    from glue_etl_pyspark_spark.io import load_table
    from glue_etl_pyspark_spark.queries.llm_dedup import _TWIN_OFF

    d = load_table(spark, sf_dir, "documents")
    ws = tokenize_ws("text")
    twin_text = F.array_join(
        F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))), " "
    )
    pair = F.array(
        F.struct(F.col("doc_id").alias("doc_id"), F.col("text").alias("text")),
        F.struct(
            (F.col("doc_id") + _TWIN_OFF).alias("doc_id"),
            twin_text.alias("text"),
        ),
    )
    return (
        d.select(F.explode(pair).alias("r"))
        .select(F.col("r.doc_id").alias("doc_id"), F.col("r.text").alias("text"))
    )


def main() -> None:
    from glue_etl_pyspark_spark.queries.llm_dedup import _with_perturbed_copies
    from glue_etl_pyspark_spark.session import get_spark

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spec = importlib.util.spec_from_file_location(
        "probe_r15_suffix_scale",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "probe_r15_suffix_scale.py"),
    )
    r15 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(r15)
    clone = r15.build_clone(100)

    spark = get_spark(app_name="perturbed_100x")
    spark.sparkContext.setLogLevel("ERROR")

    a = _with_perturbed_copies(spark, clone)
    b = single_scan_variant(spark, clone)
    na, nb = a.count(), b.count()
    assert na == nb, (na, nb)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    assert diff == 0, f"variants differ by {diff} rows"
    print(f"value identity OK ({na} rows)", flush=True)

    ts = {"union2scan": [], "singlescan": []}
    for i in range(reps):
        for name, fn in (("union2scan", _with_perturbed_copies),
                         ("singlescan", single_scan_variant)):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, clone).write.mode("overwrite").format("noop").save()
            ts[name].append(time.perf_counter() - t0)
        print(f"rep {i}: union {ts['union2scan'][-1]:.2f}s "
              f"single {ts['singlescan'][-1]:.2f}s", flush=True)
    for name, v in ts.items():
        print(f"{name}: min {min(v):.2f} med {statistics.median(v):.2f}")


if __name__ == "__main__":
    main()
