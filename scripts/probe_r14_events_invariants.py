"""Round-14: upgrade the three rows-stable-only events 100x rows to
VALUE checks (VERDICT r13 item 6).

probe_r13_events_100x clones sf0.1 events 100x with event_id AND
user_id shifted per clone — so every user's event sequence (ts,
event_type, value) is identical to some 1x user's. Consequences,
provable per query:

- path_trigrams: per-user trigrams identical per clone -> every
  path's n scales exactly 100x and the (n DESC, path) ranking is
  unchanged -> expected 100x top-15 = 1x top-15 with n*100.
- cusum_shift: keyed per event_type; daily counts, n_total scale
  100x while d_days is unchanged -> the scaled deviation n*D - N and
  every prefix CUSUM scale exactly 100x; |cusum| ranking unchanged ->
  expected = 1x rows with peak_cusum_scaled*100.
- attribution_linear: segments/credits are per-user integer math,
  identical per clone -> channel sums scale exactly 100x ->
  expected = 1x rows with n_credits*100 and credit_micro*100
  (credit_micro stays < 1e17, no overflow).

Each expected frame comes from DuckDB running the 1x oracle at sf0.1
and scaling, compared dtype-strict (astype(str), never fetchall)
against Spark on the 100x clone — external value evidence AT 100x.

Usage: python scripts/probe_r14_events_invariants.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probe_r13_events_100x import OUT, SF, build_clone  # noqa: E402


def _compare(spark_df, duck_res) -> str:
    """Dtype-strict compare via parity.compare_pandas (toPandas/.df
    + astype(str) — the r4 HUGEINT rule; ADVICE r14 fix)."""
    from glue_etl_pyspark_spark.parity import compare_pandas

    return compare_pandas(spark_df, duck_res)


# (query, SQL wrapping the 1x oracle output into the expected 100x
# frame; the oracle runs over the sf0.1 views)
SCALINGS = {
    "events_path_trigrams": """
      SELECT path, CAST(n * 100 AS BIGINT) AS n FROM base
      ORDER BY n DESC, path""",
    "events_cusum_shift": """
      SELECT event_type, shift_day,
        CAST(peak_cusum_scaled * 100 AS BIGINT) AS peak_cusum_scaled,
        direction
      FROM base""",
    "events_attribution_linear": """
      SELECT channel, CAST(n_credits * 100 AS BIGINT) AS n_credits,
        CAST(credit_micro * 100 AS BIGINT) AS credit_micro
      FROM base""",
}


def main() -> None:
    from glue_etl_pyspark_spark.parity import duckdb_connect
    from glue_etl_pyspark_spark.registry import load_all
    from glue_etl_pyspark_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    build_clone()
    con = duckdb_connect(SF)
    reg = load_all()
    for name, scale_sql in SCALINGS.items():
        t0 = time.time()
        sp100 = reg[name].fn(spark, OUT)
        sp100.persist()
        n100 = sp100.count()
        wall = time.time() - t0
        t0 = time.time()
        exp = con.execute(
            f"WITH base AS ({reg[name].oracle}) {scale_sql}"
        )
        verdict = _compare(sp100, exp)
        print(
            f"{name}: 100x {n100} rows/{wall:.1f}s; derived-expected "
            f"check @100x: {verdict} ({time.time() - t0:.1f}s oracle side)",
            flush=True,
        )
        sp100.unpersist()


if __name__ == "__main__":
    main()
