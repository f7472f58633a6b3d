"""UDF/UDAF/UDTF surface queries (SURVEY.md §2.11).

Each Python-execution path is exercised by a query whose math is also
SQL-expressible, so the DuckDB oracle checks the UDF machinery
end-to-end (serialization, Arrow batching, schema mapping) — not just
that it runs. Ordered fastest-to-slowest path: pandas_udf (Arrow,
vectorized) > applyInPandas/mapInPandas (Arrow, per-group/partition) >
row-at-a-time udf (pickle; kept ONLY as the Glue ``Map.apply``
compatibility demo — never use in a hot path)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..io import load_table
from ..registry import query

PANDAS_UDF_ORACLE = """
SELECT l_orderkey, l_linenumber,
  l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
FROM lineitem WHERE l_quantity >= 45
"""


@query("udf_pandas_scalar", oracle=PANDAS_UDF_ORACLE, category="udf")
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized (Arrow) scalar pandas_udf; numpy does the identical
    double arithmetic, so the oracle hash-matches."""
    import pandas as pd

    @pandas_udf("double")
    def charge(price, disc, tax):  # pd.Series in, pd.Series out
        return price * (1 - disc) * (1 + tax)

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charge("l_extendedprice", "l_discount", "l_tax").alias("charge"),
    )


ROW_UDF_ORACLE = """
SELECT o_orderkey,
  upper(o_orderstatus) || ':' || CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR) AS tag
FROM orders WHERE o_totalprice > 450000
"""


@query("udf_row_scalar", oracle=ROW_UDF_ORACLE, category="udf")
def udf_row_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — the Glue Map.apply compatibility
    path. Registered for SQL use too (spark.udf.register). Kept off
    hot paths by policy: ~10-100x slower than pandas_udf."""

    def tag(status: str, total: float) -> str:
        return f"{status.upper()}:{int(total)}"

    spark.udf.register("order_tag", tag, "string")
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_udf_view")
    return spark.sql(
        "SELECT o_orderkey, order_tag(o_orderstatus, o_totalprice) AS tag "
        "FROM orders_udf_view WHERE o_totalprice > 450000"
    )


GROUPED_ORACLE = """
SELECT user_id,
  round((value - avg_v) / NULLIF(std_v, 0), 6) AS value_z,
  event_id
FROM (
  SELECT user_id, event_id, value,
    AVG(value) OVER (PARTITION BY user_id) AS avg_v,
    STDDEV_SAMP(value) OVER (PARTITION BY user_id) AS std_v
  FROM events
)
"""


@query("udf_grouped_zscore", oracle=GROUPED_ORACLE, category="udf")
def udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (UDAF-ish): per-user z-scores. The
    whole group arrives as one pandas frame (the operator contract a
    plain window can't give you); oracle = the window-SQL equivalent.
    Shuffles once on user_id, state bounded by max group size."""
    import pandas as pd

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["value"].std(ddof=1)
        avg = pdf["value"].mean()
        z = (pdf["value"] - avg) / std if std and std > 0 else pd.Series([None] * len(pdf))
        return pd.DataFrame(
            {"user_id": pdf["user_id"], "value_z": z.round(6), "event_id": pdf["event_id"]}
        )

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").applyInPandas(
        zscore, schema="user_id bigint, value_z double, event_id bigint"
    )


MAPINPANDAS_ORACLE = """
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes_text,
  CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS BIGINT) AS n_tokens
FROM documents WHERE n_chars > 300
"""


@query("udf_mapinpandas", oracle=MAPINPANDAS_ORACLE, category="udf")
def udf_mapinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas (iterator of Arrow batches → batches): constant
    memory per task regardless of partition size — the shape for
    batch-level Python (tokenizers, codecs)."""
    import pandas as pd

    def stats(it):
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes_text": pdf["text"].str.len(),
                    "n_tokens": pdf["text"].str.lower().str.split().str.len(),
                }
            )

    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 300)
    return d.mapInPandas(stats, schema="doc_id bigint, n_bytes_text bigint, n_tokens bigint")


UDAF_ORACLE = """
SELECT l_returnflag, l_linestatus,
  round(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 6) AS wavg_price,
  CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


@query("udaf_grouped_agg", oracle=UDAF_ORACLE, category="udf")
def udaf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas_udf (Series -> scalar), the UDAF leg
    of the §2.11 matrix: quantity-weighted mean price per group,
    plus a count UDAF (Spark disallows mixing GROUPED_AGG with
    non-pandas aggregates in one .agg()). The oracle is the
    SQL SUM-ratio — the ratio's error cancels enough that round(6) is
    stable (order-independence analysis: CLAUDE.md money rule; ratios
    of same-order sums, unlike raw money sums, don't drift at sf0.1).
    Scale note: GROUPED_AGG has no partial aggregation — every group
    row shuffles to its reducer; prefer built-in SUM/ratio when the
    math is expressible (it is here — this query exists to prove the
    machinery against that exact equivalent)."""
    # PandasUDFType over type hints: `from __future__ import annotations`
    # stringifies hints, and pyspark can't resolve 'pd.Series' against a
    # function-local import — the explicit eval type sidesteps inference.
    from pyspark.sql.functions import PandasUDFType

    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def wavg(price, qty):
        return float((price * qty).sum() / qty.sum())

    @pandas_udf("bigint", PandasUDFType.GROUPED_AGG)
    def n_rows(price):
        return len(price)

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(wavg("l_extendedprice", "l_quantity"), 6).alias("wavg_price"),
        n_rows("l_extendedprice").alias("n_items"),
    )


UDTF_ORACLE = """
SELECT doc_id, unnest(string_split(lang || '|' || source, '|')) AS part
FROM documents WHERE doc_id < 50
"""


@query("udf_table_function", oracle=UDTF_ORACLE, category="udf")
def udf_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function, Spark >= 3.5): one input row →
    many output rows, used laterally from SQL."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="part string")
    class SplitParts:
        def eval(self, s: str):
            for p in s.split("|"):
                yield (p,)

    spark.udtf.register("split_parts", SplitParts)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    d.createOrReplaceTempView("docs_udtf_view")
    return spark.sql(
        """
        SELECT d.doc_id, s.part
        FROM docs_udtf_view d,
             LATERAL split_parts(concat(d.lang, '|', d.source)) s
        """
    )


UDTF_ANALYZE_ORACLE = """
SELECT event_id,
  CAST(json_extract(props, '$.k') AS BIGINT) AS k,
  CAST(NULL AS BIGINT) AS missing
FROM events WHERE event_id < 200
"""


@query("udtf_analyze_dynamic", oracle=UDTF_ANALYZE_ORACLE, category="udf")
def udtf_analyze_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF (Spark >= 3.5 ``analyze()``): the
    OUTPUT SCHEMA is computed at plan time from a constant argument —
    here a comma-separated field list ('k,missing') expanded into one
    BIGINT column per requested JSON field, absent fields yielding
    typed NULLs. This is the schema-on-demand shape of semi-structured
    ETL (Glue's choice-type relatives): the caller names fields, the
    planner gets real columns, and Catalyst prunes/optimizes them like
    any other. Row-at-a-time Python is the API's cost — demoed on a
    bounded slice like the other §2.11 rows; bulk JSON paths in this
    repo go through from_json/variant (func_map_json, func_variant)."""
    import json as _json

    from pyspark.sql.functions import udtf
    from pyspark.sql.types import LongType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeResult

    class ExtractFields:
        @staticmethod
        def analyze(props_arg, fields_arg):
            names = [f.strip() for f in fields_arg.value.split(",")]
            return AnalyzeResult(
                StructType([StructField(n, LongType()) for n in names])
            )

        def __init__(self):
            self._names = None

        def eval(self, props: str, fields: str):
            if self._names is None:
                self._names = [f.strip() for f in fields.split(",")]
            obj = _json.loads(props) if props else {}
            yield tuple(
                int(obj[n]) if n in obj and obj[n] is not None else None
                for n in self._names
            )

    spark.udtf.register("extract_fields", udtf(ExtractFields))
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    ev.createOrReplaceTempView("events_udtf_view")
    return spark.sql(
        """
        SELECT e.event_id, s.k, s.missing
        FROM events_udtf_view e,
             LATERAL extract_fields(e.props, 'k,missing') s
        """
    )


MAPINARROW_ORACLE = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS linenumber,
  CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
    AS revenue_cents
FROM lineitem WHERE l_quantity >= 45
"""


@query("udf_mapinarrow", oracle=MAPINARROW_ORACLE, category="udf")
def udf_mapinarrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow (iterator of pyarrow RecordBatch -> RecordBatch):
    the zero-copy Arrow-native leg of the §2.11 matrix — no pandas
    materialization at all, the batch columns stay Arrow buffers and
    the math runs in pyarrow.compute kernels. Same IEEE float64
    expression tree as the SQL twin (multiply, multiply, add, floor),
    so the integer cents match exactly.

    Use this shape over mapInPandas when the Python step is a
    columnar kernel (codec, compression, hashing) — pandas adds a
    copy and dtype coercions this path never pays."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def cents(batches):
        for b in batches:
            price = pc.cast(b.column("l_extendedprice"), pa.float64())
            disc = pc.cast(b.column("l_discount"), pa.float64())
            rev = pc.multiply(price, pc.subtract(pa.scalar(1.0), disc))
            cents_col = pc.cast(
                pc.floor(pc.add(pc.multiply(rev, pa.scalar(100.0)), pa.scalar(0.5))),
                pa.int64(),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("l_orderkey"),
                    pc.cast(b.column("l_linenumber"), pa.int64()),
                    cents_col,
                ],
                names=["l_orderkey", "linenumber", "revenue_cents"],
            )

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") >= 45
    ).select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
    return li.mapInArrow(
        cents, schema="l_orderkey bigint, linenumber bigint, revenue_cents bigint"
    )


ARROW_UDF_ORACLE = """
SELECT o_orderkey,
  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) % 97 AS cents_bucket
FROM orders WHERE o_orderstatus = 'O' AND o_totalprice > 400000
"""


@query("udf_arrow_scalar", oracle=ARROW_UDF_ORACLE, category="udf")
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python scalar UDF (``useArrow=True``, Spark
    3.5+/4): the same per-row signature as udf_row_scalar but the
    executor⇄Python transfer is Arrow record batches instead of
    pickled rows — the drop-in upgrade for legacy row UDFs that can't
    be vectorized (pandas_udf remains the hot-path tool; this closes
    the serialization gap for the rest). Python ``int()`` truncation
    equals SQL floor for the positive product; the +0.5 pre-add makes
    both sides round-half-up in the same double arithmetic."""

    def cents_bucket(total: float) -> int:
        return int(total * 100 + 0.5) % 97

    fn = F.udf(cents_bucket, "bigint", useArrow=True)
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 400000))
        .select("o_orderkey", fn("o_totalprice").alias("cents_bucket"))
    )


COGROUPED_ORACLE = """
WITH p AS (
  SELECT user_id, COUNT(*) AS n_p,
         SUM(CAST(floor(value * 1e6) AS BIGINT)) AS pm
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
), c AS (
  SELECT user_id, COUNT(*) AS n_c,
         SUM(CAST(floor(value * 1e6) AS BIGINT)) AS cm
  FROM events WHERE event_type = 'click' GROUP BY user_id
)
SELECT COALESCE(p.user_id, c.user_id) AS user_id,
       CAST(COALESCE(p.n_p, 0) AS BIGINT) AS n_purchase,
       CAST(COALESCE(c.n_c, 0) AS BIGINT) AS n_click,
       CAST(COALESCE(p.pm, 0) AS BIGINT) AS purchase_micro,
       CAST(COALESCE(c.cm, 0) AS BIGINT) AS click_micro
FROM p FULL OUTER JOIN c ON p.user_id = c.user_id
"""


@query("udf_cogrouped_stats", oracle=COGROUPED_ORACLE, category="udf")
def udf_cogrouped_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map pandas UDF (``GroupedData.cogroup(...)
    .applyInPandas``, the last §2.11 grouping surface): purchase and
    click events cogrouped per user; BOTH groups arrive as pandas
    frames in one Python call — the shape for per-key reconciliation
    / merge_asof-style alignment that a join can't express row-wise.
    A key present on only one side still fires the function (the
    other frame arrives empty) — that outer semantics is the real
    machinery test and is additionally pinned on constructed
    one-sided keys in tests/test_udf_surfaces.py. Money sums are
    floor-scaled to integer micro-units inside the worker (numpy
    int64 — order-independent, exact vs the SQL twin; CLAUDE.md money
    rule). Scale shape: one shuffle per side on the cogroup key, no
    driver collect; group state is bounded by per-user event counts.

    SELF-COGROUP TRAP (caught by the 100x probe, reproduced at sf0.1
    under the repo session): when BOTH cogroup sides derive from the
    SAME scan and share column NAMES, the non-key column can arrive
    COLUMN-PRUNED on one side (right frame = 13 rows, ['user_id']
    only — same-name attribute resolution across the shared subplan),
    plan-sensitively: sf0.01/8-partition runs were green, the default
    session at sf0.1 failed every run. Fix: give each side DISTINCT
    value column names before the cogroup — collision becomes
    impossible and the pruning resolves per side. Pinned in
    tests/test_udf_surfaces.py::test_self_cogroup_distinct_names."""
    import numpy as np
    import pandas as pd

    def reconcile(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        def micro(pdf, col):
            if len(pdf) == 0:
                return 0
            return int(np.floor(pdf[col].to_numpy() * 1e6).astype("int64").sum())

        return pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_purchase": [len(left)],
                "n_click": [len(right)],
                "purchase_micro": [micro(left, "purchase_value")],
                "click_micro": [micro(right, "click_value")],
            }
        )

    ev = load_table(spark, sf_dir, "events")
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("value").alias("purchase_value")
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("value").alias("click_value")
    )
    return pur.groupBy("user_id").cogroup(clk.groupBy("user_id")).applyInPandas(
        reconcile,
        schema=(
            "user_id bigint, n_purchase bigint, n_click bigint, "
            "purchase_micro bigint, click_micro bigint"
        ),
    )


GROUPED_ARROW_ORACLE = """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT) AS value_micro,
       CAST(MIN(event_id) AS BIGINT) AS min_event_id,
       CAST(MAX(event_id) AS BIGINT) AS max_event_id
FROM events GROUP BY user_id
"""


@query("udf_grouped_applyinarrow", oracle=GROUPED_ARROW_ORACLE, category="udf")
def udf_grouped_applyinarrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map in raw Arrow (``GroupedData.applyInArrow``, Spark
    4.x): the whole group arrives as one ``pyarrow.Table`` with no
    pandas conversion — the zero-copy leg of the grouped-map matrix
    (applyInPandas pays the Arrow→pandas→Arrow round trip per group).
    Per-user event stats; micro-unit money accumulation in int64
    (pc.sum over a cast column — exact, order-independent), so the
    SQL oracle checks the Arrow machinery end-to-end. Scale shape:
    one hash shuffle on user_id; group memory bounded by the largest
    single user."""
    import pyarrow as pa
    import pyarrow.compute as pc

    # NOTE: no type annotations on `stats` — under `from __future__ import
    # annotations` the stringified hints make pyspark's
    # infer_group_arrow_eval_type_from_func raise (and group_ops then
    # trips an UnboundLocalError, Spark 4.1.2). Un-annotated functions
    # take the clean default path; key-passing is decided by arity.
    def stats(key, tbl):
        micro = pc.cast(pc.floor(pc.multiply(tbl.column("value"), 1e6)), pa.int64())
        mm = pc.min_max(tbl.column("event_id"))
        return pa.table(
            {
                "user_id": pa.array([key[0].as_py()], pa.int64()),
                "n_events": pa.array([tbl.num_rows], pa.int64()),
                "value_micro": pa.array([pc.sum(micro).as_py()], pa.int64()),
                "min_event_id": pa.array([mm["min"].as_py()], pa.int64()),
                "max_event_id": pa.array([mm["max"].as_py()], pa.int64()),
            }
        )

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    return ev.groupBy("user_id").applyInArrow(
        stats,
        schema=(
            "user_id bigint, n_events bigint, value_micro bigint, "
            "min_event_id bigint, max_event_id bigint"
        ),
    )
