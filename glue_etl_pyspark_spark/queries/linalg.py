"""Distributed linear algebra over the embeddings table: exact
fixed-point Gram matrix + dominant-eigenvector power iteration (the
PCA/top-principal-component primitive a training-data pipeline uses
for whitening checks, drift monitoring, and cheap dimensionality
diagnostics).

100 TB design: the ONLY corpus-sized work is the Gram accumulation —
a single map-side-combinable groupBy producing a CONSTANT 64x64 = 4096
cell sketch (same shuffle-shrinker shape as the CMS sketch). The
power iteration itself runs on that constant-size result: collecting
4096 bounded rows to the driver is the packing-bases precedent
(bounded constant intermediate -> literal data), not a scale
anti-pattern. Per-row Gram terms are floored to a 1e-6 grid BEFORE
summing, so the aggregate is an order-invariant BIGINT sum that stays
inside int64 even at 2e10 rows (|t| <= ~3e5 per cell per row ->
~6e15 at 100 TB < 2^63).

Cross-engine determinism: every double op is a FIXED expression tree
(products, divisions) evaluated identically under IEEE-754 by Spark,
DuckDB, and the driver's Python floats; only SUM order could drift,
and every sum here is an integer sum. Per-round renormalization
floors to the 1e-9 grid with the division inside
(floor(w / wmax * 1e9) / 1e9), mirroring the PageRank discipline.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import query

_DIMS = 64
_ITERS = 6
_GRID = 1_000_000  # per-row Gram term grid (1e-6)



def gram_triangle(e: DataFrame) -> DataFrame:
    """Upper-triangle (i <= j) fixed-point Gram aggregate over a frame
    with one array<double> column ``x``: per-row terms floored to the
    1e-6 grid, summed as order-invariant BIGINTs. Symmetry (IEEE
    multiplication commutes bit-exactly) lets the caller mirror the
    triangle, halving the explode volume and shuffle input. slice()
    is 1-based; the inner index j0 is an offset, so j = i + j0."""
    pairs = e.select(
        F.explode(
            F.flatten(
                F.transform(
                    "x",
                    lambda xi, i: F.transform(
                        F.slice("x", i + 1, F.lit(_DIMS) - i),
                        lambda xj, j0: F.struct(
                            i.alias("i"),
                            (i + j0).alias("j"),
                            F.floor(xi * xj * F.lit(float(_GRID)))
                            .cast("bigint")
                            .alias("t"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.i", "p.j", "p.t")
    return pairs.groupBy("i", "j").agg(F.sum("t").alias("gv"))


def gram_triangle_np(e: DataFrame) -> DataFrame:
    """Arrow-batched numpy twin of :func:`gram_triangle` (the GEMM
    rerank precedent): per batch, floor the per-row outer products to
    the 1e-6 grid and partial-sum them in float64 — exact, because
    per-batch partials stay under 2^53 (|t| <= ~3e5 per cell per row
    x <=10k Arrow rows ~ 3e9) — then one tiny groupBy folds the
    per-batch 2080-cell triangles. Bit-identical to the expression
    path (pinned in tests/test_linalg.py) and ~5x faster: the 20M
    struct explode becomes three numpy ops per batch."""
    import numpy as np
    import pandas as pd

    iu_i, iu_j = np.triu_indices(_DIMS)
    chunk = 1024  # bounds outer-product memory at 32 MB per chunk

    def batches(it):
        for pdf in it:
            if pdf.empty:
                continue
            X = np.array(pdf["x"].tolist(), dtype="float64")
            acc = np.zeros((_DIMS, _DIMS), dtype="int64")
            for lo in range(0, X.shape[0], chunk):
                C = X[lo : lo + chunk]
                # per-chunk partial sums stay < 2^53: exact in float64
                acc += (
                    np.floor(C[:, :, None] * C[:, None, :] * float(_GRID))
                    .sum(axis=0)
                    .astype("int64")
                )
            yield pd.DataFrame(
                {"i": iu_i.astype("int64"), "j": iu_j.astype("int64"),
                 "t": acc[iu_i, iu_j]}
            )

    parts = e.mapInPandas(batches, schema="i long, j long, t long")
    return parts.groupBy("i", "j").agg(F.sum("t").alias("gv"))


def _unroll_power_oracle() -> str:
    """Unrolled power-iteration CTE chain (PageRank-oracle idiom):
    v0 = all-ones, each round w = G_int . v with per-term integer
    floor, then infinity-norm renormalize on the 1e-9 grid."""
    parts = [
        f"""WITH g AS (
  SELECT ii.i AS i, jj.j AS j,
    CAST(SUM(CAST(floor(CAST(e.embedding[ii.i + 1] AS DOUBLE)
                        * CAST(e.embedding[jj.j + 1] AS DOUBLE)
                        * {float(_GRID)!r}) AS BIGINT)) AS BIGINT) AS gv
  FROM embeddings e,
       (SELECT i FROM range(0, {_DIMS}) t(i)) ii,
       (SELECT j FROM range(0, {_DIMS}) t(j)) jj
  GROUP BY ii.i, jj.j
),
v0 AS (SELECT j, CAST(1.0 AS DOUBLE) AS vd FROM range(0, {_DIMS}) t(j))"""
    ]
    for r in range(1, _ITERS + 1):
        parts.append(
            f"""w{r} AS (
  SELECT g.i AS i,
    CAST(SUM(CAST(floor(CAST(g.gv AS DOUBLE) * v.vd) AS BIGINT)) AS BIGINT) AS w
  FROM g JOIN v{r - 1} v ON g.j = v.j GROUP BY g.i
),
m{r} AS (SELECT MAX(ABS(CAST(w AS DOUBLE))) AS wmax FROM w{r}),
v{r} AS (
  SELECT w{r}.i AS j,
    floor(CAST(w{r}.w AS DOUBLE) / m{r}.wmax * 1e9) / 1e9 AS vd
  FROM w{r}, m{r}
)"""
        )
    final = (
        f"SELECT v{_ITERS}.j AS dim, v{_ITERS}.vd AS component,\n"
        f"  CAST(m{_ITERS}.wmax AS BIGINT) AS eigval_raw\n"
        f"FROM v{_ITERS}, m{_ITERS}"
    )
    return ",\n".join(parts) + "\n" + final


PCA_POWER_ORACLE = _unroll_power_oracle()


@query("embedding_pca_power", oracle=PCA_POWER_ORACLE, category="llm-linalg")
def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction of the embedding corpus by power
    iteration on an exact fixed-point Gram matrix.

    Stage 1 (distributed, corpus-sized): each row contributes
    floor(x_i * x_j * 1e6) for every i <= j pair (symmetry halves the
    volume; the driver mirrors) via the Arrow-batched numpy kernel
    (gram_triangle_np — bit-identical to the pure-expression
    gram_triangle, pinned in tests/test_linalg.py), one narrow pass
    with no shuffle before the 2080-cell aggregate. Stage 2 (constant
    size): 6 rounds of w = G.v with per-term integer flooring and
    infinity-norm renormalization on the 1e-9 grid, computed on the
    driver over the collected 4096-row sketch (bounded literal-data
    precedent; Python doubles execute the IDENTICAL IEEE expression
    tree the oracle's unrolled CTE chain runs). Output: the 64
    grid-pinned eigenvector components plus the raw scaled
    eigenvalue estimate — fully value-oracled."""
    e = load_table(spark, sf_dir, "embeddings").select(
        F.transform("embedding", lambda x: x.cast("double")).alias("x")
    )
    tri_rows = gram_triangle_np(e).collect()
    gram = {}
    for r in tri_rows:
        gram[(r["i"], r["j"])] = r["gv"]
        gram[(r["j"], r["i"])] = r["gv"]
    assert len(gram) == _DIMS * _DIMS

    v = [1.0] * _DIMS
    wmax = 0.0
    for _ in range(_ITERS):
        w = [
            sum(math.floor(float(gram[(i, j)]) * v[j]) for j in range(_DIMS))
            for i in range(_DIMS)
        ]
        wmax = max(abs(float(wi)) for wi in w)
        v = [math.floor(float(wi) / wmax * 1e9) / 1e9 for wi in w]

    out = [(i, v[i], int(wmax)) for i in range(_DIMS)]
    return spark.createDataFrame(
        out, schema="dim bigint, component double, eigval_raw bigint"
    )


ROBUST_SCALE_ORACLE = f"""
WITH v AS (
  SELECT i.i AS dim, vec_id,
    CAST(floor(CAST(embedding[i.i + 1] AS DOUBLE) * 1000000) AS BIGINT) AS micro
  FROM embeddings, (SELECT i FROM range(0, {_DIMS}) t(i)) i
), r AS (
  SELECT dim, micro,
    ROW_NUMBER() OVER (PARTITION BY dim ORDER BY micro, vec_id) AS rk,
    COUNT(*) OVER (PARTITION BY dim) AS n
  FROM v
)
SELECT CAST(dim AS BIGINT) AS dim,
  CAST(MAX(CASE WHEN rk = (n + 3) // 4 THEN micro END) AS BIGINT) AS q25_micro,
  CAST(MAX(CASE WHEN rk = (n + 1) // 2 THEN micro END) AS BIGINT) AS med_micro,
  CAST(MAX(CASE WHEN rk = (3 * n + 3) // 4 THEN micro END) AS BIGINT) AS q75_micro,
  CAST(MAX(CASE WHEN rk = (3 * n + 3) // 4 THEN micro END)
       - MAX(CASE WHEN rk = (n + 3) // 4 THEN micro END) AS BIGINT) AS iqr_micro
FROM r GROUP BY dim
"""


@query("embedding_robust_scale", oracle=ROBUST_SCALE_ORACLE, category="llm-linalg")
def embedding_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-dimension scaling statistics (median / IQR — the
    outlier-insensitive alternative to mean/std normalization): exact
    PICKED order statistics over each dimension's 1e-6-grid integer
    values, ranks broken by vec_id (unique), so both engines select
    the identical element — no interpolation, no float quantile
    estimator to disagree on (the events_rolling_median discipline at
    corpus scale).

    Scale: one narrow posexplode (64 rows per vector), then a window
    per dim — parallelism = dimension count, each partition one
    dimension's values. For very large corpora swap the exact pick
    for the deterministic-sample quantiles path
    (agg_quantiles_sampled); this exact twin stays the correctness
    anchor."""
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id",
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "dim", "xv"
        ),
    ).select(
        F.col("dim").cast("bigint").alias("dim"),
        "vec_id",
        F.floor(F.col("xv") * 1e6).cast("bigint").alias("micro"),
    )
    w = Window.partitionBy("dim").orderBy("micro", "vec_id")
    wn = Window.partitionBy("dim")
    r = v.select(
        "dim",
        "micro",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    picks = r.groupBy("dim").agg(
        F.max(F.when(F.col("rk") == F.expr("(n + 3) DIV 4"), F.col("micro")))
        .cast("bigint")
        .alias("q25_micro"),
        F.max(F.when(F.col("rk") == F.expr("(n + 1) DIV 2"), F.col("micro")))
        .cast("bigint")
        .alias("med_micro"),
        F.max(F.when(F.col("rk") == F.expr("(3 * n + 3) DIV 4"), F.col("micro")))
        .cast("bigint")
        .alias("q75_micro"),
    )
    return picks.select(
        "dim",
        "q25_micro",
        "med_micro",
        "q75_micro",
        (F.col("q75_micro") - F.col("q25_micro")).alias("iqr_micro"),
    )
