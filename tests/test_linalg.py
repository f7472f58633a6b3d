"""PCA power-iteration pins: the numpy Gram kernel must be
bit-identical to the pure-expression path (same floor-to-grid
semantics, same integer sums), and the query's eigenvector must be a
unit-scale direction consistent with its own Gram."""

from __future__ import annotations

from pyspark.sql import functions as F

from glue_etl_pyspark_spark.io import load_table
from glue_etl_pyspark_spark.queries.linalg import (
    _DIMS,
    gram_triangle,
    gram_triangle_np,
)


def _frame(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        F.transform("embedding", lambda x: x.cast("double")).alias("x")
    )


def test_gram_np_equals_expression_path(spark, sf_dir):
    e = _frame(spark, sf_dir)
    expr = {(r["i"], r["j"]): r["gv"] for r in gram_triangle(e).collect()}
    np_ = {(r["i"], r["j"]): r["gv"] for r in gram_triangle_np(e).collect()}
    assert len(expr) == _DIMS * (_DIMS + 1) // 2
    assert expr == np_


def test_gram_np_stable_across_partitionings(spark, sf_dir):
    """Partial sums fold per Arrow batch: any repartitioning must give
    the identical integer cells (order-invariance of the BIGINT sum)."""
    e = _frame(spark, sf_dir)
    base = {(r["i"], r["j"]): r["gv"] for r in gram_triangle_np(e).collect()}
    for n in (1, 7):
        alt = {
            (r["i"], r["j"]): r["gv"]
            for r in gram_triangle_np(e.repartition(n)).collect()
        }
        assert alt == base, f"gram differs at repartition({n})"


def test_pca_eigvec_is_dominant_direction(spark, sf_dir):
    """The returned components must have infinity-norm 1 (the
    renormalization invariant) and a positive eigenvalue estimate."""
    from glue_etl_pyspark_spark.registry import load_all

    rows = load_all()["embedding_pca_power"].fn(spark, sf_dir).collect()
    assert len(rows) == _DIMS
    comps = [r["component"] for r in rows]
    assert max(abs(c) for c in comps) == 1.0
    assert rows[0]["eigval_raw"] > 0


def _run_query(spark, sf_dir, name):
    from glue_etl_pyspark_spark.registry import load_all

    return load_all()[name].fn(spark, sf_dir)


def test_closing_ops_repeated_run_determinism(spark, sf_dir):
    """Driver-collect determinism stress (the r4 flake lesson) for the
    closing round-5 ops that ship literal data back into the plan:
    skyline bucket bases, PCA gram/eigvec, and the epoch-shuffle
    window must be bit-identical across shuffle widths."""
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    for name in (
        "skyline_parts_frontier",
        "embedding_pca_power",
        "epoch_shuffle_shards",
    ):
        runs = []
        try:
            for parts in ("2", "32", "200"):
                spark.conf.set("spark.sql.shuffle.partitions", parts)
                runs.append(
                    sorted(map(tuple, _run_query(spark, sf_dir, name).collect()))
                )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", orig)
        assert all(r == runs[0] for r in runs[1:]), (
            f"{name} output varies with shuffle width"
        )
