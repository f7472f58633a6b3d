"""Unit gates for the dialect-portable sketch hash family."""

from __future__ import annotations

import hashlib

import duckdb

from glue_etl_pyspark_spark.queries.sketches import _md5_mod


def _ref(seed: str, key, mod: int) -> int:
    h = hashlib.md5(f"{seed}:{key}".encode()).hexdigest()
    return int(h[:6], 16) % mod


def test_md5_mod_matches_hashlib_in_duckdb():
    con = duckdb.connect()
    for seed in ("s0", "s1", "bf0", "bf1"):
        for key in (0, 1, 42, 65535, 123456789):
            frag = _md5_mod(str(key), seed, 65536)
            [(got,)] = con.sql(f"SELECT {frag}").fetchall()
            assert got == _ref(seed, key, 65536), (seed, key)


def test_md5_mod_matches_hashlib_in_spark(spark):
    frags = [
        (seed, key, _md5_mod(str(key), seed, 65536))
        for seed in ("s0", "bf1")
        for key in (7, 4242, 999999)
    ]
    sql = "SELECT " + ", ".join(f"{f} AS c{i}" for i, (_, _, f) in enumerate(frags))
    [row] = spark.sql(sql).collect()
    for i, (seed, key, _) in enumerate(frags):
        assert row[f"c{i}"] == _ref(seed, key, 65536), (seed, key)


def test_hashed_shingles_edge_cases(spark):
    """Short docs (< n tokens) yield EMPTY shingle arrays (the
    shingles() contract), never nulls or down-counting sequences; and
    hashed shingles are position-sensitive."""
    from pyspark.sql import functions as F

    from glue_etl_pyspark_spark.functions.text import (
        hashed_shingles,
        token_hashes,
        tokenize_ws,
    )

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b"), (3, ""), (4, "b a c d e")],
        "id int, text string",
    ).withColumn("__th", token_hashes(tokenize_ws("text")))
    out = {
        r.id: r.sh
        for r in df.select("id", hashed_shingles("__th", 4).alias("sh")).collect()
    }
    assert len(out[1]) == 2 and len(out[4]) == 2
    assert out[2] == [] and out[3] == []
    assert out[1] != out[4], "order-insensitive collision: a b c d == b a c d"
    assert len(set(out[1])) == 2


def test_hll_portable_error_bound(spark, sf_dir):
    """The 64-register HLL estimate must land within 30% of the exact
    distinct (standard error 1.04/sqrt(64) ~ 13%; 30% ~ 2.3 sigma) and
    the rank CASE chain must agree with a pure-Python HLL reference."""
    from glue_etl_pyspark_spark.registry import load_all

    row = load_all()["agg_hll_portable"].fn(spark, sf_dir).collect()[0]
    est = row.est_milli / 1000.0
    assert abs(est - row.exact_distinct) / row.exact_distinct < 0.30

    # cross-check the whole sketch against hashlib-driven Python
    import duckdb

    keys = [
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT o_custkey FROM '{sf_dir}/orders.parquet'"
        ).fetchall()
    ]
    m = 64
    regs = [0] * m
    for k in keys:
        b = _ref("hb", k, m)
        w = _ref("hw", k, 16777216)
        rho = 25 if w == 0 else (24 - w.bit_length() + 1)
        regs[b] = max(regs[b], rho)
    s = sum(1.0 / (1 << r) for r in regs)
    e_raw = eval(repr(0.709 * m * m)) / s
    v = regs.count(0)
    expect = m * __import__("math").log(m / v) if (e_raw <= 2.5 * m and v > 0) else e_raw
    assert row.est_milli == int(expect * 1000 // 1)


def test_hll_grouped_error_bound(spark, sf_dir):
    """Every per-group HLL estimate within 30% of its exact count."""
    from glue_etl_pyspark_spark.registry import load_all

    rows = load_all()["agg_hll_grouped"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        est = r.est_milli / 1000.0
        assert abs(est - r.exact_distinct) / r.exact_distinct < 0.30, r


def test_sampled_quantiles_track_exact(spark, sf_dir):
    """The 12.5% hash-sample quantiles must sit near the exact twins
    (l_quantity is uniform 1..50: generous +/-4 tolerance) and the
    sample fraction must be near 1/8."""
    from glue_etl_pyspark_spark.registry import load_all

    reg = load_all()
    sampled = {r.l_returnflag: r for r in reg["agg_quantiles_sampled"].fn(spark, sf_dir).collect()}
    exact = {r.l_returnflag: r for r in reg["agg_quantiles"].fn(spark, sf_dir).collect()}
    total = sum(r.n_sampled for r in sampled.values())
    from glue_etl_pyspark_spark.io import load_table

    n_all = load_table(spark, sf_dir, "lineitem").count()
    assert abs(total / n_all - 0.125) < 0.02
    for flag, s in sampled.items():
        e = exact[flag]
        assert abs(s.median_qty - e.median_qty) <= 4
        assert abs(s.q1_qty - e.q1_qty) <= 4
        assert abs(s.q3_qty - e.q3_qty) <= 4


def test_md5_mod_spark_fast_twin_is_bit_identical(spark):
    """The conv()-based Spark hot-path hash must equal the portable
    polynomial on every value (it feeds value-oracled queries)."""
    from pyspark.sql import functions as F

    from glue_etl_pyspark_spark.queries.sketches import _md5_mod, _md5_mod_spark

    df = spark.range(20000).selectExpr("cast(id as string) AS k")
    poly = _md5_mod("k", "tw", 1 << 24)
    fast = _md5_mod_spark("k", "tw", 1 << 24)
    assert df.filter(F.expr(f"{poly} <> {fast}")).count() == 0
    # and at every md5 offset the _at twin matches too
    from glue_etl_pyspark_spark.queries.sketches import (
        _md5_mod_at,
        _md5_mod_at_spark,
    )

    for off in (0, 6, 12, 18):
        p_at = _md5_mod_at("k", "tw", 1 << 24, off)
        f_at = _md5_mod_at_spark("k", "tw", 1 << 24, off)
        assert df.filter(F.expr(f"{p_at} <> {f_at}")).count() == 0


def test_join_cardinality_estimate_is_one_sided(spark, sf_dir):
    """CMS inner product must never underestimate the true join size
    (hash collisions only ADD cross terms)."""
    from glue_etl_pyspark_spark.registry import load_all

    [row] = load_all()["sketch_join_cardinality"].fn(spark, sf_dir).collect()
    assert row.est_join_rows >= row.true_join_rows
    assert row.overcount == row.est_join_rows - row.true_join_rows


def test_hll_overlap_error_bound(spark, sf_dir):
    """Inclusion-exclusion overlap from three 64-register sketches
    compounds up to ~3 per-sketch standard errors (1.04/sqrt(64) ~
    13% each), so the gate is |est - exact| <= 35% OF THE UNION
    estimate per pair (measured worst 18.3% at sf0.01, 16.2% at
    sf0.1). Also pins the structural invariants: union >= each side
    (register-wise MAX can only grow the estimate) and 10 pairs from
    the 5-type domain."""
    from glue_etl_pyspark_spark.registry import load_all

    rows = load_all()["sketch_hll_overlap"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.est_union_milli >= max(r.est_a_milli, r.est_b_milli)
        err = abs(r.est_overlap_milli / 1000.0 - r.exact_overlap)
        assert err <= 0.35 * (r.est_union_milli / 1000.0), (
            f"{r.type_a}x{r.type_b}: est {r.est_overlap_milli / 1000.0} "
            f"vs exact {r.exact_overlap} (union {r.est_union_milli / 1000.0})"
        )
