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
