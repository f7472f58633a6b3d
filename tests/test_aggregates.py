

def test_quantile_bisect_matches_order_statistics(spark, tmp_path):
    """The domain-bisection selector must return the exact
    ceil(q*n)-th order statistic (quantile_disc semantics) on
    adversarial small groups: single row, all-duplicates, even/odd n,
    values whose cumulative counts jump past k."""
    import pandas as pd

    groups = {
        "A": [5],                          # single row
        "N": [7, 7, 7, 7],                 # all duplicates, even n
        "R": [1, 1, 1, 9, 9, 100, 100],    # duplicate runs, odd n
    }
    rows = [
        (g, float(v) / 100.0)  # query floors v*100+0.5 back to cents
        for g, vs in groups.items()
        for v in vs
    ]
    import os

    d = str(tmp_path / "qb")
    os.makedirs(d, exist_ok=True)
    pd.DataFrame(
        {
            "l_returnflag": [r[0] for r in rows],
            "l_extendedprice": [r[1] for r in rows],
        }
    ).to_parquet(f"{d}/lineitem.parquet", index=False)

    from glue_etl_pyspark_spark.registry import load_all

    out = {
        r.l_returnflag: (r.n_rows, r.median_cents, r.p90_cents)
        for r in load_all()["quantile_bisect_exact"].fn(spark, d).collect()
    }
    for g, vs in groups.items():
        s, n = sorted(vs), len(vs)
        k50, k90 = (n + 1) // 2, (9 * n + 9) // 10
        assert out[g] == (n, s[k50 - 1], s[k90 - 1]), g
