"""Gates for the round-5 profiling/maintenance queries and the new
analytics/LLM gating ops beyond their oracle parity rows: selectivity
pins, structural invariants, and cross-query consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from glue_etl_pyspark_spark.io import load_table
from glue_etl_pyspark_spark.plans import explain_str
from glue_etl_pyspark_spark.registry import load_all


def _df(spark, sf_dir, name):
    return load_all()[name].fn(spark, sf_dir)


def test_profile_stats_match_table_facts(spark, sf_dir):
    rows = {r["col_name"]: r for r in _df(spark, sf_dir, "profile_table_stats").collect()}
    n = load_table(spark, sf_dir, "orders").count()
    assert set(rows) == {
        "o_orderkey", "o_custkey", "o_totalprice",
        "o_orderdate", "o_orderstatus", "o_orderpriority",
    }
    for r in rows.values():
        assert r["n_rows"] == n
        assert 0 <= r["n_null"] <= n
        assert 1 <= r["n_distinct"] <= n
    # primary key: unique, never null
    assert rows["o_orderkey"]["n_distinct"] == n
    assert rows["o_orderkey"]["n_null"] == 0


def test_snapshot_diff_class_arithmetic(spark, sf_dir):
    by = {r["change_type"]: r["n"] for r in _df(spark, sf_dir, "snapshot_diff").collect()}
    assert set(by) == {"added", "removed", "changed", "unchanged"}
    o = load_table(spark, sf_dir, "orders")
    n_old = o.filter("o_orderkey % 97 <> 0").count()
    n_new = o.filter("o_orderkey % 89 <> 0").count()
    assert by["removed"] + by["changed"] + by["unchanged"] == n_old
    assert by["added"] + by["changed"] + by["unchanged"] == n_new


def test_zonemap_prunes_most_zones(spark, sf_dir):
    from glue_etl_pyspark_spark.queries.profiling import zone_selectivity

    kept, total = zone_selectivity(spark, sf_dir)
    assert total >= 10, f"fixture should yield many zones, got {total}"
    # ts correlates with event_id, so a 2-day window keeps a sliver
    assert kept / total <= 0.4, f"pruning too weak: {kept}/{total}"
    plan = explain_str(_df(spark, sf_dir, "scan_zonemap_prune"))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_decayed_popularity_bounds(spark, sf_dir):
    rows = _df(spark, sf_dir, "events_decayed_popularity").collect()
    e = load_table(spark, sf_dir, "events")
    n_events = e.count()
    assert sum(r["n"] for r in rows) == n_events
    # weight <= 1e6, so decayed sum <= raw cents * 1e6 (and > 0: the
    # horizon covers the newest 30 days of a 30-day fixture)
    cents = e.select(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")).alias("c")
    ).collect()[0]["c"]
    tot = sum(r["decayed_cents_millionths"] for r in rows)
    assert 0 < tot <= cents * 1_000_000


def test_attribution_accounts_every_purchase(spark, sf_dir):
    rows = _df(spark, sf_dir, "events_attribution_last_touch").collect()
    e = load_table(spark, sf_dir, "events")
    n_purch = e.filter("event_type = 'purchase'").count()
    assert sum(r["n_purchases"] for r in rows) == n_purch
    channels = {r["channel"] for r in rows}
    assert "purchase" not in channels, "a purchase can never be its own touch"
    assert channels <= {"click", "view", "signup", "error", "direct"}


def test_substring_spans_coverage_invariants(spark, sf_dir):
    df = _df(spark, sf_dir, "dedup_substring_spans")
    bad = df.filter(
        (F.col("covered_tokens") < 0)
        | (F.col("covered_tokens") > F.col("n_tokens"))
        | (F.col("dup_ppm") < 0)
        | (F.col("dup_ppm") > 1_000_000)
    ).count()
    assert bad == 0
    # the synthetic corpus plants near-duplicates: duplicated 8-gram
    # spans must exist, and no document may be flagged beyond its
    # shingle capacity
    n_dup_docs = df.filter("covered_tokens > 0").count()
    assert n_dup_docs > 0, "expected duplicated substrings in fixture"
    n_docs = df.count()
    assert n_dup_docs < n_docs, "not every doc should be duplicated"


def test_quality_classifier_gate_bites_not_everything(spark, sf_dir):
    df = _df(spark, sf_dir, "quality_classifier_linear")
    n = df.count()
    kept = df.filter("keep = 1").count()
    assert 0.2 * n <= kept <= 0.8 * n, f"threshold off-median: {kept}/{n}"
    # keep is exactly the threshold predicate on z (no drift between
    # the two expressions)
    from glue_etl_pyspark_spark.queries.llm_quality import _CLS_THRESHOLD

    mismatch = df.filter(
        (F.col("z_scaled") >= _CLS_THRESHOLD) != (F.col("keep") == 1)
    ).count()
    assert mismatch == 0


def test_linkage_recovers_every_planted_match(spark, sf_dir):
    df = _df(spark, sf_dir, "linkage_fuzzy_match")
    c = load_table(spark, sf_dir, "customer")
    planted = {r["c_custkey"] for r in c.filter("c_custkey % 7 = 0").collect()}
    exact = {
        r["clean_key"]
        for r in df.filter(F.col("clean_key") == F.col("dirty_key")).collect()
    }
    assert exact == planted, "every dirty record must link back to its source"
    # distances are within the declared threshold
    assert df.filter("dist > 1").count() == 0


def test_dau_wau_ordering_and_coverage(spark, sf_dir):
    rows = _df(spark, sf_dir, "events_dau_wau").collect()
    e = load_table(spark, sf_dir, "events")
    n_days = e.select(F.to_date("ts")).distinct().count()
    n_users = e.select("user_id").distinct().count()
    assert len(rows) == n_days
    for r in rows:
        assert r["dau"] <= r["wau"] <= n_users


def test_drift_psi_matches_python_reference(spark, sf_dir):
    """Third-engine check for the ln-accumulation discipline: the PSI
    from exact Python floats (same floor-to-1e-9 per term) must equal
    Spark's bit-for-bit (the text_bigram_lm_score precedent)."""
    import math
    from collections import Counter

    from glue_etl_pyspark_spark.queries.analytics import (
        _PSI_BINS, _PSI_SMOOTH, _PSI_SPLIT, _PSI_WIDTH,
    )

    rows = load_table(spark, sf_dir, "events").select(
        "event_type", "value", "ts"
    ).collect()
    import datetime

    split = datetime.datetime.fromisoformat(_PSI_SPLIT)
    c1, c2 = Counter(), Counter()
    types = set()
    for r in rows:
        b = min(int(r["value"] // _PSI_WIDTH), _PSI_BINS - 1)
        types.add(r["event_type"])
        (c1 if r["ts"] < split else c2)[(r["event_type"], b)] += 1
    S, B = _PSI_SMOOTH, _PSI_BINS
    expect = {}
    for t in types:
        t1 = sum(c1[(t, b)] for b in range(B))
        t2 = sum(c2[(t, b)] for b in range(B))
        acc = 0
        for b in range(B):
            n1, n2 = c1[(t, b)], c2[(t, b)]
            p1 = (n1 + S) / (t1 + S * B)
            p2 = (n2 + S) / (t2 + S * B)
            arg = ((n1 + S) * (t2 + S * B)) / ((n2 + S) * (t1 + S * B))
            acc += math.floor((p1 - p2) * math.log(arg) * 1e9)
        expect[t] = (t1, t2, acc)
    got = {
        r["event_type"]: (r["n_before"], r["n_after"], r["psi_e9"])
        for r in _df(spark, sf_dir, "events_drift_psi").collect()
    }
    assert got == expect


def test_embedding_pool_consistency(spark, sf_dir):
    rows = _df(spark, sf_dir, "embedding_pool_mean").collect()
    from glue_etl_pyspark_spark.io import load_table as _lt

    n_vec = _lt(spark, sf_dir, "embeddings").count()
    assert sum(r["n_chunks"] for r in rows) == n_vec
    for r in rows:
        assert r["dim"] == 64
        assert r["norm2_sum_e12"] >= 0
        # norm2 >= any single component's square contribution
        assert r["norm2_sum_e12"] >= r["c0_sum_e6"] * r["c0_sum_e6"]


def test_inverted_index_postings_consistency(spark, sf_dir):
    rows = _df(spark, sf_dir, "text_inverted_index").collect()
    for r in rows:
        entries = r["postings"].split(",")
        assert len(entries) == r["df"]
        doc_ids = [int(e.split(":")[0]) for e in entries]
        tfs = [int(e.split(":")[1]) for e in entries]
        assert doc_ids == sorted(doc_ids), "postings must be doc-ordered"
        assert sum(tfs) == r["cf"]
        assert all(tf >= 1 for tf in tfs)


def test_bot_burst_accounts_all_users(spark, sf_dir):
    rows = _df(spark, sf_dir, "events_bot_burst_detect").collect()
    e = load_table(spark, sf_dir, "events")
    assert sum(r["n_events"] for r in rows) == e.count()
    assert len(rows) == e.select("user_id").distinct().count()
    for r in rows:
        assert 1 <= r["burst_max_1h"] <= r["n_events"]
        assert r["is_flagged"] == (1 if r["burst_max_1h"] >= 3 else 0)


def test_hybrid_rrf_rank_bounds(spark, sf_dir):
    rows = _df(spark, sf_dir, "hybrid_search_rrf").collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r["bm25_rank"] <= 20 and 0 <= r["vec_rank"] <= 20
        assert r["bm25_rank"] > 0 or r["vec_rank"] > 0
        assert r["rrf_e9"] > 0
    # fused order is by the exact integer score
    scores = [r["rrf_e9"] for r in rows]
    assert scores == sorted(scores, reverse=True)
