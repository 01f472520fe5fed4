"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (TPC-H Q1-style pricing summary) on
  /root/testdata/sf0.001.
- ``queries()``: every implemented operator from SURVEY.md §2 /
  BASELINE.json north star, keyed by name.
- ``oracle_sql()``: DuckDB-equivalent SQL per query (None-oracle ops are
  omitted => rows-only check).

The builders live in barco_spark/operators/*; this module only wires
the registry into the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from barco_spark.registry import load_all

_QUERIES = load_all()

# ---------------------------------------------------------------------------
# Driver CORRECTNESS window — ROTATION POLICY (round 11, VERDICT r10 item 2)
#
# The driver hash-checks exactly the FIRST 50 entries of queries() in
# iteration order.  Round 10 curated that window once; round 11 makes the
# curation a standing policy so the whole 214-entry registry cycles through
# driver-oracle coverage instead of the same 50 being re-checked forever:
#
#   * CANARY_CORE (10 queries) is in EVERY round's window: the flagship
#     (entry() depends on q1), the two scan-heavy relational anchors the
#     bench watches hardest (q3/q5), one representative each of
#     scan/join/agg/window/setop, and the two broker-path anchors.  These
#     are the regression tripwires — any unexplained driver failure here is
#     a code defect until adjudicated otherwise.
#   * The other 40 slots ROTATE each round through the oracle-paired
#     registry entries that have never had a driver-oracle row (129 such
#     after r10), category-stratified so every round exercises dedup,
#     similarity, text, sampling, pipeline, window, streaming, and broker
#     surfaces.  When the never-checked pool drains, slots recycle to the
#     least-recently-checked (return cycle for the r10-dropped anchors).
#   * Invariants (pinned by tests/test_driver_contract.py): 50 unique
#     registry names; core ⊆ window; ≥60% disjoint from the previous
#     round's committed window; every rotating entry oracle-paired (≤1
#     rows-only entry allowed in the whole window); rotating entries must
#     be driver-unchecked before this round (while the pool lasts).
#
# Everything else still registers and still runs in bench + local parity;
# only the driver-checked subset rotates.
# ---------------------------------------------------------------------------

CANARY_CORE: list[str] = [
    "q1_pricing_summary",  # entry() flagship
    "q3_shipping_priority",
    "q5_region_revenue",
    "scan_filter_project",
    "join_broadcast_agg",
    "agg_distinct",
    "window_topk_per_group",
    "set_union_all",
    "events_exact_tokens",
    "events_bucket_offsets",
]

# The r10 committed window, kept for the disjointness invariant (this is
# exactly the key list of CORRECTNESS_r10.json): 33 relational/broker
# anchors + 17 LLM-pipeline flagships (16 oracle-paired, 1 rows-only).
WINDOW_R10: list[str] = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
    "scan_filter_project", "join_broadcast_agg", "join_left_outer",
    "join_semi", "join_anti", "join_range_interval", "join_full_outer",
    "join_null_safe", "agg_distinct", "agg_rollup", "agg_cube",
    "agg_grouping_sets", "sort_topk", "set_union_all", "set_intersect_all",
    "set_except_all", "scalar_string_math", "scalar_dates",
    "json_extract_agg", "variant_shred_stats", "map_functions",
    "subquery_scalar_avg", "subquery_correlated_exists",
    "q2_min_cost_supplier", "calendar_gap_fill", "interval_open_orders_daily",
    "events_exact_tokens", "events_bucket_offsets", "consumer_lag_report",
    "window_topk_per_group", "dedup_exact", "dedup_minhash_lsh",
    "cross_split_leakage", "ann_cosine_topk", "ann_recall_report",
    "ann_int8_recall", "graph_kcore_converged", "bm25_topdocs",
    "tfidf_top_terms", "mmr_diverse_rerank", "hybrid_rrf_retrieval",
    "curation_pipeline", "pretrain_corpus_pipeline", "pack_sequences",
    "decontaminate_ngram_overlap", "quality_filter_c4", "phash_image_dedup",
]

# Round-11 rotation: 40 never-driver-checked, all oracle-paired.  The
# first 12 are VERDICT r10 item 2's named tranche; the rest are
# category-stratified picks from the never-checked pool.
ROTATION_R11: list[str] = [
    # --- VERDICT-named tranche ---
    "semdedup_prune",
    "dedup_simhash_pairs",
    "fuzzy_match_blocked",
    "hard_negative_mining",
    "dsir_importance_weights",
    "bpe_merge_pairs",
    "span_corruption_stats",
    "vocab_coverage_report",
    "ann_matryoshka_recall",
    "kmv_distinct_sketch",
    "kmv_set_overlap",
    "decontaminate_bloom",
    # --- graph ---
    "pagerank_similarity_graph",
    "graph_triangle_census",
    # --- similarity ---
    "dedup_embedding_cosine",
    "ann_lsh_search",
    "ann_ivf_index_search",
    # --- dedup ---
    "dedup_clusters",
    "dedup_keep_best",
    "dedup_ngram_jaccard",
    "dedup_cdc_chunks",
    # --- text ---
    "text_metrics",
    "lang_id_confusion",
    "token_count_regex",
    "doc_fingerprint",
    "inverted_index_topdocs",
    # --- sampling / splits ---
    "train_split_assign",
    "stratified_sample_hash",
    "temporal_holdout_split",
    # --- pipelines ---
    "telemetry_sessions_pipeline",
    "pii_pseudonymize",
    "curation_stats",
    # --- windows / sessionization / asof ---
    "events_sessionize",
    "asof_join_last_click",
    "funnel_conversion_rates",
    "skew_salted_topk",
    # --- streaming snapshots ---
    "streaming_dedup_snapshot",
    "streaming_rollup_snapshot",
    # --- broker ---
    "topic_stats",
    "consumer_poll_batch",
]

DRIVER_WINDOW: list[str] = CANARY_CORE + ROTATION_R11


def _curated_order() -> list[str]:
    window = [n for n in DRIVER_WINDOW if n in _QUERIES]
    rest = [n for n in _QUERIES if n not in set(window)]
    return window + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _QUERIES["q1_pricing_summary"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _QUERIES[name].build for name in _curated_order()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in _QUERIES.items() if spec.oracle is not None
    }
