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

# Round-12 rotation: 40 never-driver-checked, all oracle-paired.  The
# first 24 are VERDICT r11 item 1's named tranche (heavily-used-by-users:
# the dedup long tail, the quality filters, the five streaming snapshots,
# SCD1/SCD2, the multimodal/audio oracle pairs landed in r11); the rest
# are category-stratified picks from the never-checked pool
# (scripts/rotate_window.py).  Disjointness vs the r11 committed window
# is enforced by tests/test_driver_contract.py against git history.
ROTATION_R12: list[str] = [
    # --- VERDICT-named tranche ---
    "dedup_lsh_capped",
    "dedup_incremental",
    "dedup_exact_substring",
    "dedup_containment",
    "minhash_estimator_calibration",
    "unigram_logprob_quality",
    "gopher_dup_ngram_chars",
    "boilerplate_strip",
    "dedup_chunk_rewrite",
    "mixture_temperature_sample",
    "training_order_shard",
    "packing_efficiency_report",
    "audio_feature_extract",
    "multimodal_profile",
    "streaming_funnel_snapshot",
    "streaming_join_snapshot",
    "streaming_enrich_snapshot",
    "streaming_sessionize_snapshot",
    "streaming_debounce_snapshot",
    "market_basket_lift",
    "events_funnel",
    "window_range_frame_1h",
    "scd1_upsert_shape",
    "scd2_history_build",
    # --- aggregation ---
    "cohort_retention_weekly",
    "key_skew_report",
    "numeric_profile_lineitem",
    # --- dedup signatures ---
    "minhash_signatures",
    "simhash_signatures",
    # --- join / relational / subquery ---
    "join_lateral_topk",
    "lineitem_unpivot_stats",
    "subquery_not_in_nulls",
    "division_all_parts_suppliers",
    # --- sampling ---
    "weighted_sample_priority",
    "data_mixture_weights",
    # --- similarity ---
    "dedup_embedding_cosine_baseline",
    "ann_lsh_buckets",
    "ann_ivf_search_exact",
    # --- text ---
    "top_terms",
    "repetition_stats",
]

DRIVER_WINDOW: list[str] = CANARY_CORE + ROTATION_R12


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
