"""Registry-wide physical-plan lint: no scale-killers may ever register.

tests/test_plans.py pins detailed plan contracts for specific queries;
this lint is the coarse safety net over EVERY registry entry — a new
operator cannot ship with a plan Catalyst compiled to a cartesian
product or a row-at-a-time Python UDF, the two patterns that turn a
working sf0.01 query into a non-starter at 100 TB.

- ``CartesianProduct``: forbidden outright (even the all-pairs oracle
  baselines are written as theta joins over a broadcast side).
- ``BatchEvalPython`` (row-at-a-time Python eval): forbidden outright;
  Python in plans must be Arrow-batched (ArrowEvalPython / MapInPandas
  / FlatMapGroupsInPandas), which the lint permits.
- ``BroadcastNestedLoopJoin``: allowed only for the whitelisted
  queries below, each of which broadcasts a provably tiny side
  (N_QUERY query vectors, a one-row total, or a scalar-subquery
  threshold) — the pattern is then a broadcast map, not a join blowup.
"""

from __future__ import annotations

import pytest

from barco_spark.registry import load_all

QUERIES = load_all()

# BroadcastNestedLoopJoin with a provably tiny build side:
BNLJ_OK = {
    # N_QUERY (5) query vectors broadcast against the corpus
    "ann_cosine_topk",
    "ann_ivf_search_exact",
    # composes both of the above (exact + IVF twins) for recall@k
    "ann_recall_report",
    # same N_QUERY broadcast, exact + int8-quantized rankings
    "ann_int8_recall",
    # same N_QUERY broadcast, exact + prefix-truncated rankings
    "ann_matryoshka_recall",
    # one-row query-by-example doc/embedding broadcast into both
    # ranker scans; the fusion join runs on two 20-row lists
    "hybrid_rrf_retrieval",
    # sketch-space set ops: the type-pair inequality join and the
    # pair x sketch OR-expansion both run on the k-min tables, which
    # are bounded at types*K rows BY CONSTRUCTION (the corpus is
    # touched once, upstream, to build them). The type list itself is
    # capped at KMV_MAX_TYPES (=64) by estimated cardinality before
    # the quadratic pair stage, so even a corpus keyed by thousands of
    # domains bounds the BNLJ sides at C(64,2) pairs x K rows — the
    # broadcast side can never grow with the data OR the key domain
    # (tested at 1000 synthetic types in test_relational_extra.py)
    "kmv_set_overlap",
    # same N_QUERY broadcast pool stage; greedy steps are broadcast
    # hash joins on query_id over N_QUERY*MMR_POOL rows
    "mmr_diverse_rerank",
    # one-row total-token table broadcast into the scored pairs
    "bigram_lift_top",
    # theta join (vec_a < vec_b) over the broadcast cell/centroid side
    "dedup_embedding_cosine",
    "dedup_embedding_cosine_baseline",
    "semdedup_prune",
    # same deliberate sqrt(N)-centroid broadcast cross for cell
    # assignment (the pair stage itself is a hinted SHJ on cell)
    "hard_negative_mining",
    # scalar subquery threshold (one row) against the group sums
    "q11_important_parts",
    # probe-cell resolution over the tiny centroid table (sqrt(N) rows)
    "ann_ivf_index_search",
    # one-row corpus-size total crossed into the per-term df table
    "tfidf_top_terms",
    # calendar-spine build: distinct types crossed with the broadcast
    # day list (derived from a one-row min/max aggregate)
    "interpolate_missing_daily",
    # one-row global-max / totals tables crossed into small aggregates
    "data_freshness_report",
    "key_skew_report",
    # one-row cutoff-day aggregate broadcast into the event stream
    "temporal_holdout_split",
    # one-row order-count total crossed into the scored pair table
    "market_basket_lift",
    # one-row (n_docs, total_tokens) corpus scalars crossed into the
    # query-term tf table
    "bm25_topdocs",
    "revenue_pareto_deciles",
    "order_backlog_aging",
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_has_no_scale_killers(spark, sf_dir, name):
    plan = (
        QUERIES[name]
        .build(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python eval (use pandas_udf/mapInPandas)"
    )
    if name not in BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: unexpected nested-loop join — broadcast a tiny "
            "side deliberately and whitelist it, or fix the join keys"
        )
