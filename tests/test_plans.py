"""Physical-plan contracts: pushdown, pruning, broadcast, shuffle count.

These lock in the 100 TB design properties at any SF — a correct
result with the wrong plan fails here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from barco_spark.plans import (
    explain_str,
    has_broadcast_join,
    has_pushed_filters,
    read_schema_columns,
    shuffle_count,
)
from barco_spark.registry import load_all
from barco_spark.tables import t

QUERIES = load_all()


import pytest


@pytest.fixture(autouse=True)
def _cold_plans(spark):
    """Plan contracts assert on COLD plans: persisted subtrees from
    earlier tests (e.g. dedup signature caches) would otherwise compile
    later identical plans into InMemoryTableScan and change the shape."""
    spark.catalog.clearCache()
    yield


def test_scan_filter_pushdown(spark, sf_dir):
    df = QUERIES["scan_filter_project"].build(spark, sf_dir)
    assert has_pushed_filters(df, "l_quantity")


def test_scan_column_pruning(spark, sf_dir):
    df = QUERIES["scan_filter_project"].build(spark, sf_dir)
    schemas = read_schema_columns(df)
    assert schemas, "no scan found"
    # 4 projected + 1 filter column; never the full 11-column lineitem
    assert all(len(cols) <= 5 for cols in schemas), schemas


def test_q1_prunes_lineitem(spark, sf_dir):
    df = QUERIES["q1_pricing_summary"].build(spark, sf_dir)
    (cols,) = read_schema_columns(df)
    assert set(cols) == {
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_shipdate",
    }


def test_q5_broadcasts_dims(spark, sf_dir):
    df = QUERIES["q5_region_revenue"].build(spark, sf_dir)
    assert has_broadcast_join(df)


def test_q5_filter_pushdown_on_orders(spark, sf_dir):
    df = QUERIES["q5_region_revenue"].build(spark, sf_dir)
    assert has_pushed_filters(df, "o_orderdate")


def test_semi_join_stays_semi(spark, sf_dir):
    from barco_spark.plans import explain_str

    df = QUERIES["join_semi"].build(spark, sf_dir)
    assert "LeftSemi" in explain_str(df)


def test_window_single_shuffle(spark, sf_dir):
    df = QUERIES["window_topk_per_group"].build(spark, sf_dir)
    # one exchange for the window partition key, nothing else
    assert shuffle_count(df) == 1


def test_agg_partial_final(spark, sf_dir):
    from barco_spark.plans import explain_str

    df = QUERIES["q1_pricing_summary"].build(spark, sf_dir)
    plan = explain_str(df)
    # partial (map-side) + final aggregation => exactly one shuffle
    assert plan.count("HashAggregate") >= 2
    assert shuffle_count(df) == 1


def test_topk_avoids_global_sort(spark, sf_dir):
    from barco_spark.plans import explain_str

    df = QUERIES["sort_topk"].build(spark, sf_dir)
    assert "TakeOrderedAndProject" in explain_str(df)


def test_ann_broadcasts_queries_not_corpus(spark, sf_dir):
    """The brute scoring pass must stream the corpus ONCE against the
    bounded query set: since r12 that is one Arrow pass (MapInPandas,
    bit-exact numpy folds — the bounded queries ride a broadcast
    variable, replacing the BroadcastNestedLoopJoin form); the only
    exchange allowed is the ranking window's partition-by query_id,
    and no join may appear at all."""
    from barco_spark.plans import explain_str

    df = QUERIES["ann_cosine_topk"].build(spark, sf_dir)
    plan = explain_str(df)
    assert "MapInPandas" in plan
    assert "Join" not in plan
    assert shuffle_count(df) <= 1


def test_eventlog_produce_single_shuffle(spark, tmp_path):
    from barco_spark.sources.eventlog import EventLog

    log = EventLog(spark, str(tmp_path / "log"))
    log.produce("t", [f"m{i}" for i in range(10)], partition_key="k")
    # poll plan: pruned scan + broadcast of committed offsets, no shuffle
    df = log.poll("g-unregistered", "t", auto_commit=False)
    assert shuffle_count(df) == 0
    assert has_broadcast_join(df)


def test_q8_star_broadcasts_dims(spark, sf_dir):
    df = QUERIES["q8_market_share"].build(spark, sf_dir)
    assert has_broadcast_join(df)
    assert has_pushed_filters(df, "p_type", "r_name")


def test_q9_broadcasts_dims_and_pushes_part_filter(spark, sf_dir):
    df = QUERIES["q9_product_profit"].build(spark, sf_dir)
    assert has_broadcast_join(df)
    assert has_pushed_filters(df, "p_name")


def test_q17_two_shuffles(spark, sf_dir):
    # broadcast semi-reduction (0) + window over l_partkey (1) + final
    # single-partition agg (1); the correlated subquery never self-joins
    df = QUERIES["q17_small_quantity_revenue"].build(spark, sf_dir)
    assert has_broadcast_join(df)
    assert shuffle_count(df) <= 2


def test_q21_single_scan_no_expand(spark, sf_dir):
    """classic Q21 needs l1/l2/l3 self-joins (3 lineitem scans); the r13
    pair-rollup formulation scans lineitem ONCE at runtime — the
    per-order counts branch reuses the pairs branch's l_orderkey
    exchange (AQE stage reuse, only visible in the FINAL adaptive
    plan) — and the double COUNT(DISTINCT) Expand never materializes."""
    import re

    from barco_spark.plans import explain_str

    df = QUERIES["q21_waiting_suppliers"].build(spark, sf_dir)
    assert "Expand" not in explain_str(df)
    df.collect()  # finalize the adaptive plan
    final = explain_str(df, "simple").split("== Initial Plan ==")[0]
    assert "isFinalPlan=true" in final
    li_scans = re.findall(r"FileScan parquet \[[^\]]*l_suppkey[^\]]*\]", final)
    assert len(li_scans) == 1, li_scans
    assert "ReusedExchange" in final
    assert "TakeOrderedAndProject" in final


def test_simhash_pairs_no_cartesian(spark, sf_dir):
    # candidates come from the banded equi self-join; the all-pairs
    # theta join (BroadcastNestedLoop) must not appear anywhere
    from barco_spark.plans import explain_str

    df = QUERIES["dedup_simhash_pairs"].build(spark, sf_dir)
    plan = explain_str(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_quantile_stats_single_shuffle(spark, sf_dir):
    """Rank window, count window, and the final groupBy all share the
    event_type partitioning: exactly ONE exchange in the whole plan."""
    df = QUERIES["quantile_stats"].build(spark, sf_dir)
    assert shuffle_count(df) == 1


def test_unpivot_single_scan_with_pushdown(spark, sf_dir):
    """df.unpivot is one Expand over ONE pruned scan (not 4 unioned
    scans), with the shipdate filter pushed down."""
    df = QUERIES["lineitem_unpivot_stats"].build(spark, sf_dir)
    plan = explain_str(df)
    assert len(read_schema_columns(df)) == 1  # exactly one scan
    assert "Expand" in plan
    assert has_pushed_filters(df, "l_shipdate")
    assert shuffle_count(df) == 1


def test_simhash_partial_aggregates_before_shuffle(spark, sf_dir):
    """The exploded token stream partial-aggregates map-side; the only
    shuffle carries (doc_id, 28 int partials), never raw tokens."""
    from barco_spark.operators.dedup import simhash_signatures

    df = simhash_signatures(spark, sf_dir)
    plan = explain_str(df)
    assert "partial_sum" in plan
    assert shuffle_count(df) == 1


def test_stratified_sample_broadcasts_counts(spark, sf_dir):
    """The per-source count table must be broadcast, not shuffled into
    a sort-merge join; the sample itself is then a per-row map."""
    from barco_spark.operators.sampling import stratified_sample_hash

    df = stratified_sample_hash(spark, sf_dir)
    assert has_broadcast_join(df)
    # one shuffle for the counts agg, one for the final per-source agg
    assert shuffle_count(df) <= 2


def test_keep_best_single_shuffle(spark, sf_dir):
    """Keep-best canonicalization: both windows share one partitioning
    over fingerprint — exactly one data shuffle."""
    from barco_spark.operators.dedup import dedup_keep_best

    df = dedup_keep_best(spark, sf_dir)
    assert shuffle_count(df) == 1


def test_lsh_capped_reuses_band_partitioning(spark, sf_dir):
    """The bucket-size window partitions by the same key as the
    candidate self-join; capping must not add shuffles beyond the
    uncapped pipeline's (bands window/join + distinct + verify joins)."""
    from barco_spark.operators.dedup import dedup_lsh_capped, dedup_minhash_lsh

    capped = shuffle_count(dedup_lsh_capped(spark, sf_dir))
    uncapped = shuffle_count(dedup_minhash_lsh(spark, sf_dir))
    assert capped <= uncapped + 2  # window adds at most its own exchange


def test_funnel_two_shuffles_one_scan(spark, sf_dir):
    """The funnel cascade shares one user_id partitioning and one final
    single-partition agg; the union-of-three-aggs shape (3 scans, 6
    shuffles) must not come back."""
    from barco_spark.operators.windows import events_funnel

    df = events_funnel(spark, sf_dir)
    assert shuffle_count(df) == 2
    assert len(read_schema_columns(df)) == 1  # events scanned once


def test_hash_topn_uses_window_group_limit(spark, sf_dir):
    """The rank<=n filter must trigger WindowGroupLimit (per-partition
    top-n before the shuffle) so only n*partitions rows are exchanged."""
    from barco_spark.operators.sampling import hash_topn_sample

    df = hash_topn_sample(spark, sf_dir)
    assert "WindowGroupLimit" in explain_str(df, "simple")
    assert shuffle_count(df) == 1


def test_eventlog_join_dynamic_partition_pruning(spark, tmp_path):
    """Joining the bucket-partitioned log against a filtered dim table
    must inject a dynamicpruning expression into the scan's
    PartitionFilters — at 100 TB this is what keeps a bucket-targeted
    join from reading every bucket directory."""
    from pyspark.sql import functions as F

    from barco_spark.sources.eventlog import EventLog

    log = EventLog(spark, str(tmp_path / "log"))
    src = spark.range(2000).select(
        (F.col("id") % 40).cast("string").alias("partition_key"),
        F.col("id").cast("string").alias("payload"),
    )
    log.produce("t", src)
    spark.range(12).select(
        F.col("id").cast("int").alias("bucket"), (F.col("id") % 3).alias("tag")
    ).write.parquet(str(tmp_path / "dim"))
    dim = spark.read.parquet(str(tmp_path / "dim")).filter(F.col("tag") == 0)
    j = log.read("t").join(dim, "bucket")
    assert "dynamicpruningexpression" in explain_str(j, "formatted").lower()


def test_produce_evaluates_input_lineage_once(spark, tmp_path):
    """produce() feeds one batch into two actions (count matrix +
    write); the batch must be persisted so the input lineage runs
    exactly once — at 100 TB a second evaluation is a second full scan
    of every produce batch. The accumulator counts how many times each
    input row physically flows through the lineage."""
    from barco_spark.sources.eventlog import EventLog

    acc = spark.sparkContext.accumulator(0)

    def bump(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    src = (
        spark.range(50)
        .select(F.concat(F.lit("p"), F.col("id").cast("string")).alias("payload"))
        .mapInPandas(bump, "payload string")
    )
    log = EventLog(spark, str(tmp_path / "log"))
    n = log.produce("t", src)
    assert n == 50
    assert acc.value == 50, f"input lineage evaluated {acc.value / 50:.1f}x"


def test_decontamination_broadcasts_eval_hashes(spark, sf_dir):
    """The eval-set shingle hashes are tiny relative to the corpus; the
    overlap test must be a broadcast join — shuffling the corpus's
    exploded n-grams by hash would be the 100 TB scale-killer."""
    df = QUERIES["decontaminate_ngram_overlap"].build(spark, sf_dir)
    assert has_broadcast_join(df)


def test_embedding_blocked_dedup_joins_on_cell_not_cartesian(spark, sf_dir):
    """The IVF-blocked near-dup must pair vectors through an equi-join
    keyed on the cell (exchange hash-partitioned on cell feeding a
    merge/hash join) — an all-pairs nested-loop PAIR join is exactly
    what this operator exists to avoid. (The centroid-assignment stage
    legitimately uses a broadcast cross join: corpus x ~sqrt(N)
    broadcast centroids.)"""
    df = QUERIES["dedup_embedding_cosine"].build(spark, sf_dir)
    plan = explain_str(df, "formatted").lower()
    assert "hashpartitioning(cell" in plan
    assert "sortmergejoin" in plan or "shuffledhashjoin" in plan


def test_ivf_index_probe_scan_is_partition_pruned(spark, sf_dir, tmp_path):
    """The persisted IVF index's probe scan must prune by cell at the
    file-index level (PartitionFilters), not post-scan: that is the
    property that makes a query read ~nprobe/nlist of a 100 TB index."""
    from barco_spark.operators.ann_index import (
        ivf_index_search,
        ivf_index_write,
    )
    from barco_spark.operators.similarity import N_QUERY

    index_path = str(tmp_path / "ivf")
    ivf_index_write(spark, sf_dir, index_path)
    queries = (
        t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < N_QUERY)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("qv"),
        )
    )
    out = ivf_index_search(spark, index_path, queries)
    plan = explain_str(out)
    # the corpus scan must carry a non-empty partition filter on cell
    assert "PartitionFilters: [cell" in plan.replace(
        "PartitionFilters: [isnotnull(cell", "PartitionFilters: [cell"
    ) or "cell IN" in plan, plan[:4000]

    # and the result must be bit-identical to the non-indexed IVF path
    direct = QUERIES["ann_ivf_search_exact"].build(spark, sf_dir)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_priority_sample_plan_is_takeordered_no_shuffle(spark, sf_dir):
    """weighted_sample_priority must be one scan + TakeOrderedAndProject:
    zero data shuffles, no global Sort node."""
    df = QUERIES["weighted_sample_priority"].build(spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "TakeOrderedAndProject" in plan
    assert shuffle_count(df) == 0


def test_exact_substring_plan_shape(spark, sf_dir):
    """dedup_exact_substring: no cartesian/nested-loop anything, and no
    shuffle may carry the text column (hashes are computed before the
    anchor explode, so only narrow (doc_id, pos, h) rows move)."""
    df = QUERIES["dedup_exact_substring"].build(spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Generate" in plan, "anchor explode missing from plan"
    exch = [l for l in plan.splitlines() if "Exchange" in l]
    assert exch and all("text#" not in l for l in exch), exch


def test_dsir_scoring_join_is_broadcast(spark, sf_dir):
    """dsir_importance_weights: the per-bucket score table (bounded by
    N_BUCKETS) must broadcast onto the corpus side — a shuffled
    sort-merge join here would shuffle every feature occurrence."""
    df = QUERIES["dsir_importance_weights"].build(spark, sf_dir)
    assert has_broadcast_join(df)
    plan = explain_str(df, "formatted")
    assert "SortMergeJoin" not in plan


def test_incremental_dedup_index_never_shuffles(spark, sf_dir):
    """dedup_incremental: every join against the existing index must
    build a BROADCAST side (the incoming batch / its matched key sets);
    the only hash exchanges allowed are the batch-bounded distincts —
    nothing the size of the index may move."""
    df = QUERIES["dedup_incremental"].build(spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3
    # every exchange is a batch-bounded distinct (the matched-key set
    # sits AFTER the broadcast probe join, so its dedup shuffles only
    # matches; the cold plan duplicates that subtree once per key kind)
    assert shuffle_count(df) <= 4


def test_chunk_transforms_are_join_free(spark, sf_dir):
    """boilerplate_strip and dedup_chunk_rewrite must keep the round-6
    join-free shape: the chunk explode feeds exactly two exchanges
    (chunk-hash window, doc_id rebuild) and no join re-executes it."""
    for name in ("boilerplate_strip", "dedup_chunk_rewrite"):
        df = QUERIES[name].build(spark, sf_dir)
        plan = explain_str(df)
        assert "Join" not in plan, f"{name}: join reintroduced"
        assert shuffle_count(df) == 2, f"{name}: expected 2 exchanges"


def test_bm25_topk_and_broadcasts(spark, sf_dir):
    """bm25_topdocs: corpus scalars broadcast, top-20 never a global
    sort."""
    df = QUERIES["bm25_topdocs"].build(spark, sf_dir)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan
    assert has_broadcast_join(df)


def test_events_twap_single_shuffle_window_then_agg(spark, sf_dir):
    """TWAP: the LEAD window and the group aggregate share the
    (user_id, event_type) partitioning — one exchange total."""
    df = QUERIES["events_twap"].build(spark, sf_dir)
    assert shuffle_count(df) == 1


def test_pair_family_verify_joins_never_broadcast(spark, sf_dir):
    """The round-7 driver-OOM fix: corpus-sized pair-join sides
    (shingle/embedding arrays, word sets, text prefixes) carry
    SHUFFLE_HASH hints, because Catalyst's static estimate is the
    column-pruned parquet bytes and the deserialized array relation is
    ~15x that — a 'fits 64 MB' broadcast built a >1 GB driver
    HashedRelation at 500k docs. The hinted joins must plan as
    ShuffledHashJoin at EVERY scale; a BroadcastHashJoin whose build
    side is the corpus would regress the fix silently on small test
    data and OOM in production."""
    from barco_spark.plans import explain_str

    cases = {
        # query -> minimum ShuffledHashJoin count (the hinted sites)
        "dedup_minhash_lsh": 3,  # band self-join + both verify sides
        "dedup_simhash_pairs": 1,  # pigeonhole block join
        "dedup_ngram_jaccard": 1,  # word-set block join
        "fuzzy_match_blocked": 2,  # both prefix-verify sides
        "dedup_embedding_cosine": 1,  # cell join
        "hard_negative_mining": 1,  # cross-label cell join (r9)
        "cross_split_leakage": 3,  # inherits dedup_minhash_lsh's sites
    }
    for name, min_shj in cases.items():
        plan = explain_str(QUERIES[name].build(spark, sf_dir))
        assert plan.count("ShuffledHashJoin") >= min_shj, (
            f"{name}: expected >= {min_shj} ShuffledHashJoin, plan:\n{plan}"
        )


def test_span_corruption_plan_is_explode_window_agg(spark, sf_dir):
    """span_corruption_stats must stay one explode + one doc-keyed
    window + one aggregation: exactly two exchanges (the doc_id window
    partitioning and the source aggregation), no joins, no Python."""
    from barco_spark.plans import explain_str

    df = QUERIES["span_corruption_stats"].build(spark, sf_dir)
    plan = explain_str(df)
    assert shuffle_count(df) <= 3  # window + partial/final agg (+ sort)
    assert "Join" not in plan, f"unexpected join:\n{plan}"
    assert "BatchEvalPython" not in plan
    assert "Generate" in plan  # the single posexplode


def test_cross_split_leakage_adds_no_shuffle_over_lsh_pairs(spark, sf_dir):
    """The split is a pure function of the doc id (two hash columns +
    a filter in the pair projection), so the leakage query must cost
    exactly the proven dedup_minhash_lsh plan — no split table, no
    extra join, no extra exchange."""
    base = shuffle_count(QUERIES["dedup_minhash_lsh"].build(spark, sf_dir))
    leak = shuffle_count(QUERIES["cross_split_leakage"].build(spark, sf_dir))
    assert leak == base, (base, leak)


@pytest.mark.parametrize(
    "name", ["ann_int8_recall", "ann_matryoshka_recall"]
)
def test_compressed_recall_is_two_codegen_corpus_passes(spark, sf_dir, name):
    """The compressed-representation recall gates: exact and
    compressed rankings are each one broadcast-query pass over the
    corpus; quantization/truncation is a codegen'd array expression,
    never Python, and no ranking may fall back to a sort-merge join."""
    df = QUERIES[name].build(spark, sf_dir)
    plan = explain_str(df)
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # rank windows (2) + the final broadcast-join recall agg; never a
    # corpus-keyed exchange
    assert shuffle_count(df) <= 4, explain_str(df)


def test_mmr_greedy_steps_are_broadcast_joins(spark, sf_dir):
    """mmr_diverse_rerank: the default (r12) arm collects the bounded
    pool and runs the greedy on the driver — the returned frame is a
    driver-local Arrow relation with NO joins at all; the kept
    DataFrame verification arm must still join the persisted pool
    against one-row-per-query selected sets via broadcast hash joins
    only (a sort-merge join would mean Catalyst saw a corpus-sized
    side)."""
    from barco_spark.operators import similarity

    df = QUERIES["mmr_diverse_rerank"].build(spark, sf_dir)
    plan = explain_str(df)
    assert "SortMergeJoin" not in plan
    assert "Join" not in plan  # driver-local greedy: no joins anywhere
    assert "LocalTableScan" in plan

    old = similarity._MMR_LOCAL
    similarity._MMR_LOCAL = False
    try:
        df2 = QUERIES["mmr_diverse_rerank"].build(spark, sf_dir)
        plan2 = explain_str(df2)
        assert "SortMergeJoin" not in plan2
        assert "BroadcastHashJoin" in plan2
        assert "InMemoryTableScan" in plan2  # pool persisted, scored once
    finally:
        similarity._MMR_LOCAL = old


def test_hybrid_rrf_is_takeordered_fusion_no_shuffle(spark, sf_dir):
    """hybrid_rrf_retrieval: each ranker's candidate list is a
    TakeOrderedAndProject over one corpus pass (never a global sort
    or a corpus-keyed exchange), and the RRF fusion joins two K-row
    lists — the whole plan must run with ZERO exchanges."""
    df = QUERIES["hybrid_rrf_retrieval"].build(spark, sf_dir)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan
    assert shuffle_count(df) == 0, plan


def test_media_pipelines_decode_is_map_only(spark, tmp_path):
    """The storage-scale multimodal pipelines (scripts/scale_study.py
    --media/--audio — the registered phash_image_dedup /
    audio_feature_extract code paths over a parquet-backed media
    table): decode (mapInPandas) must sit BELOW every exchange (a
    narrow map over the scan, never re-decoded post-shuffle), and the
    only shuffles are the 8-byte-key hash-groupBy (phash: exactly 1)
    and the rollup + 10-row global sort (audio: exactly 2)."""
    import scripts.scale_study as ss

    d = str(tmp_path)
    ss.build_media(spark, d, 200)
    df = ss.media_pipeline(spark, d)
    plan = explain_str(df)
    assert shuffle_count(df) == 1, plan
    assert "MapInPandas" in plan
    # explain prints root-first: every Exchange line must come BEFORE
    # (i.e. sit above) the decode stage's MapInPandas lines
    assert plan.index("Exchange") < plan.index("MapInPandas"), plan

    ss.build_audio(spark, d, 60)
    adf = ss.audio_pipeline(spark, d)
    aplan = explain_str(adf)
    assert shuffle_count(adf) == 2, aplan
    assert "MapInPandas" in aplan
    assert aplan.index("Exchange") < aplan.index("MapInPandas"), aplan


def test_telemetry_pipeline_single_event_stream_exchange(spark, sf_dir):
    """The composed telemetry pipeline shuffles the EVENT STREAM once:
    debounce runs inside the user_id partition (type,ts)-sorted with a
    type-change guard, and the sessionize window reuses that exchange
    (sort-only).  The only other exchanges are the counters-only
    rollups: 3 total, and exactly one hash-partitioning on user keys."""
    df = QUERIES["telemetry_sessions_pipeline"].build(spark, sf_dir)
    plan = explain_str(df)
    assert shuffle_count(df) == 3, plan
    assert plan.count("hashpartitioning(user_id") == 1, plan
