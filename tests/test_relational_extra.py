"""Invariants that the SQL oracle can't express: approximation bounds,
cross-query consistency, exact-vs-fast hash agreement."""

from __future__ import annotations

from pyspark.sql import functions as F

from barco_spark.registry import load_all
from barco_spark.tables import t

QUERIES = load_all()


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    rows = QUERIES["approx_count_distinct"].build(spark, sf_dir).collect()
    assert rows
    for r in rows:
        exact = r["exact_users"]
        approx = r["approx_users"]
        # rsd=0.02 => generous 10% envelope at these cardinalities
        assert abs(approx - exact) <= max(2, 0.1 * exact), r


def test_rollup_totals_consistent(spark, sf_dir):
    rows = QUERIES["agg_rollup"].build(spark, sf_dir).collect()
    grand = [r for r in rows if r["l_returnflag"] is None and r["l_linestatus"] is None]
    leaves = [
        r
        for r in rows
        if r["l_returnflag"] is not None and r["l_linestatus"] is not None
    ]
    assert len(grand) == 1
    assert sum(r["n"] for r in leaves) == grand[0]["n"]
    assert abs(sum(r["sum_qty"] for r in leaves) - grand[0]["sum_qty"]) < 1e-6


def test_cube_slice_counts(spark, sf_dir):
    rows = QUERIES["agg_cube"].build(spark, sf_dir).collect()
    total = t(spark, sf_dir, "orders").count()
    grand = [r for r in rows if r["o_orderstatus"] is None and r["o_orderpriority"] is None]
    assert grand[0]["n"] == total
    by_status = [
        r for r in rows if r["o_orderstatus"] is not None and r["o_orderpriority"] is None
    ]
    assert sum(r["n"] for r in by_status) == total


def test_minhash_similarity_estimates_jaccard(spark, sf_dir):
    # LSH-confirmed pairs must have genuinely high signature agreement
    sigs = {
        r["doc_id"]: [r[f"s{i}"] for i in range(8)]
        for r in QUERIES["minhash_signatures"].build(spark, sf_dir).collect()
    }
    pairs = QUERIES["dedup_minhash_lsh"].build(spark, sf_dir).collect()
    assert pairs, "expected candidate near-dup pairs in synthetic docs"
    for p in pairs:
        sa, sb = sigs[p["doc_a"]], sigs[p["doc_b"]]
        agree = sum(1 for x, y in zip(sa, sb) if x == y) / 8.0
        # verified jaccard >= 0.4 should show some signature agreement
        assert agree >= 0.25 or p["jaccard"] >= 0.4


def test_exact_vs_fast_bucket_distribution(spark, sf_dir):
    # both routing paths must cover buckets without gross imbalance
    from barco_spark.functions.tokens import bucket_for_key_udf, fast_bucket_expr

    ev = t(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("k")
    )
    exact = (
        ev.select(bucket_for_key_udf()(F.col("k")).alias("b"))
        .groupBy("b")
        .count()
        .collect()
    )
    fast = (
        ev.select(fast_bucket_expr(F.col("k"), 12).alias("b"))
        .groupBy("b")
        .count()
        .collect()
    )
    assert all(0 <= r["b"] < 12 for r in exact)
    assert all(0 <= r["b"] < 12 for r in fast)


def test_topic_validation(spark, tmp_path):
    import pytest

    from barco_spark.sources.eventlog import EventLog

    log = EventLog(spark, str(tmp_path / "log"))
    with pytest.raises(ValueError):
        log.produce("", ["x"])
    with pytest.raises(ValueError):
        log.produce("t" * 300, ["x"])


def test_curation_invariants(spark, sf_dir):
    from barco_spark.operators.pipeline import curate
    from barco_spark.registry import load_all

    q = load_all()
    kept = {r["doc_id"] for r in curate(spark, sf_dir).collect()}
    assert kept  # the pipeline keeps a non-trivial corpus
    # no surviving near-dup pair: for every verified pair, doc_b dropped
    pairs = q["dedup_minhash_lsh"].build(spark, sf_dir).collect()
    for p in pairs:
        assert p["doc_b"] not in kept
    # funnel stats add up
    stats = q["curation_stats"].build(spark, sf_dir).collect()
    for r in stats:
        assert r["n_input"] == r["dropped_quality"] + r["dropped_dup"] + r["n_kept"]
    assert sum(r["n_kept"] for r in stats) == len(kept)


def test_curation_keeps_representative_when_keeper_low_quality(spark):
    # if A~B are near-dups and keeper A fails quality, B must SURVIVE
    # (dropping both would lose the content entirely)
    from barco_spark.operators.pipeline import QUALITY_THRESHOLD, curate

    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 " * 10  # long, high quality
    short = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"  # short => low quality
    rows = [
        (1, short.strip(), "en", "s", len(short)),  # low-quality keeper
        (2, base.strip(), "en", "s", len(base)),  # near-dup of 1's shingles
        (3, "x1 x2 x3 " * 40, "en", "s", 360),  # unrelated control
    ]
    import tempfile

    d = tempfile.mkdtemp()
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    kept = {r["doc_id"] for r in curate(spark, d).collect()}
    assert 2 in kept  # survives even though its keeper (1) was dropped
    assert 1 not in kept  # low quality


def test_curate_with_stats_consistent(spark, sf_dir):
    from barco_spark.operators.pipeline import curate_with_stats

    corpus, stats = curate_with_stats(spark, sf_dir)
    assert corpus.count() == sum(r["n_kept"] for r in stats.collect())


def test_hll_sketch_estimates_close_to_exact(spark, sf_dir):
    """Sketch estimates must land within HLL error bounds of the exact
    distinct counts, and the merged ALL row must re-aggregate the
    per-type sketches (not re-scan)."""
    from pyspark.sql import functions as F

    from barco_spark.operators.relational2 import hll_sketch_cardinality
    from barco_spark.tables import t

    got = {
        r.event_type: r.distinct_users_est
        for r in hll_sketch_cardinality(spark, sf_dir).collect()
    }
    ev = t(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    exact["ALL"] = ev.select("user_id").distinct().count()
    assert set(got) == set(exact)
    for k, est in got.items():
        assert abs(est - exact[k]) <= max(2, 0.05 * exact[k]), (k, est, exact[k])


def test_kmv_sketch_estimates_close_to_exact(spark, sf_dir):
    """KMV estimator accuracy: within ~3 sigma (3/sqrt(K-2)) of exact
    for every group, exact when the group has fewer than K distinct
    users (the n_kept<K branch), and the ALL row consistent with the
    per-type rows (same merged universe)."""
    from pyspark.sql import functions as F

    from barco_spark.operators.relational2 import KMV_K, kmv_distinct_sketch
    from barco_spark.tables import t

    got = {
        r.event_type: r.distinct_users_est
        for r in kmv_distinct_sketch(spark, sf_dir).collect()
    }
    ev = t(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    exact["ALL"] = ev.select("user_id").distinct().count()
    assert set(got) == set(exact)
    tol = 3.0 / (KMV_K - 2) ** 0.5
    for k, est in got.items():
        if exact[k] < KMV_K:
            # hash collisions on the 52-bit slice are the only slack
            assert abs(est - exact[k]) <= 1, (k, est, exact[k])
        else:
            assert abs(est - exact[k]) <= tol * exact[k], (k, est, exact[k])


def test_kmv_set_overlap_exact_below_k(spark, tmp_path):
    """With fewer than K distinct users per type, the k-min sets ARE
    the full hash sets, so every estimate must be exact: planted
    X=users 0..99, Y=users 50..149 -> union 150, intersection 50,
    jaccard 1/3."""
    from pyspark.sql import functions as F

    from barco_spark.operators.relational2 import kmv_set_overlap

    d = str(tmp_path / "sf")
    rows = spark.range(100).select(
        F.col("id").alias("event_id"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
        F.col("id").alias("user_id"),
        F.lit("X").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    ).unionByName(
        spark.range(100).select(
            (F.col("id") + 1000).alias("event_id"),
            F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
            (F.col("id") + 50).alias("user_id"),
            F.lit("Y").alias("event_type"),
            F.lit(1.0).alias("value"),
            F.lit("{}").alias("props"),
        )
    )
    rows.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {(r.type_a, r.type_b): r for r in kmv_set_overlap(spark, d).collect()}
    r = out[("X", "Y")]
    assert r.common == 50 and r.union_est == 150.0
    assert abs(r.jaccard_est - 50 / 150) < 1e-12
    assert abs(r.inter_est - 50.0) < 1e-9


def test_kmv_set_overlap_caps_type_cardinality(spark, tmp_path):
    """Pair-expansion guard (KMV_MAX_TYPES): at 1000 event types the
    pair stage must engage the cap — only the top-64 types by estimated
    cardinality survive, so the output is C(64,2)=2016 pairs instead of
    C(1000,2)=499500. Types 0..63 are planted with 40 distinct users
    each, types 64..999 with 2 each, so the exact-integer ordering
    (n DESC, theta ASC, name ASC) keeps exactly the big types. The
    DuckDB oracle applies the identical cap, keeping parity bit-exact
    past the threshold."""
    import duckdb
    from pyspark.sql import functions as F

    from barco_spark.operators.relational2 import (
        KMV_MAX_TYPES,
        kmv_set_overlap,
    )
    from barco_spark.registry import load_all

    d = str(tmp_path / "sf")
    big = spark.range(64 * 40).select(
        F.col("id").alias("event_id"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
        # 40 distinct users per big type, disjoint across types
        F.col("id").alias("user_id"),
        F.format_string("big_%03d", (F.col("id") % 64)).alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    small = spark.range(936 * 2).select(
        (F.col("id") + 100_000).alias("event_id"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
        (F.col("id") + 100_000).alias("user_id"),
        F.format_string("sm_%03d", (F.col("id") % 936)).alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    big.unionByName(small).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )
    out = kmv_set_overlap(spark, d).collect()
    n = KMV_MAX_TYPES
    assert len(out) == n * (n - 1) // 2  # cap engaged: 2016, not 499500
    kept = {r.type_a for r in out} | {r.type_b for r in out}
    assert kept == {f"big_{i:03d}" for i in range(64)}

    # oracle applies the same cap -> identical pair set and values
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{d}/events.parquet/*.parquet'"
    )
    oracle = load_all()["kmv_set_overlap"].oracle
    duck = con.execute(oracle).fetchall()
    con.close()
    assert len(duck) == len(out)
    s_rows = sorted(
        (r.type_a, r.type_b, r.common, round(r.union_est, 9)) for r in out
    )
    d_rows = sorted((a, b, c, round(u, 9)) for a, b, c, u, _, _ in duck)
    assert s_rows == d_rows


def test_cms_overestimates_and_bounds(spark, sf_dir):
    """CMS guarantee: est >= exact for every key, and the overestimate
    is bounded by the row with the fewest colliding counts."""
    q = load_all()["cms_heavy_hitters"]
    rows = q.build(spark, sf_dir).collect()
    assert rows, "candidate set must be non-empty"
    total = t(spark, sf_dir, "events").count()
    for r in rows:
        assert r.est_count >= r.exact_count, r
        assert r.overestimate == r.est_count - r.exact_count
        # trivial upper bound: one row can't hold more than all events
        assert r.est_count <= total


def test_cms_merge_by_addition(spark, sf_dir):
    """The sketch is mergeable: CMS(first half) + CMS(second half)
    gives the same table as CMS(all) — the property that makes it the
    100 TB streaming heavy-hitter pattern."""
    from barco_spark.operators.relational2 import CMS_D, CMS_W

    ev = t(spark, sf_dir, "events")
    mid = ev.agg(F.expr("percentile_approx(event_id, 0.5)")).collect()[0][0]

    def cms_of(df):
        def bucket(d):
            h = F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(str(d)), F.lit(":"), F.col("user_id").cast("string")
                        )
                    ),
                    1,
                    7,
                ),
                16,
                10,
            ).cast("bigint")
            return (h % CMS_W).alias("bucket")

        rows = F.array(
            *[F.struct(F.lit(d).alias("d"), bucket(d)) for d in range(CMS_D)]
        )
        return (
            df.select(F.explode(rows).alias("r"))
            .select("r.d", "r.bucket")
            .groupBy("d", "bucket")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    whole = {(r.d, r.bucket): r.n for r in cms_of(ev).collect()}
    lo = {(r.d, r.bucket): r.n for r in cms_of(ev.filter(F.col("event_id") <= mid)).collect()}
    hi = {(r.d, r.bucket): r.n for r in cms_of(ev.filter(F.col("event_id") > mid)).collect()}
    merged = dict(lo)
    for k, v in hi.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == whole


def test_kmv_dense_rank_build_equals_distinct_row_number(spark):
    """The r11 sketch-build re-plan is an identity: dense_rank <= K
    then distinct selects exactly the K smallest DISTINCT hashes per
    type that distinct-then-row_number selects — verified on skewed
    synthetic data with heavy duplication (each user appears ~8x per
    type, so the prune actually faces duplicates)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    k = 16
    rows = spark.range(4000).select(
        (F.col("id") % 5).cast("string").alias("event_type"),
        # duplicate-heavy 52-bit-ish hash domain
        F.conv(
            F.substring(
                F.md5(((F.col("id") * 7) % 500).cast("string")), 1, 13
            ),
            16,
            10,
        ).cast("bigint").alias("h"),
    )
    w = Window.partitionBy("event_type").orderBy("h")
    old = (
        rows.distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("event_type", "h")
    )
    new = (
        rows.withColumn("dr", F.dense_rank().over(w))
        .filter(F.col("dr") <= k)
        .select("event_type", "h")
        .distinct()
    )
    assert sorted(map(tuple, old.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_market_basket_persist_guard_arms_equal(spark, sf_dir):
    """The r13 footer-count persist guard (items materialized once
    above _MB_PERSIST_MIN_ROWS) must not change a single row: force
    the guard on and compare against the default (guard-off) arm."""
    from barco_spark.operators import relational3
    from barco_spark.registry import QUERIES

    build = QUERIES["market_basket_lift"].build
    old = relational3._MB_PERSIST_MIN_ROWS
    try:
        relational3._MB_PERSIST_MIN_ROWS = 1 << 60  # off
        a_df = build(spark, sf_dir)
        a = [tuple(r) for r in a_df.collect()]
        relational3._MB_PERSIST_MIN_ROWS = 0  # forced on
        b_df = build(spark, sf_dir)
        b = [tuple(r) for r in b_df.collect()]
    finally:
        relational3._MB_PERSIST_MIN_ROWS = old
    assert a_df.schema == b_df.schema
    assert a == b
    assert a
