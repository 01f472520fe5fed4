"""Library-operator tests: generic as-of join, bucketed co-located
joins, byte-capped polling."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from barco_spark.operators.asof import asof_join
from barco_spark.plans import shuffle_count
from barco_spark.sources.eventlog import EventLog
from barco_spark.sources.warehouse import bucketed_join, write_bucketed
from barco_spark.tables import t


def test_asof_join_matches_reference_query(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("purchase_id")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("click_id")
    )
    out = asof_join(
        purchases, clicks, on="user_id", left_ts="p_ts", right_ts="c_ts",
        value_cols=["click_id"],
    )
    got = {r["purchase_id"]: r["c_ts_asof"] for r in out.collect()}

    # independent formulation from the oracle-verified registry query
    from barco_spark.registry import load_all

    expected = {
        r["purchase_id"]: r["last_click_ts"]
        for r in load_all()["asof_join_last_click"].build(spark, sf_dir).collect()
    }
    assert got == expected


def test_asof_join_single_shuffle(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("lts"), "event_id"
    )
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("rts"), F.col("value").alias("cv")
    )
    out = asof_join(left, right, "user_id", "lts", "rts", ["cv"])
    assert shuffle_count(out) == 1  # union + one window shuffle, no join


def test_bucketed_join_no_shuffle(spark, sf_dir):
    suffix = uuid.uuid4().hex[:8]
    lt, rt = f"b_orders_{suffix}", f"b_lineitem_{suffix}"
    try:
        write_bucketed(
            t(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "key"),
            lt,
            "key",
            buckets=8,
        )
        write_bucketed(
            t(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "key"),
            rt,
            "key",
            buckets=8,
        )
        joined = bucketed_join(spark, lt, rt, "key")
        assert shuffle_count(joined) == 0, "bucketed join must not exchange"
        plain = t(spark, sf_dir, "orders").join(
            t(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        assert joined.count() == plain.count()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {rt}")


def test_poll_byte_threshold(spark, tmp_path):
    log = EventLog(spark, str(tmp_path / "log"))
    log.register("g", ["t"], reset="earliest")
    log.produce("t", ["x" * 100 for _ in range(10)], partition_key="k")
    batch = log.poll("g", "t", auto_commit=False, max_bytes_per_bucket=350)
    assert batch.count() == 3  # 3 * 100 <= 350 < 4 * 100
    # an oversized first record is still served (no consumer wedge)
    log2 = EventLog(spark, str(tmp_path / "log2"))
    log2.register("g", ["t"], reset="earliest")
    log2.produce("t", ["y" * 1000], partition_key="k")
    assert log2.poll("g", "t", auto_commit=False, max_bytes_per_bucket=10).count() == 1


def test_asof_join_random_matches_bruteforce(spark):
    # randomized cross-check of the union+last_value as-of join against
    # a brute-force python computation (seeded, deterministic)
    import random

    rng = random.Random(42)
    keys = ["a", "b", "c"]
    # unique timestamps: ties among equal right timestamps are
    # explicitly unspecified in asof_join (documented)
    lts_vals = rng.sample(range(20000), 60)
    rts_vals = rng.sample(range(20000), 60)
    left = [(k, lts_vals[i], f"L{i}") for i, k in enumerate(
        rng.choices(keys, k=60))]
    right = [(k, rts_vals[i], f"R{i}") for i, k in enumerate(
        rng.choices(keys, k=60))]
    ldf = spark.createDataFrame(left, ["k", "lts", "lid"])
    rdf = spark.createDataFrame(right, ["k", "rts", "rid"])
    out = {
        r["lid"]: r["rid_asof"]
        for r in asof_join(ldf, rdf, "k", "lts", "rts", ["rid"]).collect()
    }

    def brute(k, lts):
        cands = [(rts, rid) for (rk, rts, rid) in right if rk == k and rts <= lts]
        return max(cands)[1] if cands else None

    for k, lts, lid in left:
        assert out[lid] == brute(k, lts), (k, lts, lid)


def test_lsh_capped_pairs_subset_of_uncapped(spark, sf_dir):
    from barco_spark.operators.dedup import dedup_lsh_capped, dedup_minhash_lsh

    full = {
        (r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, sf_dir).collect()
    }
    capped = {
        (r.doc_a, r.doc_b) for r in dedup_lsh_capped(spark, sf_dir).collect()
    }
    assert capped <= full
    # the cap only drops pairs whose every shared bucket is oversized;
    # it must never invent pairs
    assert len(capped) <= len(full)


def test_dedup_clusters_paths_agree(spark, sf_dir):
    """The driver union-find fast path and the distributed min-label
    loop must produce identical cluster assignments."""
    from barco_spark.operators.dedup import dedup_clusters

    fast = {(r.doc_id, r.cluster_id) for r in dedup_clusters(spark, sf_dir).collect()}
    loop = {
        (r.doc_id, r.cluster_id)
        for r in dedup_clusters(spark, sf_dir, driver_max_edges=0).collect()
    }
    assert fast == loop
    assert fast  # non-empty at every test SF


def test_dedup_clusters_releases_checkpoint_blocks(spark, sf_dir):
    """Both paths must free the RDD blocks they pinned (edge checkpoint,
    per-round label checkpoints) once the result no longer depends on
    them — catalog.clearCache does NOT cover localCheckpoint blocks, so
    a leak here degrades every later query in a long-lived session.
    Driver path: zero new blocks survive. Distributed path: exactly the
    final labels checkpoint may survive (the result reads it)."""
    from barco_spark.operators.dedup import dedup_clusters
    from barco_spark.session import free_persistent_rdds, persistent_rdd_ids

    spark.catalog.clearCache()
    free_persistent_rdds(spark)

    before = persistent_rdd_ids(spark)
    dedup_clusters(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()  # release the signature DataFrame cache
    leaked_fast = persistent_rdd_ids(spark) - before
    assert leaked_fast == set(), f"driver path leaked RDD blocks: {leaked_fast}"

    before = persistent_rdd_ids(spark)
    df = dedup_clusters(spark, sf_dir, driver_max_edges=0)
    df.write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    leaked_loop = persistent_rdd_ids(spark) - before
    # the distributed loop's single surviving block set is the final
    # labels checkpoint the returned DataFrame is rooted at
    assert len(leaked_loop) <= 1, (
        f"distributed path leaked intermediate checkpoints: {leaked_loop}"
    )
    free_persistent_rdds(spark)


def test_mask_pii_rules_on_constructed_strings(spark):
    """The e-mail/phone/IPv4/digit rules from quality.PII_RULES, applied
    to strings the synthetic corpus doesn't contain — and the same
    chain through DuckDB's regexp_replace to prove the RE2-safe
    portability claim in the docstring."""
    import duckdb

    from barco_spark.operators.quality import PII_RULES, mask_pii

    cases = [
        ("mail me at jane.doe+spam@example.co.uk today", "mail me at <EMAIL> today"),
        ("call +1 (415) 555-0199 now", "call <PHONE> now"),
        ("host 192.168.1.254 is up", "host <IP> is up"),
        ("order 123456 shipped", "order <ID> shipped"),
        ("no pii here", "no pii here"),
        # chained: typed tags win over the generic digit rule
        (
            "a@b.io or 10.0.0.1 or 99",
            "<EMAIL> or <IP> or <ID>",
        ),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], ["s"])
    got = [r.m for r in df.select(mask_pii(F.col("s")).alias("m")).collect()]
    assert got == [want for _, want in cases]

    con = duckdb.connect()
    for (raw, want) in cases:
        expr = "s"
        for _, pat, tag in PII_RULES:
            expr = f"regexp_replace({expr}, '{pat}', '{tag}', 'g')"
        duck = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS s)", [raw]
        ).fetchone()[0]
        assert duck == want, (raw, duck)
    con.close()


def test_pii_pseudonymize_masks_all_digits(spark, sf_dir):
    """Every digit in c_name is accounted for: sum(digits_masked) must
    equal the raw digit count, and no masked form may contain a digit."""
    from barco_spark.operators.quality import pii_pseudonymize

    rows = pii_pseudonymize(spark, sf_dir).collect()
    total_masked = sum(r.digits_masked for r in rows)
    raw = (
        t(spark, sf_dir, "customer")
        .select(
            F.sum(
                F.length("c_name") - F.length(F.regexp_replace("c_name", "[0-9]", ""))
            ).alias("n")
        )
        .collect()[0]
        .n
    )
    assert total_masked == raw > 0


def test_priority_sample_deterministic_and_weight_biased(spark, sf_dir):
    """Priority sampling: exactly k rows, identical across runs, and
    weight-biased — the kept docs' mean n_chars exceeds the corpus mean
    (w/u priorities favor heavy docs; Duffield-Lund-Thorup)."""
    from barco_spark.registry import load_all

    q = load_all()["weighted_sample_priority"]
    a = [tuple(r) for r in q.build(spark, sf_dir).collect()]
    b = [tuple(r) for r in q.build(spark, sf_dir).collect()]
    assert a == b
    assert len(a) == 100
    from barco_spark.tables import t

    corpus_mean = t(spark, sf_dir, "documents").agg({"n_chars": "avg"}).first()[0]
    kept_mean = sum(r[2] for r in a) / len(a)
    assert kept_mean > corpus_mean


def test_dsir_band_and_target_bias(spark, sf_dir):
    """DSIR importance band keeps ~top-20% and is biased toward the
    target language: en docs are over-represented among kept docs
    relative to the corpus (their features score log(ct/cr) ~ 0;
    non-target features go negative)."""
    from barco_spark.operators.dsir import KEEP_TOP
    from barco_spark.registry import load_all

    rows = load_all()["dsir_importance_weights"].build(spark, sf_dir).collect()
    n = len(rows)
    kept = [r for r in rows if r["kept"]]
    assert abs(len(kept) / n - KEEP_TOP) < 0.05
    en_share_all = sum(1 for r in rows if r["lang"] == "en") / n
    en_share_kept = sum(1 for r in kept if r["lang"] == "en") / len(kept)
    assert en_share_kept > en_share_all


def test_bpe_pairs_shape(spark, sf_dir):
    """Every BPE merge candidate is exactly 2 chars and counts are
    positive, descending."""
    from barco_spark.registry import load_all

    rows = load_all()["bpe_merge_pairs"].build(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    assert all(len(r["pair"]) == 2 for r in rows)
    counts = [r["pair_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert counts[-1] > 0


def test_exact_substring_spans_constructed(spark, tmp_path):
    """Two docs sharing an identical 120-char prefix must each report
    ONE duplicated span of exactly 120 chars (anchors 1..71 all match,
    islands merge them, span = [1, 120]); a unique doc reports nothing."""
    import pandas as pd

    shared = "".join(chr(ord("a") + (i * 7) % 26) for i in range(120))
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                shared + " tail one unique to doc1 xxxxxxxxxxxxxxxxx",
                shared + " another completely different tail yyyyyy",
                "entirely unique text with no repeats at all " * 3,
            ],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
        }
    )
    docs["n_chars"] = docs["text"].str.len().astype("int64")
    docs.to_parquet(tmp_path / "documents.parquet")

    from barco_spark.registry import load_all

    rows = {
        r["doc_id"]: r
        for r in load_all()["dedup_exact_substring"]
        .build(spark, str(tmp_path))
        .collect()
    }
    assert set(rows) == {1, 2}
    for d in (1, 2):
        assert rows[d]["n_spans"] == 1
        assert rows[d]["dup_chars"] == 120


def test_pagerank_floor_and_centrality(spark, sf_dir):
    """Fixed-point PageRank invariants: every node holds at least the
    teleport base; some connected node exceeds it; ranks are
    deterministic across runs (integer arithmetic, no float folds)."""
    from barco_spark.operators.graph import N_ITER, SCALE
    from barco_spark.registry import load_all

    q = load_all()["pagerank_similarity_graph"]
    a = sorted(tuple(r) for r in q.build(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in q.build(spark, sf_dir).collect())
    assert a == b
    assert len(a) > 0
    n = len(a)
    base = (15 * SCALE // 100) // n
    ranks = [r for _, r in a]
    assert all(r >= base for r in ranks)
    assert max(ranks) > base


def test_leakage_safe_split_one_split_per_source(spark, sf_dir):
    """The grouped split's whole point: every source maps to exactly
    one split, and the doc totals cover the corpus."""
    from barco_spark.registry import load_all
    from barco_spark.tables import t

    rows = load_all()["leakage_safe_split"].build(spark, sf_dir).collect()
    per_source = {}
    for r in rows:
        per_source.setdefault(r["source"], set()).add(r["split"])
    assert all(len(s) == 1 for s in per_source.values()), per_source
    total = sum(r["n_docs"] for r in rows)
    assert total == t(spark, sf_dir, "documents").count()


def test_cdc_chunks_resync_under_shift(spark, tmp_path):
    """The CDC property: doc2 = one extra word prepended to doc1.
    Fixed-width chunking shares (almost) nothing between the two, but
    content-defined boundaries re-synchronize, so the CDC report must
    see a large duplicated chunk mass; and a corpus of two identical
    docs must report ~all mass duplicated."""
    import pandas as pd

    base = " ".join(f"w{(i * 13) % 97}tok" for i in range(400))
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [base, "SHIFT " + base, "solo " * 50],
            "lang": ["en"] * 3,
            "source": ["a", "a", "b"],
        }
    )
    docs["n_chars"] = docs["text"].str.len().astype("int64")
    docs.to_parquet(tmp_path / "documents.parquet")

    from barco_spark.registry import load_all

    rows = {
        r["source"]: r
        for r in load_all()["dedup_cdc_chunks"]
        .build(spark, str(tmp_path))
        .collect()
    }
    a = rows["a"]
    # shifted copy: boundaries re-anchor after the first chunk, so the
    # overwhelming majority of chunk mass must be flagged duplicated
    assert a["dup_mass"] / a["total_mass"] > 0.9
    # the unique doc reports zero duplication
    assert rows["b"]["dup_chunks"] == 0


def test_cross_split_leakage_detects_planted_pair(spark, tmp_path):
    """A planted near-duplicate whose endpoints hash to different
    splits (doc 0 -> train, doc 8 -> test under the 80/10/10 h28
    bucketing) must surface as exactly one leak pair with the correct
    split labels; the unrelated doc 1 (train) must not pair with
    anything."""
    from barco_spark.operators.dedup import cross_split_leakage

    base = " ".join(f"w{i}" for i in range(30))
    rows = [
        (0, base, "en", "s0", len(base)),
        (8, base + " tail", "en", "s0", len(base) + 5),
        (1, " ".join(f"z{i}" for i in range(30)), "en", "s0", 100),
    ]
    df = spark.createDataFrame(
        rows, "doc_id: bigint, text: string, lang: string, "
        "source: string, n_chars: bigint"
    )
    d = str(tmp_path / "leak")
    df.write.parquet(d + "/documents.parquet")
    out = cross_split_leakage(spark, d).collect()
    assert [(r.doc_a, r.doc_b, r.split_a, r.split_b) for r in out] == [
        (0, 8, "train", "test")
    ], out
    assert out[0].jaccard >= 0.4


def test_spread_rows_is_noop_below_one_task_of_rows(spark, sf_dir):
    """spread_rows must add NO exchange when the corpus fits one task's
    row budget (the small-SF / warehouse-width no-op guard): the
    driver's correctness SFs run the exact pre-spread plans."""
    from barco_spark.plans import explain_str
    from barco_spark.tables import spread_rows, t

    base = t(spark, sf_dir, "documents")
    out = spread_rows(base, spark, sf_dir, "doc_id")  # 500 rows -> n=1
    assert out is base


def test_spread_row_guard_is_noop_on_small_tables(spark, sf_dir):
    """spread(..., rows_per_task=N): the keyless spread's row guard
    (r12) must return the frame UNCHANGED when the table fits one
    task's row budget — the driver's correctness SFs keep their exact
    pre-spread plans (the unpivot contract depends on this) — and
    must round-robin to ceil(rows/N) capped at the parallelism when
    the budget is exceeded, preserving the row set."""
    from barco_spark.tables import spread, t

    base = t(spark, sf_dir, "lineitem").select("l_orderkey")
    out = spread(base, spark, sf_dir, "lineitem", rows_per_task=10**9)
    assert out is base

    n_rows = base.count()
    out2 = spread(base, spark, sf_dir, "lineitem", rows_per_task=100)
    par = spark.sparkContext.defaultParallelism
    want = min(par, -(-n_rows // 100))
    if want > 1:
        assert out2.rdd.getNumPartitions() == want
        assert sorted(r.l_orderkey for r in out2.collect()) == sorted(
            r.l_orderkey for r in base.collect()
        )


def test_spread_rows_hash_partitions_without_row_change(spark, sf_dir):
    """With a small rows_per_task the helper must hash-repartition on
    the key (deterministic, no round-robin sort) and preserve the row
    set exactly — the property every spread call site relies on."""
    from barco_spark.plans import explain_str
    from barco_spark.tables import spread_rows, t

    base = t(spark, sf_dir, "documents").select("doc_id")
    out = spread_rows(base, spark, sf_dir, "doc_id", rows_per_task=50)
    plan = explain_str(out, "simple")
    assert "hashpartitioning(doc_id" in plan
    assert "roundrobin" not in plan.lower()
    par = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == min(par, 10)  # ceil(500/50)
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in base.collect()
    )
