"""Semantic properties of the corpus-LM / IR operators (corpus_lm.py).

Oracle parity is covered by tests/test_oracle_parity.py (all five are
registered with DuckDB oracles); these tests pin the *semantics* the
oracle alone can't express: conservation laws, band widths, ranking
invariants, and coverage.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from barco_spark.operators import corpus_lm as cl
from barco_spark.operators.quality import CHUNK
from barco_spark.tables import t


def test_chunk_rewrite_conserves_chunks(spark, sf_dir):
    out = cl.dedup_chunk_rewrite(spark, sf_dir)
    agg = out.agg(
        F.sum("n_chunks").alias("total"),
        F.sum("n_kept").alias("kept"),
        F.sum("n_dropped").alias("dropped"),
    ).collect()[0]
    assert agg.total == agg.kept + agg.dropped
    assert agg.dropped >= 0 and agg.kept > 0
    # every doc survives as a row, even if fully deduplicated
    n_docs = t(spark, sf_dir, "documents").count()
    assert out.count() == n_docs


def test_chunk_rewrite_kept_chunks_are_unique_corpus_wide(spark, sf_dir):
    out = cl.dedup_chunk_rewrite(spark, sf_dir)
    # re-chunk the rebuilt corpus: no chunk string may appear twice
    # (kept chunks are exactly the first occurrence per chunk hash)
    rechunk = out.where(F.col("new_text") != "").select(
        F.explode(F.split(F.col("new_text"), " ")).alias("w")
    )
    # cheaper exact check: total kept chunks == distinct kept chunk texts
    kept = out.agg(F.sum("n_kept")).collect()[0][0]
    chunks = (
        out.where(F.col("new_text") != "")
        .select("doc_id", F.split(F.col("new_text"), " ").alias("words"))
        .select(
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        ((F.size("words") + (CHUNK - 1)) / CHUNK).cast("int")
                        - 1,
                    ),
                    lambda j: F.concat_ws(
                        " ", F.slice(F.col("words"), j * CHUNK + 1, CHUNK)
                    ),
                )
            ).alias("chunk")
        )
    )
    assert rechunk.count() > 0
    # NOTE: chunk boundaries shift after dropping interior chunks, so we
    # verify uniqueness on the *decision* layer instead: recompute the
    # original chunks and check each duplicated hash was kept exactly once.
    w = F.split(F.col("text"), " ")
    orig = (
        t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        ((F.size(w) + (CHUNK - 1)) / CHUNK).cast("int") - 1,
                    ),
                    lambda j: F.concat_ws(" ", F.slice(w, j * CHUNK + 1, CHUNK)),
                )
            ).alias("chunk"),
        )
    )
    n_distinct = orig.select("chunk").distinct().count()
    assert kept == n_distinct
    assert chunks.count() >= 0  # rebuilt corpus re-chunks without error


def test_unigram_band_filter_width(spark, sf_dir):
    out = cl.unigram_logprob_quality(spark, sf_dir).cache()
    try:
        per_lang = (
            out.groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("kept").cast("int")).alias("n_kept"),
            )
            .collect()
        )
        for r in per_lang:
            share = r.n_kept / r.n
            # percent_rank band [0.05, 0.95] keeps ~90% (exact fraction
            # depends on partition size; allow discretization slack)
            assert 0.80 <= share <= 1.0, (r.lang, share)
        # scores are sane: 0 <= mean_log2 <= log2(total token count)
        import math

        total = (
            t(spark, sf_dir, "documents")
            .select(F.explode(F.split("text", " ")))
            .count()
        )
        bounds = out.agg(
            F.min("mean_log2").alias("lo"), F.max("mean_log2").alias("hi")
        ).collect()[0]
        assert bounds.lo >= 0.0
        assert bounds.hi <= math.log2(total)
    finally:
        out.unpersist()


def test_unigram_scoring_join_is_broadcast(spark, sf_dir):
    plan = cl.unigram_logprob_quality(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_inverted_index_invariants(spark, sf_dir):
    rows = cl.inverted_index_topdocs(spark, sf_dir).collect()
    assert rows, "index must be non-empty"
    for r in rows:
        assert r.df >= cl.MIN_DF
        docs = r.top_docs.split(",")
        tfs = [int(x) for x in r.top_tfs.split(",")]
        assert 1 <= len(docs) <= cl.TOP_DOCS
        assert len(docs) == len(tfs)
        assert tfs == sorted(tfs, reverse=True), "postings ranked by tf desc"


def test_bigram_lift_ranking(spark, sf_dir):
    rows = cl.bigram_lift_top(spark, sf_dir).collect()
    assert len(rows) == cl.TOP_BIGRAMS
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    assert all(lf > 0 for lf in lifts)
    for r in rows:
        # lift definition holds: c12 * T / (c1*c2) with integer inputs
        assert r.c12 >= 1 and r.c1 >= r.c12 and r.c2 >= r.c12


def test_chunk_overlap_covers_every_token(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n")
    )
    out = cl.doc_chunk_overlap(spark, sf_dir)
    per_doc = out.groupBy("doc_id").agg(
        F.max("chunk_id").alias("last_id"),
        F.sum("n_chunk_tokens").alias("token_slots"),
        F.max("n_chunk_tokens").alias("max_w"),
    )
    j = docs.join(per_doc, "doc_id")
    bad = j.where(
        # the last window must reach the end of the doc:
        # last window starts at last_id*S+1 and has n - last_id*S tokens
        (F.col("last_id") * cl.CHUNK_S + F.col("max_w") < F.col("n"))
        | (F.col("max_w") > cl.CHUNK_W)
    ).count()
    assert bad == 0
    # every doc chunked
    assert j.count() == docs.count()


def test_pretrain_pipeline_funnel_conservation(spark, sf_dir):
    from barco_spark.operators.pipeline import (
        _DECON_EVAL_MOD,
        pretrain_corpus_pipeline,
    )

    rows = pretrain_corpus_pipeline(spark, sf_dir).collect()
    assert rows
    docs = t(spark, sf_dir, "documents")
    n_train = docs.where(F.col("doc_id") % _DECON_EVAL_MOD != 0).count()
    assert sum(r.n_input for r in rows) == n_train
    for r in rows:
        assert r.n_final == r.n_input - r.n_quality_dropped - r.n_contaminated
        assert 0 <= r.n_quality_dropped <= r.n_input
        assert 0 <= r.n_contaminated <= r.n_input - r.n_quality_dropped
        assert r.n_chunks_dropped >= 0
        assert r.final_tokens >= 0
        # a source with zero final docs must report zero final tokens
        if r.n_final == 0:
            assert r.final_tokens == 0


def test_kgrams_matches_naive_on_edges(spark):
    """kgrams (zip-slice) must equal the naive definition on edge
    shapes: len < k (whole-text fallback), len == k (one gram),
    len == k+1 (two grams), repeated tokens, empty-string tokens."""
    from barco_spark.operators.text import kgrams

    rows = [
        ("a",),                     # 1 word, k>len
        ("a b",),                   # len < 3
        ("a b c",),                 # len == 3 -> one 3-gram
        ("a b c d",),               # two 3-grams
        ("x x x x x",),             # repeats
        ("a  b",),                  # split on ' ' yields empty token
    ]
    df = spark.createDataFrame(rows, "text string")
    out = df.select(
        F.col("text"),
        kgrams(F.split("text", " "), 3).alias("grams"),
    ).collect()
    got = {r.text: r.grams for r in out}

    def naive(text, k=3):
        ws = text.split(" ")
        if len(ws) < k:
            return [" ".join(ws)]
        return [" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)]

    for (text,) in rows:
        assert got[text] == naive(text), (text, got[text], naive(text))


def test_bm25_ranking_invariants(spark, sf_dir):
    out = cl.bm25_topdocs(spark, sf_dir).collect()
    assert 0 < len(out) <= cl.BM25_TOP
    scores = [r.bm25 for r in out]
    assert scores == sorted(scores, reverse=True)
    for r in out:
        # only docs containing at least one query term may rank
        assert r.tf_hash + r.tf_merge + r.tf_scan >= 1
        assert r.bm25 > 0.0
        assert r.dl > 0


def test_boilerplate_strip_semantics(spark, sf_dir):
    out = cl.boilerplate_strip(spark, sf_dir)
    agg = out.agg(
        F.sum("n_chunks").alias("total"),
        F.sum("n_kept").alias("kept"),
        F.sum("n_boiler").alias("boiler"),
    ).collect()[0]
    assert agg.total == agg.kept + agg.boiler
    assert agg.boiler > 0  # corpus has cross-doc template chunks
    # independent recomputation: boiler occurrences are exactly the
    # chunk occurrences whose chunk text spans >= BOILER_MIN_DDF docs
    docs = t(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    n_chunks = F.expr(f"(size(split(text, ' ')) + {CHUNK - 1}) div {CHUNK}")
    chunks = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), (n_chunks - 1).cast("int")),
                lambda j: F.concat_ws(" ", F.slice(w, j * CHUNK + 1, CHUNK)),
            )
        ).alias("chunk"),
    )
    ddf = chunks.groupBy("chunk").agg(
        F.countDistinct("doc_id").alias("ddf")
    )
    expected_boiler = (
        chunks.join(ddf, "chunk")
        .where(F.col("ddf") >= cl.BOILER_MIN_DDF)
        .count()
    )
    assert agg.boiler == expected_boiler


def test_boilerplate_surviving_chunks_are_single_doc(spark, sf_dir):
    out = cl.boilerplate_strip(spark, sf_dir)
    rechunked = (
        out.where(F.col("new_text") != "")
        .select("doc_id", F.split(F.col("new_text"), " ").alias("words"))
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        ((F.size("words") + (CHUNK - 1)) / CHUNK).cast("int") - 1,
                    ),
                    lambda j: F.concat_ws(
                        " ", F.slice(F.col("words"), j * CHUNK + 1, CHUNK)
                    ),
                )
            ).alias("chunk"),
        )
    )
    multi_doc = (
        rechunked.groupBy("chunk")
        .agg(F.countDistinct("doc_id").alias("ddf"))
        .where(F.col("ddf") >= cl.BOILER_MIN_DDF)
        .count()
    )
    assert multi_doc == 0
