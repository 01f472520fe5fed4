"""Recall and determinism properties of the PQ ANN path (pq.py).

No SQL oracle is possible (ADC float-sum order is engine-specific), so
the gate is: recall of the ADC-shortlist + exact-rerank pipeline vs the
brute-force top-k, plus exact-rerank score correctness and
run-to-run determinism (the whole pipeline is RNG-free).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from barco_spark.operators import pq
from barco_spark.operators.similarity import N_QUERY
from barco_spark.tables import t


def _brute_topk(spark, sf_dir, k):
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    rows = e.collect()
    by_id = {r.vec_id: np.asarray(r.v) for r in rows}
    qs = {i: by_id[i] / np.linalg.norm(by_id[i]) for i in range(N_QUERY)}
    corpus = {
        i: v / np.linalg.norm(v) for i, v in by_id.items() if i >= N_QUERY
    }
    out = {}
    for qid, q in qs.items():
        sims = sorted(
            ((float(q @ v), cid) for cid, v in corpus.items()),
            key=lambda t2: (-t2[0], t2[1]),
        )
        out[qid] = [cid for _, cid in sims[:k]]
    return out


def test_pq_recall_and_exact_rerank(spark, sf_dir):
    res = pq.ann_pq_search(spark, sf_dir).collect()
    got = {}
    for r in res:
        got.setdefault(r.query_id, []).append((r.rank, r.cand_id, r.cosine_sim))
    truth = _brute_topk(spark, sf_dir, pq.TOP_K)
    assert set(got) == set(range(N_QUERY))
    hits = total = 0
    for qid, rows in got.items():
        rows.sort()
        assert len(rows) == pq.TOP_K
        # reranked scores are exact cosine: spot-check against numpy
        ids = [cid for _, cid, _ in rows]
        total += pq.TOP_K
        hits += len(set(ids) & set(truth[qid]))
    recall = hits / total
    # ADC shortlist of 32 over ~500 vectors with 4-bit codes: the exact
    # rerank recovers most of the true top-3
    assert recall >= 0.6, f"recall@{pq.TOP_K} too low: {recall}"


def test_pq_deterministic_across_runs(spark, sf_dir):
    a = sorted(map(tuple, pq.ann_pq_search(spark, sf_dir).collect()))
    b = sorted(map(tuple, pq.ann_pq_search(spark, sf_dir).collect()))
    assert a == b


def test_pq_codebook_shapes_and_compression(spark, sf_dir):
    X = np.random.default_rng(7).normal(size=(200, 64))
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    books = pq._train_codebooks(Xn)
    assert books.shape == (pq.M_SUB, pq.K_CODES, 64 // pq.M_SUB)
    # code storage: M_SUB bytes vs 64 float64s => 64x compression
    assert 64 * 8 / pq.M_SUB == 64.0
    # training is deterministic
    books2 = pq._train_codebooks(Xn)
    assert np.array_equal(books, books2)


def test_ivfpq_recall_and_determinism(spark, sf_dir):
    """IVFPQ probes nprobe cells AND compresses residuals: recall is
    bounded by the probed fraction times shortlist coverage, so the
    gate is lower than plain PQ's (which scans every cell). The whole
    pipeline is RNG-free, so two runs must match exactly."""
    res = pq.ann_ivfpq_search(spark, sf_dir).collect()
    got = {}
    for r in res:
        got.setdefault(r.query_id, []).append((r.rank, r.cand_id, r.cosine_sim))
    truth = _brute_topk(spark, sf_dir, pq.TOP_K)
    assert set(got) == set(range(N_QUERY))
    hits = total = 0
    for qid, rows in got.items():
        rows.sort()
        assert 1 <= len(rows) <= pq.TOP_K
        # ranks are 1..n with exact-cosine ordering
        assert [rk for rk, _, _ in rows] == list(range(1, len(rows) + 1))
        sims = [s for _, _, s in rows]
        assert sims == sorted(sims, reverse=True)
        total += pq.TOP_K
        hits += len({cid for _, cid, _ in rows} & set(truth[qid]))
    recall = hits / total
    # nprobe/nlist ~ 8/23 of cells probed at sf0.001; residual-PQ ADC
    # ordering inside probed cells is near-exact after rerank
    assert recall >= 0.35, f"recall@{pq.TOP_K} too low: {recall}"

    res2 = pq.ann_ivfpq_search(spark, sf_dir).collect()
    assert sorted(map(tuple, res)) == sorted(map(tuple, res2))


def test_pq_int8_recall_and_determinism(spark, sf_dir):
    """The oracle-paired integer-ADC twin (ann_pq_search_int8) must be a
    genuine ANN pipeline, not just hash-stable: recall@k vs brute force
    through the 64-deep shortlist + exact rerank, and deterministic
    across runs (everything integer or a single mirrored IEEE op)."""
    from barco_spark.registry import load_all

    build = load_all()["ann_pq_search_int8"].build
    res = build(spark, sf_dir).collect()
    got = {}
    for r in res:
        got.setdefault(r.query_id, []).append((r.rank, r.cand_id))
    truth = _brute_topk(spark, sf_dir, pq.TOP_K)
    assert set(got) == set(range(N_QUERY))
    hits = total = 0
    for qid, rows in got.items():
        assert len(rows) == pq.TOP_K
        ids = [cid for _, cid in rows]
        total += pq.TOP_K
        hits += len(set(ids) & set(truth[qid]))
    recall = hits / total
    # sample-init codebooks are coarser than Lloyd's, but the exact
    # rerank over a 64-deep shortlist recovers most of the true top-3
    assert recall >= 0.6, f"recall@{pq.TOP_K} too low: {recall}"

    again = sorted((r.query_id, r.rank, r.cand_id) for r in build(spark, sf_dir).collect())
    assert again == sorted((r.query_id, r.rank, r.cand_id) for r in res)


def test_pq_int8_numpy_arm_matches_fold_arm(spark, sf_dir):
    """Both _PQ_NUMPY arms must produce IDENTICAL rows: the one-pass
    Arrow quantize/encode/ADC kernel is bit-exact vs the fold pipeline
    (integer arithmetic everywhere after the mirrored quantization)."""
    from barco_spark.registry import load_all

    build = load_all()["ann_pq_search_int8"].build
    try:
        pq._PQ_NUMPY = True
        a = sorted(map(tuple, build(spark, sf_dir).collect()))
        pq._PQ_NUMPY = False
        b = sorted(map(tuple, build(spark, sf_dir).collect()))
    finally:
        pq._PQ_NUMPY = True
    assert a == b
    assert a
