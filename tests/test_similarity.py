"""ANN quality contracts: the approximate paths must actually find
neighbors, not just run.

Recall@3 against the brute-force baseline (ann_cosine_topk) on the
synthetic embeddings (near-random vectors, so these are hard inputs —
planted duplicates would score higher). Everything is deterministic
(fixed hyperplanes / stride-sampled centroids, sequential folds), so
exact thresholds are stable.
"""

from __future__ import annotations

from barco_spark.registry import load_all

QUERIES = load_all()


def _top3(spark, sf_dir, name):
    out: dict[int, set[int]] = {}
    for r in QUERIES[name].build(spark, sf_dir).collect():
        if r.rank <= 3:
            out.setdefault(r.query_id, set()).add(r.cand_id)
    return out


def _recall(brute, approx):
    hit = sum(len(brute[q] & approx.get(q, set())) for q in brute)
    total = sum(len(v) for v in brute.values())
    return hit / total


def test_ivf_recall_vs_brute(spark, sf_dir):
    brute = _top3(spark, sf_dir, "ann_cosine_topk")
    ivf = _top3(spark, sf_dir, "ann_ivf_search")
    # the synthetic corpus is near-uniform (no cluster structure), so
    # expected recall ~ probed fraction = nprobe/ceil(sqrt(N)) = 8/23
    # ~ 0.35 at sf0.001; observed 0.53 (neighbors correlate with cells
    # even on random data). Clustered real corpora score far higher.
    assert _recall(brute, ivf) >= 0.4


def test_lsh_recall_vs_brute(spark, sf_dir):
    brute = _top3(spark, sf_dir, "ann_cosine_topk")
    lsh = _top3(spark, sf_dir, "ann_lsh_search")
    # observed 0.8 at sf0.001 with 4 tables x 4 bits (single-table
    # 8-bit bucketing scored 0.067 on the same data)
    assert _recall(brute, lsh) >= 0.5


def test_lsh_probes_less_than_brute(spark, sf_dir):
    """The scale contract: LSH scores strictly fewer candidate pairs
    than the cross join (otherwise it's just brute force in disguise)."""
    from pyspark.sql import functions as F

    from barco_spark.operators.similarity import (
        L_TABLES,
        N_QUERY,
        _bucket_col,
        _table_planes,
    )
    from barco_spark.tables import t

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    buckets = F.array(
        *[_bucket_col(F.col("v"), _table_planes(tbl)) for tbl in range(L_TABLES)]
    )
    exploded = e.select("vec_id", F.posexplode(buckets).alias("tbl", "bucket"))
    q = exploded.filter(F.col("vec_id") < N_QUERY).selectExpr(
        "vec_id AS query_id", "tbl", "bucket"
    )
    c = exploded.filter(F.col("vec_id") >= N_QUERY).selectExpr(
        "vec_id AS cand_id", "tbl", "bucket"
    )
    n_pairs = (
        q.join(c, ["tbl", "bucket"]).select("query_id", "cand_id").distinct().count()
    )
    n_brute = q.select("query_id").distinct().count() * c.select(
        "cand_id"
    ).distinct().count()
    assert n_pairs < n_brute / 2, (n_pairs, n_brute)


def test_ivf_exact_twin_recall_vs_brute(spark, sf_dir):
    brute = _top3(spark, sf_dir, "ann_cosine_topk")
    fast = _top3(spark, sf_dir, "ann_ivf_search_exact")
    # same IVF structure as the canonical ann_ivf_search (see its
    # threshold comment); fold-path ties may differ from numpy argmax
    # on exact ties only
    assert _recall(brute, fast) >= 0.4


def test_kmeans_monotone_and_covering(spark, sf_dir):
    from pyspark.sql import functions as F

    from barco_spark.operators.similarity import kmeans_embeddings, kmeans_fit
    from barco_spark.tables import t

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    n = e.count()
    _, hist = kmeans_fit(e, k=8, iters=4)
    assert len(hist) == 4
    # Lloyd's never increases inertia
    assert all(b <= a * (1 + 1e-9) for a, b in zip(hist, hist[1:]))

    out = kmeans_embeddings(spark, sf_dir).collect()
    assert sum(r.n_points for r in out) == n
    assert all(r.inertia >= 0 for r in out)
    assert len(out) <= 16


def test_kmeans_sparse_ids_and_small_corpus(spark):
    """Init must not assume dense contiguous vec_ids, and k larger than
    the corpus must clamp instead of crashing."""
    from pyspark.sql import functions as F

    from barco_spark.operators.similarity import kmeans_fit

    odd = spark.range(50).select(
        (F.col("id") * 2 + 1).alias("vec_id"),
        F.array(F.col("id").cast("double"), F.lit(1.0)).alias("v"),
    )
    centroids, hist = kmeans_fit(odd, k=8, iters=2)
    assert centroids.shape == (8, 2) and len(hist) == 2

    tiny = spark.range(3).select(
        F.col("id").alias("vec_id"),
        F.array(F.col("id").cast("double")).alias("v"),
    )
    centroids, _ = kmeans_fit(tiny, k=16, iters=1)
    assert centroids.shape[0] == 3  # clamped to corpus size


def test_dedup_embedding_vectorized_matches_fold_twin(spark, sf_dir):
    """The numpy blocked dedup must find exactly the canonical twin's
    pair set, with cosines equal to fp tolerance (summation order is
    the only allowed difference)."""
    from barco_spark.operators.similarity import (
        dedup_embedding_cosine,
        dedup_embedding_vectorized,
    )

    fold = {
        (r.vec_a, r.vec_b): (r.cell, r.cosine_sim)
        for r in dedup_embedding_cosine(spark, sf_dir).collect()
    }
    vec = {
        (r.vec_a, r.vec_b): (r.cell, r.cosine_sim)
        for r in dedup_embedding_vectorized(spark, sf_dir).collect()
    }
    assert set(fold) == set(vec)
    for k, (cell_f, cos_f) in fold.items():
        cell_v, cos_v = vec[k]
        assert cell_f == cell_v, (k, cell_f, cell_v)
        assert abs(cos_f - cos_v) < 1e-9, (k, cos_f, cos_v)
    assert fold  # non-empty at every test SF


def test_semdedup_prune_agrees_with_pair_list(spark, sf_dir):
    """The retention report must be exactly derivable from the
    canonical cell-blocked pair list: dropped = distinct vec_b."""
    from barco_spark.operators.similarity import (
        dedup_embedding_cosine,
        semdedup_prune,
    )
    from barco_spark.tables import t as _t

    pairs = dedup_embedding_cosine(spark, sf_dir)
    expected_drops = {r.vec_b for r in pairs.select("vec_b").distinct().collect()}
    rep = semdedup_prune(spark, sf_dir).collect()
    assert sum(r.n_dropped for r in rep) == len(expected_drops)
    n = _t(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vectors for r in rep) == n
    for r in rep:
        assert r.n_kept + r.n_dropped == r.n_vectors
        assert 0.0 < r.retention <= 1.0


def test_int8_recall_high_on_isotropic_corpus(spark, sf_dir):
    """Symmetric int8 quantization is representation-agnostic: even on
    the near-random fixture embeddings the quantized cosine ranking
    must reproduce almost all of the exact top-3 (observed 14/15 at
    sf0.001; a regression here means the quantizer or the integer fold
    broke, since 8-bit error is far below the corpus' score gaps)."""
    rows = QUERIES["ann_int8_recall"].build(spark, sf_dir).collect()
    assert sum(r.n_hits for r in rows) >= 12, rows


def test_matryoshka_gate_fails_isotropic_passes_prefix_structured(
    spark, tmp_path, sf_dir
):
    """The truncation gate must tell the truth in both directions.
    Isotropic random embeddings have NO prefix structure, so
    truncating to 16 of 64 dims destroys the ranking and the gate
    reports near-zero recall (observed 1/15 at sf0.001) — the correct
    'do not truncate these' answer. A prefix-structured corpus (all
    signal in the first 16 dims, the shape MRL training produces)
    must score perfect recall."""
    rows = QUERIES["ann_matryoshka_recall"].build(spark, sf_dir).collect()
    assert sum(r.n_hits for r in rows) <= 5, rows

    # prefix-ones candidates: cos(q, c_i) = sqrt(i+1)/4, strictly
    # increasing and well separated; tails are ~1e-3 so full-dim and
    # truncated rankings provably agree
    def vec(i):
        head = [1.0 if j <= i else 0.0 for j in range(16)]
        tail = [0.001 * ((i + j) % 3) for j in range(48)]
        return head + tail

    data = [(0, [1.0] * 16 + [0.0] * 48, 0)] + [
        (5 + i, vec(i), 0) for i in range(10)
    ]
    df = spark.createDataFrame(
        data, "vec_id: bigint, embedding: array<float>, label: int"
    )
    d = str(tmp_path / "prefix")
    df.write.parquet(d + "/embeddings.parquet")
    out = QUERIES["ann_matryoshka_recall"].build(spark, d).collect()
    assert [(r.query_id, r.n_hits) for r in out] == [(0, 3)], out


def test_mmr_defers_planted_near_duplicate(spark, tmp_path):
    """The diversity property on a crafted corpus: candidates 5 and 6
    are near-duplicates (mutual cosine ~1.0) and both far more
    relevant (cos ~0.80) than the diverse candidate 7 (cos ~0.59).
    Relevance ranking is [6, 5, 7]; MMR must pick 6, then skip the
    near-dup 5 in favor of 7, then take 5 last — hand-computed mmr2:
    7 -> 0.305 vs 5 -> 0.260."""
    data = [
        (0, [1.0, 0.0, 0.0], 0),
        (5, [4.0, 3.0, 0.0], 0),
        (6, [4.05, 3.0, 0.0], 0),
        (7, [3.0, -1.0, 4.0], 0),
    ]
    df = spark.createDataFrame(
        data, "vec_id: bigint, embedding: array<float>, label: int"
    )
    d = str(tmp_path / "mmr")
    df.write.parquet(d + "/embeddings.parquet")
    out = QUERIES["mmr_diverse_rerank"].build(spark, d).collect()
    picks = [r.cand_id for r in sorted(out, key=lambda r: r.mmr_rank)]
    assert picks == [6, 7, 5], out


def test_kmeans_int8_covering_and_deterministic(spark, sf_dir):
    """The oracle-paired integer twin (kmeans_int8_clusters): every
    vector lands in exactly one cluster, inertia is a non-negative
    exact integer, and the whole fit is run-to-run deterministic
    (associative integer sums — the property the float fit lacks)."""
    from pyspark.sql import functions as F

    from barco_spark.operators.kmeans_int8 import KM_K, kmeans_int8_clusters
    from barco_spark.tables import t

    n = t(spark, sf_dir, "embeddings").count()
    out = kmeans_int8_clusters(spark, sf_dir).collect()
    assert 1 <= len(out) <= KM_K
    assert sum(r.n_members for r in out) == n
    assert all(r.inertia_int >= 0 for r in out)
    # vec_id checksum partitions the id space: totals must match too
    total_ids = t(spark, sf_dir, "embeddings").agg(
        F.sum("vec_id")
    ).collect()[0][0]
    assert sum(r.sum_vec_id for r in out) == total_ids

    again = kmeans_int8_clusters(spark, sf_dir).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_numpy_assign_kernel_bitexact_vs_sequential_fold():
    """The dim-order numpy kernels must equal a scalar left-to-right
    fold BIT-FOR-BIT (==, not approx): that equality is what lets the
    mapInPandas assignment serve oracle-paired queries. np.matmul
    would fail this test (blocked/FMA'd summation)."""
    import numpy as np

    from barco_spark.operators.similarity import _np_seq_dots, _np_seq_norm2

    rng = np.random.default_rng(7)
    M = rng.standard_normal((37, 64))
    C = rng.standard_normal((11, 64))
    n2 = _np_seq_norm2(M)
    dots = _np_seq_dots(M, C)
    for r in range(M.shape[0]):
        acc = 0.0
        for i in range(64):
            acc += M[r, i] * M[r, i]
        assert acc == n2[r]
        for j in range(C.shape[0]):
            acc = 0.0
            for i in range(64):
                acc += M[r, i] * C[j, i]
            assert acc == dots[r, j]


def test_numpy_assign_path_matches_jvm_fold_path(spark, sf_dir):
    """Both _ASSIGN_NUMPY arms must produce IDENTICAL rows (cells and
    cosines bit-equal) on every consumer — the guarantee that flipping
    the flag can never change what a declared query computes."""
    from barco_spark.operators import similarity

    for name in (
        "dedup_embedding_cosine",
        "hard_negative_mining",
        "ann_ivf_search_exact",
    ):
        try:
            similarity._ASSIGN_NUMPY = True
            a = sorted(map(tuple, QUERIES[name].build(spark, sf_dir).collect()))
            similarity._ASSIGN_NUMPY = False
            b = sorted(map(tuple, QUERIES[name].build(spark, sf_dir).collect()))
        finally:
            similarity._ASSIGN_NUMPY = True
        assert a == b, name
        assert a, name  # non-empty at every test SF


def test_numpy_int8_quant_bitexact_vs_scalar_formula():
    """_np_int8_quant must reproduce the _absmax/_int8_quantize/_in2
    scalar sequence exactly: same absmax floor, same three roundings
    per element, exact integer sums."""
    import math

    import numpy as np

    from barco_spark.operators.similarity import _np_int8_quant

    rng = np.random.default_rng(11)
    M = rng.standard_normal((23, 64))
    q, n2 = _np_int8_quant(M)
    for r in range(M.shape[0]):
        m = max(max(abs(x) for x in M[r]), 1e-30)
        qs = [math.floor(x * 127.0 / m + 0.5) for x in M[r]]
        assert qs == list(q[r])
        assert sum(x * x for x in qs) == n2[r]


def test_numpy_score_path_matches_jvm_fold_path(spark, sf_dir):
    """Both _SCORE_NUMPY arms must produce IDENTICAL rows on every
    consumer of the brute scoring pass."""
    from barco_spark.operators import similarity

    for name in (
        "ann_cosine_topk",
        "ann_int8_recall",
        "ann_matryoshka_recall",
    ):
        try:
            similarity._SCORE_NUMPY = True
            a = sorted(map(tuple, QUERIES[name].build(spark, sf_dir).collect()))
            similarity._SCORE_NUMPY = False
            b = sorted(map(tuple, QUERIES[name].build(spark, sf_dir).collect()))
        finally:
            similarity._SCORE_NUMPY = True
        assert a == b, name
        assert a, name  # non-empty at every test SF


def test_kmeans_int8_numpy_arm_matches_fold_arm(spark, sf_dir):
    """Both _KM_NUMPY arms must produce IDENTICAL rows AND schema: the
    per-round Arrow kernel (quantize + integer-L2 assign + integer
    partial sums) is bit-exact vs the fold pipeline."""
    from barco_spark.operators import kmeans_int8 as km

    build = QUERIES["kmeans_int8_clusters"].build
    try:
        km._KM_NUMPY = True
        da = build(spark, sf_dir)
        a = sorted(map(tuple, da.collect()))
        km._KM_NUMPY = False
        db = build(spark, sf_dir)
        b = sorted(map(tuple, db.collect()))
    finally:
        km._KM_NUMPY = True
    assert da.schema == db.schema
    assert a == b
    assert a


def test_mmr_local_arm_matches_dataframe_arm(spark, sf_dir):
    """Both _MMR_LOCAL arms must produce IDENTICAL rows AND schema:
    the driver-side greedy mirrors the Column arithmetic exactly
    (sequential fold cosines, same literal mults, math.sqrt)."""
    from barco_spark.operators import similarity

    build = QUERIES["mmr_diverse_rerank"].build
    try:
        similarity._MMR_LOCAL = True
        da = build(spark, sf_dir)
        a = sorted(map(tuple, da.collect()))
        similarity._MMR_LOCAL = False
        db = build(spark, sf_dir)
        b = sorted(map(tuple, db.collect()))
    finally:
        similarity._MMR_LOCAL = True
    assert da.schema == db.schema
    assert a == b
    assert a


def test_mmr_local_arm_nan_greatest_matches_dataframe_arm(spark, tmp_path):
    """Degenerate corpus: a NaN embedding component makes a candidate's
    cosine (and hence its mmr score) NaN (a zero-norm vector instead
    raises loudly under ANSI division). The DataFrame arm's ORDER BY mmr DESC
    (and the DuckDB oracle) order NaN as the GREATEST double; the
    driver greedy must mirror that explicitly - bare Python NaN
    comparisons are order-dependent."""
    from barco_spark.operators import similarity

    data = [
        (0, [1.0, 0.0, 0.0], 0),
        (5, [4.0, 3.0, 0.0], 0),
        (6, [float("nan"), 0.0, 1.0], 0),  # NaN component: NaN cosine
        (7, [3.0, -1.0, 4.0], 0),
        (8, [2.0, 2.0, 1.0], 0),
    ]
    df = spark.createDataFrame(
        data, "vec_id: bigint, embedding: array<float>, label: int"
    )
    d = str(tmp_path / "mmr_nan")
    df.write.parquet(d + "/embeddings.parquet")
    build = QUERIES["mmr_diverse_rerank"].build
    try:
        similarity._MMR_LOCAL = True
        a = sorted(map(tuple, build(spark, d).collect()))
        similarity._MMR_LOCAL = False
        b = sorted(map(tuple, build(spark, d).collect()))
    finally:
        similarity._MMR_LOCAL = True

    def _norm(rows):
        # NaN != NaN; compare on a repr that makes NaN == NaN
        return [tuple(map(repr, r)) for r in rows]

    assert _norm(a) == _norm(b)
    assert a
