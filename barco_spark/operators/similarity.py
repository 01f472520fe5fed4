"""Similarity search over the `embeddings` table (array<float>, 64-dim).

Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
variant (random-hyperplane signs) is the scale path — at 100 TB the
corpus is bucketed once and each query probes one bucket, so there is
no cross join.

Determinism contract with the oracle: vectors are cast float->double
(exact), dot products fold left-to-right (F.aggregate in Spark,
list_reduce in DuckDB — both sequential IEEE adds), sqrt is correctly
rounded, so cosine values match bit-for-bit.

No Python UDFs: zip_with/aggregate are JVM higher-order functions. A
vectorized pandas-UDF path for very wide vectors lives in
barco_spark/functions/vectors.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from barco_spark.registry import register
from barco_spark.tables import t

N_QUERY = 5  # vec_id < 5 are the query vectors
TOP_K = 5


def dot(a: str | Column, b: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm2(a: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    )


_DOT_SQL = (
    "list_reduce(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i]), "
    "(acc, x) -> acc + x)"
)
_NORM2_SQL = "list_reduce(list_transform({a}, x -> x * x), (acc, x) -> acc + x)"


def _cos_sql_fwd(a: str, b: str) -> str:
    """DuckDB cosine between two DOUBLE[] expressions (sequential folds,
    the same order the Spark-side folds use)."""
    return (
        f"{_DOT_SQL.format(a=a, b=b)}"
        f" / sqrt({_NORM2_SQL.format(a=a)} * {_NORM2_SQL.format(a=b)})"
    )


# (sf_dir, corpus_only) -> embeddings row count. Stride/nlist sizing
# needs the count before planning; it is a parquet-footer read but
# still one Spark job's scheduling round trip, and the whole
# ANN/embedding-dedup family pays it per query. A dataset path's count
# is constant for a session (test corpora immutable, scale-study
# corpora in unique temp dirs) — same discipline as dedup's
# _corpus_count.
_EMB_COUNT_CACHE: dict[tuple[str, bool], int] = {}


def _emb_count(spark: SparkSession, sf_dir: str, corpus_only: bool = False) -> int:
    key = (sf_dir, corpus_only)
    n = _EMB_COUNT_CACHE.get(key)
    if n is None:
        e = t(spark, sf_dir, "embeddings")
        if corpus_only:
            e = e.filter(F.col("vec_id") >= N_QUERY)
        n = e.count()
        _EMB_COUNT_CACHE[key] = n
    return n


def _spread(df: DataFrame, spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-robin a corpus-side embeddings frame across the session
    parallelism when the underlying scan is narrower (r12, guide §2.5;
    see tables.spread — this is the embeddings-table instance).  The
    cosine/assignment folds are interpreted higher-order functions
    (CodegenFallback), expensive per ROW; applied only at the
    assignment-heavy sites where the same-JVM A/B showed a win."""
    from barco_spark.tables import spread

    return spread(df, spark, sf_dir, "embeddings")


# --------------------------------------------------------------------------
# Bit-exact numpy cell assignment (r12, guide §4.2)
# --------------------------------------------------------------------------
# The stride-centroid argmax-cosine assignment is the N x sqrt(N) hot
# loop of the embedding-dedup family (dedup_embedding_cosine /
# semdedup_prune / hard_negative_mining / ann_ivf_search_exact).  The
# JVM form — broadcast cross join + aggregate(zip_with) folds +
# groupBy(max_by) — evaluates the folds INTERPRETED (CodegenFallback):
# ~75 s of task time cold / ~9 s warm at sf0.1 (event-log evidence,
# OPTIMIZATION_r12.md).  This kernel computes the SAME doubles
# bit-for-bit: each dimension step is a separate vectorized float64
# mul + add, so per (row, centroid) the IEEE operation sequence is
# exactly the sequential fold's (one rounding per mul, one per add,
# dims in ascending order).  np.matmul/gemm would NOT be (it
# blocks/reorders/FMAs — measured bitwise-different on ~70% of
# normalized vectors, see the ann_ivf_search registration note); the
# dim-order loop is the reason this path can serve ORACLE-PAIRED
# queries.  argmax ties break to the FIRST index — the lowest centroid
# id once the collected centroids are sorted — matching
# max_by(struct(cos, -centroid_id)); all-NaN rows (zero vectors)
# likewise argmax to index 0 = lowest id, the max_by tie-break result.
_ASSIGN_NUMPY = True  # A/B + parity hook: scripts/ab_assign_numpy.py


def _np_seq_norm2(M):
    """Sequential-order squared norms: bit-exact twin of norm2()."""
    import numpy as np

    n2 = np.zeros(M.shape[0], dtype=np.float64)
    for i in range(M.shape[1]):
        c = M[:, i]
        n2 += c * c
    return n2


def _np_seq_dots(M, C):
    """(rows x cents) dot products folded dim-by-dim: bit-exact twin
    of dot() — one (rows, cents) accumulator, dims in order."""
    import numpy as np

    acc = np.zeros((M.shape[0], C.shape[0]), dtype=np.float64)
    for i in range(M.shape[1]):
        acc += M[:, i, None] * C[None, :, i]
    return acc


def _assign_cells_numpy(
    df: DataFrame,
    spark: SparkSession,
    cent_df: DataFrame,
    schema: str,
    passthrough: tuple[str, ...],
    vec_col: str,
    n2_name: str = "n2",
    cell_name: str = "cell",
) -> DataFrame:
    """(passthrough..., vec, n2, cell) in ONE Arrow pass (mapInPandas),
    replacing the broadcast cross join + interpreted folds +
    groupBy(max_by).  `cent_df` is the bounded stride sample
    ((centroid_id, vector) — ~sqrt(N) rows, the ann_ivf_search collect
    precedent): collected once, broadcast to every task.  `schema`
    must list passthrough columns, then vec_col, then n2, then cell."""
    import numpy as np
    import pandas as pd

    rows = cent_df.collect()
    # ascending centroid ids: np.argmax breaks ties toward the FIRST
    # index, which must be the lowest id (the max_by tie-break)
    rows.sort(key=lambda r: r[0])
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    C = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    n2c = _np_seq_norm2(C)
    bc = spark.sparkContext.broadcast((ids, C, n2c))

    def assign(batches):
        ids_, C_, n2c_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf[vec_col].map(np.asarray).values)
            n2 = _np_seq_norm2(M)
            cos = _np_seq_dots(M, C_) / np.sqrt(n2[:, None] * n2c_[None, :])
            data = {c: pdf[c] for c in passthrough}
            data[vec_col] = pdf[vec_col]
            data[n2_name] = n2
            data[cell_name] = ids_[np.argmax(cos, axis=1)]
            yield pd.DataFrame(data)

    return df.mapInPandas(assign, schema)


# The broadcast brute query-scoring pass (broadcast(q).crossJoin(c) +
# per-pair interpreted cosine folds) is the other family hot loop:
# N_QUERY folds per corpus row, plus per-pair norm folds where the
# norms are not factored out.  Same treatment as _assign_cells_numpy:
# the query set is bounded (N_QUERY rows), collected and broadcast;
# the corpus crosses the Arrow boundary once; dim-order numpy folds
# keep every double bit-identical to the JVM/DuckDB sequential folds.
_SCORE_NUMPY = True  # A/B + parity hook: scripts/ab_score_numpy.py


def _collect_queries(q_df):
    """Collect a bounded (query_id, vector) frame, sorted by id."""
    import numpy as np

    rows = q_df.collect() if not isinstance(q_df, list) else q_df
    rows = sorted(rows, key=lambda r: r[0])
    qids = np.array([r[0] for r in rows], dtype=np.int64)
    Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    return qids, Q


def _cos_scores_numpy(
    spark: SparkSession,
    q_df,
    c_df: DataFrame,
    c_id: str = "cand_id",
    c_vec: str = "cv",
    out: str = "cosine_sim",
    ndims: int | None = None,
    carry_vec: bool = False,
) -> DataFrame:
    """(query_id, c_id[, c_vec], out) for every (query, candidate)
    pair — the brute scoring pass as ONE Arrow pass over the corpus.
    `q_df` is the bounded query frame (query_id, vector) or its
    pre-collected rows.  With `ndims`, both sides fold over the
    dimension prefix only (the matryoshka gate's sliced cosine).
    cos = dot / sqrt(n2q * n2c) with dim-order folds: bit-identical to
    the JVM/DuckDB form (multiplication is commutative-exact)."""
    import numpy as np
    import pandas as pd

    qids, Q = _collect_queries(q_df)
    if ndims is not None:
        Q = Q[:, :ndims]
    n2q = _np_seq_norm2(Q)
    bc = spark.sparkContext.broadcast((qids, Q, n2q))
    vec_field = f"{c_vec} array<double>, " if carry_vec else ""
    schema = f"query_id long, {c_id} long, {vec_field}{out} double"

    def score(batches):
        qids_, Q_, n2q_ = bc.value
        k = len(qids_)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf[c_vec].map(np.asarray).values)
            Mt = M[:, :ndims] if ndims is not None else M
            n2c = _np_seq_norm2(Mt)
            cos = _np_seq_dots(Mt, Q_) / np.sqrt(n2q_[None, :] * n2c[:, None])
            n = len(pdf)
            data = {
                "query_id": np.tile(qids_, n),
                c_id: np.repeat(pdf[c_id].to_numpy(dtype=np.int64), k),
            }
            if carry_vec:
                data[c_vec] = np.repeat(pdf[c_vec].values, k)
            data[out] = cos.reshape(-1)
            yield pd.DataFrame(data)

    return c_df.mapInPandas(score, schema)


def _np_int8_quant(M):
    """Per-row symmetric int8 quantization, the exact scalar sequence
    of _absmax/_int8_quantize/_in2: absmax (max is order-free-exact),
    floor(x * 127.0 / m + 0.5) per element (same three roundings),
    integer sum of squares (associative — any order is exact)."""
    import numpy as np

    m = np.maximum(np.abs(M).max(axis=1), 1e-30)
    q = np.floor(M * 127.0 / m[:, None] + 0.5).astype(np.int64)
    return q, (q * q).sum(axis=1)


def _int8_scores_numpy(
    spark: SparkSession,
    q_df,
    c_df: DataFrame,
    c_id: str = "cand_id",
    c_vec: str = "cvec",
    out: str = "q8cos",
) -> DataFrame:
    """Quantized-int8 brute scoring pass: both sides quantized inside
    the kernel (bit-exact, see _np_int8_quant); the score is
    intdot / sqrt(double(qn2a * qn2b)).  Integer dots are associative,
    so the matmul is exact — no dim-order loop needed here."""
    import numpy as np
    import pandas as pd

    qids, Q = _collect_queries(q_df)
    QQ, qqn2 = _np_int8_quant(Q)
    bc = spark.sparkContext.broadcast((qids, QQ, qqn2))
    schema = f"query_id long, {c_id} long, {out} double"

    def score(batches):
        qids_, QQ_, qqn2_ = bc.value
        k = len(qids_)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf[c_vec].map(np.asarray).values)
            CQ, cqn2 = _np_int8_quant(M)
            idot = CQ @ QQ_.T
            s = idot.astype(np.float64) / np.sqrt(
                (cqn2[:, None] * qqn2_[None, :]).astype(np.float64)
            )
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "query_id": np.tile(qids_, n),
                    c_id: np.repeat(pdf[c_id].to_numpy(dtype=np.int64), k),
                    out: s.reshape(-1),
                }
            )

    return c_df.mapInPandas(score, schema)


@register(
    "ann_cosine_topk",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERY}),
    c AS (SELECT vec_id AS cand_id, v AS cv FROM e WHERE vec_id >= {N_QUERY}),
    scored AS (
      SELECT query_id, cand_id,
             {_DOT_SQL.format(a="qv", b="cv")}
               / sqrt({_NORM2_SQL.format(a="qv")} * {_NORM2_SQL.format(a="cv")}) AS cosine_sim
      FROM q CROSS JOIN c),
    ranked AS (
      SELECT query_id, cand_id, cosine_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine_sim DESC, cand_id) AS rank
      FROM scored)
    SELECT query_id, cand_id, cosine_sim, rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
    "similarity",
    doc=(
        "Brute-force cosine top-k: the bounded query set is collected "
        "and broadcast, and scoring runs as ONE Arrow pass over the "
        "corpus scan (bit-exact dim-order numpy folds, r12 — see "
        "_cos_scores_numpy; no corpus shuffle), then per-query ranking "
        "window."
    ),
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    c = e.filter(F.col("vec_id") >= N_QUERY).select(
        F.col("vec_id").alias("cand_id"), F.col("v").alias("cv")
    )
    if _SCORE_NUMPY:
        scored = _cos_scores_numpy(spark, q, c)
    else:
        scored = F.broadcast(q).crossJoin(c).select(
            "query_id",
            "cand_id",
            (dot("qv", "cv") / F.sqrt(norm2("qv") * norm2("cv"))).alias(
                "cosine_sim"
            ),
        )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("cand_id")
    )
    return (
        scored.select(
            "query_id", "cand_id", "cosine_sim", F.row_number().over(w).alias("rank")
        )
        .filter(F.col("rank") <= TOP_K)
    )


@register(
    "dedup_embedding_cosine_baseline",
    f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label_a, b.label AS label_b,
             {_DOT_SQL.format(a="a.v", b="b.v")}
               / sqrt({_NORM2_SQL.format(a="a.v")} * {_NORM2_SQL.format(a="b.v")}) AS cosine_sim
      FROM e a JOIN e b ON a.vec_id < b.vec_id)
    SELECT vec_a, vec_b, label_a, label_b, cosine_sim
    FROM pairs WHERE cosine_sim >= 0.4
    """,
    "similarity",
    doc=(
        "All-pairs oracle BASELINE for embedding near-dup (cosine >= "
        "0.4; the synthetic corpus has no planted dups, max pairwise "
        "cosine ~0.51). O(N^2) pairs by construction — kept ONLY as the "
        "exhaustive-recall twin that validates the canonical blocked "
        "plan (dedup_embedding_cosine); never the scale path."
    ),
)
def dedup_embedding_cosine_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    # norms are factored out BEFORE the pair join (N folds, not 3*N^2;
    # sqrt(n2a * n2b) keeps the oracle's exact expression shape), and
    # the streamed side is repartitioned: the single-file parquet scan
    # would otherwise push all N^2/2 pairs through ONE task (measured
    # 67 s -> ~4 s at sf0.1 on local[32]).
    par = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    e = e.withColumn("n2", norm2("v"))
    a = e.repartition(par).select(
        F.col("vec_id").alias("vec_a"),
        F.col("label").alias("label_a"),
        F.col("v").alias("va"),
        F.col("n2").alias("n2a"),
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col("label").alias("label_b"),
        F.col("v").alias("vb"),
        F.col("n2").alias("n2b"),
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            "label_a",
            "label_b",
            (dot("va", "vb") / F.sqrt(F.col("n2a") * F.col("n2b"))).alias(
                "cosine_sim"
            ),
        )
        .filter(F.col("cosine_sim") >= 0.4)
    )


@register(
    "dedup_embedding_cosine",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (SELECT vec_id AS centroid_id, v AS centv FROM e
             WHERE vec_id % (SELECT CAST(CEIL(SQRT(COUNT(*))) AS BIGINT) FROM e) = 0),
    cscore AS (
      SELECT e.vec_id, e.v, centroid_id, {_cos_sql_fwd('e.v', 'centv')} AS cos
      FROM e CROSS JOIN cent),
    assigned AS (
      SELECT vec_id, v, centroid_id AS cell FROM (
        SELECT vec_id, v, centroid_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, centroid_id) AS rn
        FROM cscore) WHERE rn = 1),
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.cell AS cell,
             {_cos_sql_fwd('a.v', 'b.v')} AS cosine_sim
      FROM assigned a JOIN assigned b
        ON a.cell = b.cell AND a.vec_id < b.vec_id)
    SELECT vec_a, vec_b, cell, cosine_sim
    FROM pairs WHERE cosine_sim >= 0.4
    """,
    "similarity",
    doc=(
        "THE canonical embedding near-dup operator (SemDeDup-style): "
        "vectors are assigned to their max-cosine IVF cell "
        "(deterministic stride-sampled centroids, nlist~sqrt(N), same "
        "machinery as ann_ivf_search), and cosine pairs are scored "
        "ONLY within a cell — a hash join on the cell key, never the "
        "all-pairs nested loop of dedup_embedding_cosine_baseline "
        "(21x fewer pairs at 500 vectors; the gap widens as "
        "N^2/nlist). The pair count is sum(|cell|^2)/2 ~ N^1.5 for "
        "balanced cells; at 100 TB cell assignment happens at ingest "
        "and this is one co-partitioned self-join. The assignment "
        "runs as one Arrow pass (numpy folding dim-by-dim — the same "
        "IEEE operation sequence as the oracle's list_reduce, so "
        "cells match bit-for-bit; r12, see _assign_cells_numpy); the "
        "within-cell pair cosines are sequential JVM folds. All "
        "doubles match the oracle bit-for-bit."
    ),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cell_blocked_pairs(spark, sf_dir)


def _cell_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared core of dedup_embedding_cosine / semdedup_prune: the
    IVF-cell-blocked near-dup pair list (vec_a, vec_b, cell,
    cosine_sim) at threshold 0.4."""
    import math

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    n = _emb_count(spark, sf_dir)  # cached parquet-metadata count
    stride = max(1, math.ceil(math.sqrt(n)))
    if _ASSIGN_NUMPY:
        assigned = _assign_cells_numpy(
            _spread(e, spark, sf_dir),
            spark,
            e.filter(F.col("vec_id") % stride == 0),
            "vec_id long, v array<double>, n2 double, cell long",
            passthrough=("vec_id",),
            vec_col="v",
        )
    else:
        e2 = e.withColumn("n2", norm2("v"))
        cent = e2.filter(F.col("vec_id") % stride == 0).select(
            F.col("vec_id").alias("centroid_id"),
            F.col("v").alias("centv"),
            F.col("n2").alias("n2cent"),
        )
        assigned = (
            _spread(e2, spark, sf_dir)
            .join(F.broadcast(cent))
            .select(
                "vec_id",
                "v",
                "n2",
                "centroid_id",
                (
                    dot("v", "centv") / F.sqrt(F.col("n2") * F.col("n2cent"))
                ).alias("cos"),
            )
            .groupBy("vec_id")
            .agg(
                F.any_value("v").alias("v"),
                F.any_value("n2").alias("n2"),
                F.max_by(
                    "centroid_id",
                    F.struct(F.col("cos"), -F.col("centroid_id")),
                ).alias("cell"),
            )
        )
    a = assigned.select(
        F.col("vec_id").alias("vec_a"),
        F.col("v").alias("va"),
        F.col("n2").alias("n2a"),
        "cell",
    )
    b = assigned.select(
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"),
        F.col("n2").alias("n2b"),
        "cell",
    )
    return (
        # both sides are corpus-sized embedding relations: never let a
        # pruned-parquet size estimate broadcast one of them (the
        # deserialized array relation is ~15x the zstd bytes — the
        # graph_kcore 500k driver-OOM class of failure). SHUFFLE_HASH
        # pins the executor-local per-cell build at every scale.
        a.join(b.hint("shuffle_hash"), "cell")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            "cell",
            (dot("va", "vb") / F.sqrt(F.col("n2a") * F.col("n2b"))).alias(
                "cosine_sim"
            ),
        )
        .filter(F.col("cosine_sim") >= 0.4)
    )


def _plane_component(j: int, i: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-0.5, 0.5)."""
    import hashlib

    h = int(hashlib.md5(f"{j}_{i}".encode()).hexdigest()[:7], 16)
    return (h % 1000) / 1000.0 - 0.5


def lsh_bucket_col(v: Column, n_planes: int, dim: int) -> Column:
    """Sign-bit LSH bucket id: bit j = (v . r_j) >= 0, folded to an int.

    Thin wrapper over the single shared implementation (`_bucket_col`)
    so ann_lsh_buckets and ann_lsh_search can never drift apart.
    """
    return _bucket_col(v, _planes(n_planes, dim)).cast("int")


def _planes(n_planes: int = 8, dim: int = 64) -> list[list[float]]:
    return [
        [_plane_component(j, i) for i in range(dim)] for j in range(n_planes)
    ]


def _bucket_sql(v: str, planes: list[list[float]]) -> str:
    """DuckDB rendering of the sign-bit bucket (sequential fold per plane)."""
    terms = []
    for j, comps in enumerate(planes):
        arr = "[" + ",".join(repr(c) for c in comps) + "]"
        d = (
            f"list_reduce(list_transform(range(1, {len(comps)} + 1), "
            f"i -> {v}[i] * ({arr})[i]), (acc, x) -> acc + x)"
        )
        terms.append(f"(CASE WHEN {d} >= 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def _bucket_col(v: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket as ONE parsed expression.

    Building this with F.lit per plane component costs thousands of
    py4j round-trips (~1.3 s of driver latency per query build,
    measured); a single F.expr string is one call, parsed JVM-side.
    The fold is the same sequential aggregate(zip_with(...)) as the
    DuckDB oracle's list_reduce — bit-identical doubles.
    """
    terms = []
    for j, comps in enumerate(planes):
        arr = "array(" + ",".join(f"{c!r}D" for c in comps) + ")"
        d = (
            f"aggregate(zip_with({{v}}, {arr}, (x, c) -> x * c), "
            f"0.0D, (acc, x) -> acc + x)"
        )
        terms.append(f"(CASE WHEN {d} >= 0.0D THEN {1 << j} ELSE 0 END)")
    tmpl = "(" + " + ".join(terms) + ")"
    name = _column_sql_name(v)
    return F.expr(tmpl.replace("{v}", name))


@register(
    "ann_lsh_buckets",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT {_bucket_sql('v', _planes(8, 64))} AS bucket,
           COUNT(*) AS n_vectors
    FROM e GROUP BY 1
    """,
    "similarity",
    doc=(
        "Random-hyperplane LSH bucketing: 8 sign bits from pseudo-random "
        "hyperplanes (deterministic md5-derived components). At scale the "
        "corpus is written bucketed by this key; queries probe one bucket. "
        "Verified in tests/test_similarity.py against brute force recall; "
        "oracle-paired since round 6 (the per-plane dot products fold "
        "sequentially on both engines, so the sign bits are exact)."
    ),
)
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every vector an 8-bit LSH bucket; return bucket histogram."""
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    bucket = lsh_bucket_col(F.col("v"), n_planes=8, dim=64)
    return (
        e.select("vec_id", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def _column_sql_name(v: Column) -> str:
    """SQL rendering of a simple column reference, quoted."""
    s = str(v)
    # Column repr is like Column<'name'>
    inner = s[len("Column<'") : -len("'>")]
    if not inner.replace("_", "").isalnum():
        raise ValueError(f"_bucket_col needs a plain column, got {inner}")
    return f"`{inner}`"


_PLANES = _planes()


L_TABLES = 4
BITS_PER_TABLE = 4
_PLANES16 = _planes(L_TABLES * BITS_PER_TABLE, 64)


def _table_planes(tbl: int) -> list[list[float]]:
    return _PLANES16[tbl * BITS_PER_TABLE : (tbl + 1) * BITS_PER_TABLE]


def _lsh_exploded_sql() -> str:
    """DuckDB: one row per (vector, table) with that table's bucket."""
    selects = []
    for tbl in range(L_TABLES):
        b = _bucket_sql("v", _table_planes(tbl))
        selects.append(
            f"SELECT vec_id, v, {tbl} AS tbl, {b} AS bucket FROM e2"
        )
    return " UNION ALL ".join(selects)


@register(
    "ann_lsh_search",
    f"""
    WITH e2 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    exploded AS ({_lsh_exploded_sql()}),
    q AS (SELECT vec_id AS query_id, v AS qv, tbl, bucket FROM exploded WHERE vec_id < {N_QUERY}),
    c AS (SELECT vec_id AS cand_id, v AS cv, tbl, bucket FROM exploded WHERE vec_id >= {N_QUERY}),
    pairs AS (SELECT DISTINCT query_id, qv, cand_id, cv FROM q JOIN c USING (tbl, bucket)),
    scored AS (
      SELECT query_id, cand_id,
             {_DOT_SQL.format(a="qv", b="cv")}
               / sqrt({_NORM2_SQL.format(a="qv")} * {_NORM2_SQL.format(a="cv")}) AS cosine_sim
      FROM pairs),
    ranked AS (
      SELECT query_id, cand_id, cosine_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine_sim DESC, cand_id) AS rank
      FROM scored)
    SELECT query_id, cand_id, cosine_sim, rank
    FROM ranked WHERE rank <= 3
    """,
    "similarity",
    doc=(
        "Multi-table LSH ANN (the 100 TB scale path): "
        f"{L_TABLES} hash tables of {BITS_PER_TABLE} hyperplane sign "
        "bits each; a query probes the union of its buckets across "
        "tables (equi join per table, never a cross join), candidate "
        "pairs are deduped, scored, and top-3 ranked. Multiple coarse "
        "tables instead of one fine table is the standard recall fix: "
        "P(candidate found) = 1-(1-p^bits)^tables. Recall vs brute "
        "force is asserted in tests/test_similarity.py."
    ),
)
def ann_lsh_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    buckets = F.array(
        *[_bucket_col(F.col("v"), _table_planes(tbl)) for tbl in range(L_TABLES)]
    )
    exploded = e.select(
        "vec_id", "v", F.posexplode(buckets).alias("tbl", "bucket")
    )
    q = exploded.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "tbl", "bucket"
    )
    c = exploded.filter(F.col("vec_id") >= N_QUERY).select(
        F.col("vec_id").alias("cand_id"), F.col("v").alias("cv"), "tbl", "bucket"
    )
    pairs = (
        F.broadcast(q)
        .join(c, ["tbl", "bucket"])
        .select("query_id", "qv", "cand_id", "cv")
        .dropDuplicates(["query_id", "cand_id"])
    )
    scored = pairs.select(
        "query_id",
        "cand_id",
        (dot("qv", "cv") / F.sqrt(norm2("qv") * norm2("cv"))).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("cand_id")
    )
    return (
        scored.select(
            "query_id", "cand_id", "cosine_sim", F.row_number().over(w).alias("rank")
        )
        .filter(F.col("rank") <= 3)
    )


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN: the second scale path next to LSH bucketing.
# Centroids are a deterministic stride sample of the corpus (a standard
# random-init without the iterative Lloyd step, which would break
# bit-exact oracle parity through order-dependent double means); the
# corpus is assigned to its nearest centroid with one map-side-combinable
# aggregation, and each query probes only its NPROBE nearest cells. At
# 100 TB the assignment is materialized once (corpus written bucketed by
# cell, like ann_lsh_buckets) and a query reads NPROBE/nlist of the data.
NPROBE = 8  # cells probed per query; nlist = ceil(sqrt(corpus))

_IVF_DOT = _DOT_SQL
_IVF_N2 = _NORM2_SQL


def _cos_sql(a: str, b: str) -> str:
    return (
        f"{_IVF_DOT.format(a=a, b=b)}"
        f" / sqrt({_IVF_N2.format(a=a)} * {_IVF_N2.format(a=b)})"
    )


@register(
    "ann_ivf_search_exact",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERY}),
    c AS (SELECT vec_id AS cand_id, v AS cv FROM e WHERE vec_id >= {N_QUERY}),
    cent AS (SELECT vec_id AS centroid_id, v AS centv FROM e
             WHERE vec_id >= {N_QUERY}
               AND (vec_id - {N_QUERY}) % (SELECT CAST(CEIL(SQRT(COUNT(*))) AS BIGINT)
                                           FROM e WHERE vec_id >= {N_QUERY}) = 0),
    cscore AS (
      SELECT cand_id, cv, centroid_id, {_cos_sql('cv', 'centv')} AS cos
      FROM c CROSS JOIN cent),
    assigned AS (
      SELECT cand_id, cv, centroid_id AS cell FROM (
        SELECT cand_id, cv, centroid_id,
               ROW_NUMBER() OVER (PARTITION BY cand_id
                                  ORDER BY cos DESC, centroid_id) AS rn
        FROM cscore) WHERE rn = 1),
    qscore AS (
      SELECT query_id, qv, centroid_id, {_cos_sql('qv', 'centv')} AS cos
      FROM q CROSS JOIN cent),
    probes AS (
      SELECT query_id, qv, centroid_id AS cell,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, centroid_id) AS pr
      FROM qscore),
    scored AS (
      SELECT query_id, cand_id, {_cos_sql('qv', 'cv')} AS cosine_sim
      FROM probes JOIN assigned USING (cell)
      WHERE pr <= {NPROBE}),
    ranked AS (
      SELECT query_id, cand_id, cosine_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine_sim DESC, cand_id) AS rank
      FROM scored)
    SELECT query_id, cand_id, cosine_sim, rank
    FROM ranked WHERE rank <= 3
    """,
    "similarity",
    doc=(
        "Oracle-parity twin of ann_ivf_search: identical IVF structure "
        "(stride-sampled centroids, max-cosine cell assignment, "
        f"{NPROBE}-cell probes) with every double matching the DuckDB "
        "oracle bit-for-bit. The N*sqrt(N) corpus assignment runs as "
        "one Arrow pass (numpy folding dim-by-dim — the identical IEEE "
        "operation sequence to the oracle's sequential list_reduce, "
        "unlike gemm; r12, see _assign_cells_numpy); the query scoring "
        "and probe-side cosines are sequential JVM folds. "
        "ann_ivf_search (numpy matmul, not bit-exact) remains the "
        "unpaired throughput variant of the same structure."
    ),
)
def ann_ivf_search_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # each side carries its precomputed squared norm: cosine per pair is
    # then ONE dot fold + sqrt/divide instead of three folds — the same
    # double values (norm2 is deterministic), ~3x less interpreted work
    q = e.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        norm2("v").alias("n2q"),
    )
    # nlist ~ sqrt(N): stride = ceil(sqrt(corpus)) sampled centroids.
    # The count is a parquet-metadata read; the oracle computes the
    # identical integer with a scalar subquery.
    import math

    n_corpus = _emb_count(spark, sf_dir, corpus_only=True)
    stride = max(1, math.ceil(math.sqrt(n_corpus)))
    cent = e.filter(
        (F.col("vec_id") >= N_QUERY)
        & ((F.col("vec_id") - N_QUERY) % stride == 0)
    ).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("v").alias("centv"),
        norm2("v").alias("n2cent"),
    )

    def cos(a: str, b: str, n2a: str, n2b: str) -> Column:
        return dot(a, b) / F.sqrt(F.col(n2a) * F.col(n2b))

    if _ASSIGN_NUMPY:
        assigned = _assign_cells_numpy(
            _spread(
                e.filter(F.col("vec_id") >= N_QUERY).select(
                    F.col("vec_id").alias("cand_id"),
                    F.col("v").alias("cv"),
                ),
                spark,
                sf_dir,
            ),
            spark,
            cent.select("centroid_id", "centv"),
            "cand_id long, cv array<double>, n2c double, cell long",
            passthrough=("cand_id",),
            vec_col="cv",
            n2_name="n2c",
        )
    else:
        c = _spread(
            e.filter(F.col("vec_id") >= N_QUERY).select(
                F.col("vec_id").alias("cand_id"),
                F.col("v").alias("cv"),
                norm2("v").alias("n2c"),
            ),
            spark,
            sf_dir,
        )
        assigned = (
            c.join(F.broadcast(cent))
            .select(
                "cand_id",
                "cv",
                "n2c",
                "centroid_id",
                cos("cv", "centv", "n2c", "n2cent").alias("cos"),
            )
            .groupBy("cand_id")
            .agg(
                F.any_value("cv").alias("cv"),
                F.any_value("n2c").alias("n2c"),
                F.max_by(
                    "centroid_id",
                    F.struct(
                        F.col("cos"), (-F.col("centroid_id")).cast("double")
                    ),
                ).alias("cell"),
            )
        )
    qscore = (
        F.broadcast(q)
        .join(F.broadcast(cent))
        .select(
            "query_id",
            "qv",
            "n2q",
            "centroid_id",
            cos("qv", "centv", "n2q", "n2cent").alias("cos"),
        )
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("centroid_id")
    )
    probes = (
        qscore.select(
            "query_id",
            "qv",
            "n2q",
            F.col("centroid_id").alias("cell"),
            F.row_number().over(wp).alias("pr"),
        )
        .filter(F.col("pr") <= NPROBE)
        .select("query_id", "qv", "n2q", "cell")
    )
    scored = F.broadcast(probes).join(assigned, "cell").select(
        "query_id", "cand_id", cos("qv", "cv", "n2q", "n2c").alias("cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("cand_id")
    )
    return (
        scored.select(
            "query_id", "cand_id", "cosine_sim", F.row_number().over(w).alias("rank")
        )
        .filter(F.col("rank") <= 3)
    )


RECALL_K = 3  # recall@k depth (the IVF twin's result depth)


@register(
    "ann_recall_report",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERY}),
    c AS (SELECT vec_id AS cand_id, v AS cv FROM e WHERE vec_id >= {N_QUERY}),
    ex_scored AS (
      SELECT query_id, cand_id, {_cos_sql('qv', 'cv')} AS s
      FROM q CROSS JOIN c),
    exact AS (
      SELECT query_id, cand_id FROM (
        SELECT query_id, cand_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY s DESC, cand_id) AS r
        FROM ex_scored) WHERE r <= {RECALL_K}),
    cent AS (SELECT vec_id AS centroid_id, v AS centv FROM e
             WHERE vec_id >= {N_QUERY}
               AND (vec_id - {N_QUERY}) % (SELECT CAST(CEIL(SQRT(COUNT(*))) AS BIGINT)
                                           FROM e WHERE vec_id >= {N_QUERY}) = 0),
    cscore AS (
      SELECT cand_id, cv, centroid_id, {_cos_sql('cv', 'centv')} AS cos
      FROM c CROSS JOIN cent),
    assigned AS (
      SELECT cand_id, cv, centroid_id AS cell FROM (
        SELECT cand_id, cv, centroid_id,
               ROW_NUMBER() OVER (PARTITION BY cand_id
                                  ORDER BY cos DESC, centroid_id) AS rn
        FROM cscore) WHERE rn = 1),
    qscore AS (
      SELECT query_id, qv, centroid_id, {_cos_sql('qv', 'centv')} AS cos
      FROM q CROSS JOIN cent),
    probes AS (
      SELECT query_id, qv, centroid_id AS cell,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, centroid_id) AS pr
      FROM qscore),
    ivf_scored AS (
      SELECT query_id, cand_id, {_cos_sql('qv', 'cv')} AS cosine_sim
      FROM probes JOIN assigned USING (cell)
      WHERE pr <= {NPROBE}),
    ivf AS (
      SELECT query_id, cand_id FROM (
        SELECT query_id, cand_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine_sim DESC, cand_id) AS rank
        FROM ivf_scored) WHERE rank <= {RECALL_K})
    SELECT x.query_id,
           CAST(SUM(CASE WHEN i.cand_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hits,
           CAST(SUM(CASE WHEN i.cand_id IS NOT NULL THEN 1 ELSE 0 END)
                AS DOUBLE) / {RECALL_K} AS recall
    FROM exact x LEFT JOIN ivf i USING (query_id, cand_id)
    GROUP BY x.query_id ORDER BY query_id
    """,
    "similarity",
    doc=(
        f"ANN quality evaluation: recall@{RECALL_K} of the IVF probe "
        "path against the exact brute-force ranking, per query — the "
        "acceptance gate every approximate-index deployment runs "
        "before flipping traffic (FAISS-style recall sweep, one row "
        "per query vector). Composes the two proven twins: exact "
        "top-k (ann_cosine_topk's broadcast scoring) and the IVF "
        f"probe search (ann_ivf_search_exact: sqrt(N) stride "
        f"centroids, {NPROBE}-cell probes); the recall arithmetic "
        "after them is pure integer counting on the id sets, so the "
        "pairing inherits the twins' bit-exactness. At 100 TB the "
        "exact side runs over a fixed eval sample (queries are "
        "always a tiny labeled set), which is precisely this shape."
    ),
)
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = (
        ann_cosine_topk(spark, sf_dir)
        .filter(F.col("rank") <= RECALL_K)
        .select("query_id", "cand_id")
    )
    ivf = (
        ann_ivf_search_exact(spark, sf_dir)
        .filter(F.col("rank") <= RECALL_K)
        .select("query_id", "cand_id")
    )
    # _recall_report is the shared recall@K arithmetic (defined with
    # the compressed-representation gates below)
    return _recall_report(exact, ivf)


@register(
    "ann_ivf_search",
    None,  # Pairing ATTEMPTED and DECLINED with measured evidence
    # (r11, the approx_quantile_profile standard): on THIS corpus's
    # normalized vectors, numpy gemm dots differ bitwise from the
    # sequential fold a SQL oracle would compute in 1724/2475 cases
    # (69.7%; raw unnormalized doubles happened to agree 0/2475 —
    # normalization creates the non-representable operands). cosine_sim
    # is an output column, so ~70% of rows would hash-mismatch by
    # construction. Structure IS bit-exactly oracle-checked via the
    # ann_ivf_search_exact twin (identical IVF plan, sequential JVM
    # folds, DuckDB-matched); recall vs brute force is property-tested
    # in tests/test_similarity.py.
    "similarity",
    doc=(
        "IVF ANN, canonical plan: deterministic sqrt(N) stride-sampled "
        "centroids broadcast everywhere; corpus cell assignment and "
        f"query scoring are numpy matmul over Arrow batches "
        f"(mapInPandas), queries probe their {NPROBE} nearest cells "
        "only — the FAISS IVF design, ~40x faster per corpus vector "
        "than interpreted folds at 64 dims and the plan a 100 TB "
        "deployment runs. Bit-exact oracle parity of the identical IVF "
        "structure is carried by the ann_ivf_search_exact twin "
        "(sequential JVM folds, DuckDB-matched)."
    ),
)
def ann_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    import numpy as np
    import pandas as pd

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    c = e.filter(F.col("vec_id") >= N_QUERY)
    n_corpus = _emb_count(spark, sf_dir, corpus_only=True)
    stride = max(1, math.ceil(math.sqrt(n_corpus)))

    # centroid table and query set are tiny (sqrt(N) and N_QUERY rows):
    # collect once, broadcast to every task
    cent_rows = (
        e.filter(
            (F.col("vec_id") >= N_QUERY)
            & ((F.col("vec_id") - N_QUERY) % stride == 0)
        )
        .collect()
    )
    # ascending centroid ids: collect() order follows parquet file
    # listing (not guaranteed sorted across files), and np.argmax
    # breaks ties toward the FIRST index — sorting makes that the
    # lowest centroid id, matching the fold path's max_by tie-break
    cent_rows.sort(key=lambda r: r.vec_id)
    cent_ids = np.array([r.vec_id for r in cent_rows], dtype=np.int64)
    cm = np.stack([np.asarray(r.v) for r in cent_rows])
    cmn = cm / np.linalg.norm(cm, axis=1, keepdims=True)
    q_rows = e.filter(F.col("vec_id") < N_QUERY).collect()
    qm = np.stack([np.asarray(r.v) for r in q_rows])
    qmn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    q_ids = np.array([r.vec_id for r in q_rows], dtype=np.int64)
    bc = spark.sparkContext.broadcast((cent_ids, cmn))

    # each query's nprobe cells (computed on the driver: q x nlist is
    # tiny); kept as SORTED numpy arrays so the executor-side membership
    # test is vectorized np.isin, not a per-row Python lambda
    qsims = qmn @ cmn.T
    probe_cells = {
        int(q_ids[i]): np.sort(
            cent_ids[np.argsort(-qsims[i], kind="stable")[:NPROBE]]
        )
        for i in range(len(q_ids))
    }
    all_cells = sorted(
        {int(cl) for arr in probe_cells.values() for cl in arr}
    )
    bq = spark.sparkContext.broadcast((q_ids, qmn, probe_cells))

    def assign(batches):
        ids, mat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf["v"].map(np.asarray).values)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            cells = ids[np.argmax(Mn @ mat.T, axis=1)]
            yield pd.DataFrame(
                {"cand_id": pdf["vec_id"], "cell": cells, "v": pdf["v"]}
            )

    assigned = c.mapInPandas(
        assign, "cand_id long, cell long, v array<double>"
    ).filter(F.col("cell").isin(all_cells))

    def score(batches):
        q_ids_, qmn_, probes_ = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf["v"].map(np.asarray).values)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            sims = Mn @ qmn_.T  # batch x n_query
            cells_arr = pdf["cell"].to_numpy(dtype=np.int64)
            out = []
            for i, qid in enumerate(q_ids_):
                # vectorized membership over the whole Arrow batch (the
                # hot inner loop of the throughput path — a per-element
                # Python lambda here defeated the point of numpy scoring)
                mask = np.isin(cells_arr, probes_[int(qid)])
                if mask.any():
                    out.append(
                        pd.DataFrame(
                            {
                                "query_id": int(qid),
                                "cand_id": pdf["cand_id"].values[mask],
                                "cosine_sim": sims[mask, i],
                            }
                        )
                    )
            if out:
                yield pd.concat(out)

    scored = assigned.mapInPandas(
        score, "query_id long, cand_id long, cosine_sim double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("cand_id")
    )
    return (
        scored.select(
            "query_id", "cand_id", "cosine_sim", F.row_number().over(w).alias("rank")
        )
        .filter(F.col("rank") <= 3)
    )


# --------------------------------------------------------------------------
# K-means over embeddings (Lloyd's, vectorized, model-on-driver)
# --------------------------------------------------------------------------
KMEANS_K = 16
KMEANS_ITERS = 3


def kmeans_fit(df, k: int = KMEANS_K, iters: int = KMEANS_ITERS):
    """Lloyd's k-means over a (vec_id, v: array<double>) DataFrame.

    The scale shape: the model (k x dim centroid matrix) lives on the
    driver and is broadcast each round; executors compute per-partition
    partial sums (k x dim + k counts) via numpy over Arrow batches, so
    each iteration moves only n_partitions*k tiny rows to the driver —
    never the points. Deterministic: init takes the k smallest id-hash
    rows (reproducible, no rand(), no density assumption on vec_id),
    fixed iteration count, float64 partials combined in sorted order. Returns (centroids ndarray, per-iteration inertia).
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    # deterministic spread init with no assumption on vec_id density:
    # order by a hash of the id (pseudo-random but reproducible) and
    # take k — a TakeOrdered, not a full sort. Clamp k to the corpus.
    init = (
        df.orderBy(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(997)), "vec_id")
        .limit(k)
        .collect()
    )
    if not init:
        raise ValueError("kmeans_fit: empty input DataFrame")
    k = min(k, len(init))
    centroids = np.stack(
        [np.asarray(r.v, dtype=np.float64) for r in init[:k]]
    )
    history: list[float] = []

    for _ in range(iters):
        bc = spark.sparkContext.broadcast(centroids)

        def partials(batches):
            C = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                M = np.stack(pdf["v"].map(np.asarray).values).astype(np.float64)
                # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; argmin over c
                d2 = (
                    (M * M).sum(axis=1, keepdims=True)
                    - 2.0 * (M @ C.T)
                    + (C * C).sum(axis=1)
                )
                a = np.argmin(d2, axis=1)
                out = []
                for c in np.unique(a):
                    rows = M[a == c]
                    out.append(
                        {
                            "cluster": int(c),
                            "cnt": int(len(rows)),
                            "vsum": rows.sum(axis=0).tolist(),
                            "inertia": float(d2[a == c, c].sum()),
                        }
                    )
                yield pd.DataFrame(out)

        part = df.mapInPandas(
            partials, "cluster int, cnt long, vsum array<double>, inertia double"
        ).collect()
        part.sort(key=lambda r: (r.cluster, r.cnt, r.inertia))
        sums = np.zeros_like(centroids)
        cnts = np.zeros(k, dtype=np.int64)
        inertia = 0.0
        for r in part:
            sums[r.cluster] += np.asarray(r.vsum)
            cnts[r.cluster] += r.cnt
            inertia += r.inertia
        history.append(inertia)
        bc.unpersist()
        nonempty = cnts > 0
        centroids = centroids.copy()
        centroids[nonempty] = sums[nonempty] / cnts[nonempty, None]
    return centroids, history


@register(
    "kmeans_embeddings",
    None,  # Pairing DECLINED with recorded rationale (r11): the fit
    # accumulates k x dim float partial sums PER PARTITION and merges
    # them — float addition is non-associative, so the centroids (and
    # every downstream assignment/inertia value) depend on the
    # row-to-partition mapping. A fixed SQL oracle would therefore be
    # partition-layout-dependent — the exact flakiness class that got
    # approx_quantile_profile's oracle rejected in r8 (verified there:
    # distributed GK merges drift at sf0.1 even when a single-partition
    # twin matches bit-for-bit). Property gates instead: monotone
    # inertia + full coverage in tests/test_similarity.py.
    "similarity",
    doc=(
        "K-means clustering of the embedding corpus (Lloyd's, k=16, 3 "
        "rounds): the IVF coarse quantizer with refined centroids. Each "
        "round is one mapInPandas pass emitting k x dim partial sums per "
        "partition; the point set is never collected or shuffled. The "
        "final pass reports per-cluster size and inertia."
    ),
)
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    e = (
        t(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .localCheckpoint(eager=False)  # read+cast once across the fit
        # passes and the final assignment scan, not once per round
    )
    centroids, _hist = kmeans_fit(e)
    bc = spark.sparkContext.broadcast(centroids)

    def stats(batches):
        C = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf["v"].map(np.asarray).values).astype(np.float64)
            d2 = (
                (M * M).sum(axis=1, keepdims=True)
                - 2.0 * (M @ C.T)
                + (C * C).sum(axis=1)
            )
            a = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {
                    "cluster_id": a.astype("int64"),
                    "sq_dist": d2[np.arange(len(a)), a],
                }
            )

    assigned = e.mapInPandas(stats, "cluster_id long, sq_dist double")
    return (
        assigned.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(F.sum("sq_dist"), 4).alias("inertia"),
        )
        .orderBy("cluster_id")
    )


# --------------------------------------------------------------------------
# Vectorized twin of the canonical blocked embedding dedup: identical
# IVF-cell blocking, numpy throughput. The fold twin exists for
# bit-exact oracle parity; THIS is what runs at 100 TB.
# --------------------------------------------------------------------------
_VEC_DEDUP_CELL_BLOCK = 4096  # row-block size for the bounded-memory path


@register(
    "dedup_embedding_vectorized",
    None,  # ORACLE DECLINED WITH EVIDENCE (VERDICT r9 item 6): the
    # output's cosine_sim comes from BLAS gemm, whose summation order
    # is SHAPE-DEPENDENT — measured on the sf0.01 embeddings (r10):
    # unnormalized 500x64 @ 64x500 agreed with the sequential fold on
    # 239/239 sampled dots (that shape hits a sequential kernel), but
    # the normalized matrices the operator actually multiplies
    # mismatched 131/180 across (500|128|1)-row blocks, and
    # np.linalg.norm differed from sqrt-of-fold on 25/50 rows. No SQL
    # fold can reproduce values that change with the caller's block
    # size, and quantizing the output would make it a different
    # operator — the sequential-fold twin (dedup_embedding_cosine) IS
    # the oracle-paired variant; pair-set equality vs that twin is
    # asserted in tests/test_similarity.py, rows-only here.
    "similarity",
    doc=(
        "Throughput twin of dedup_embedding_cosine: the SAME SemDeDup "
        "IVF-cell blocking (stride-sampled sqrt(N) centroids, pairs "
        "scored only within a cell) with the per-vector work done as "
        "numpy matmul over Arrow batches — centroid assignment via "
        "mapInPandas argmax, within-cell pair scoring via "
        "applyInPandas (one gram matrix per cell, upper triangle "
        "thresholded). Oversized cells fall back to fixed-size row "
        "blocks so a skewed cell costs bounded memory instead of an "
        "|cell|^2 allocation — the cell-level analogue of the LSH "
        "bucket cap. Use this at scale; the fold twin when bit-exact "
        "oracle parity is required. Caveat: numpy cosine rounding can "
        "differ from the sequential fold's by ~1 ulp, so a vector "
        "whose top-two centroid cosines are closer than that may land "
        "in a different cell than the fold twin assigns (exact ties "
        "break identically — centroids are sorted ascending so argmax "
        "matches max_by's lower-id preference); pair sets are asserted "
        "equal on the test corpora, which have no sub-ulp near-ties."
    ),
)
def dedup_embedding_vectorized(
    spark: SparkSession, sf_dir: str, threshold: float = 0.4
) -> DataFrame:
    import math

    import numpy as np
    import pandas as pd

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    n = _emb_count(spark, sf_dir)
    stride = max(1, math.ceil(math.sqrt(n)))
    cent_rows = e.filter(F.col("vec_id") % stride == 0).collect()
    # ascending ids => np.argmax's first-index tie-break == the fold
    # twin's max_by((cos, -centroid_id)) for EXACT cosine ties
    cent_rows.sort(key=lambda r: r.vec_id)
    cent_ids = np.array([r.vec_id for r in cent_rows], dtype=np.int64)
    cm = np.stack([np.asarray(r.v) for r in cent_rows])
    cmn = cm / np.linalg.norm(cm, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((cent_ids, cmn))

    def assign(batches):
        ids, mat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf["v"].map(np.asarray).values)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            # ties broken toward the lower centroid id like the fold
            # twin's max_by((cos, -centroid_id)): argmax takes the
            # first maximum and ids are sorted ascending by stride
            cells = ids[np.argmax(Mn @ mat.T, axis=1)]
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cell": cells, "v": pdf["v"]}
            )

    assigned = e.mapInPandas(assign, "vec_id long, cell long, v array<double>")

    def score_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        if m < 2:
            return pd.DataFrame(
                {
                    "vec_a": pd.Series(dtype="int64"),
                    "vec_b": pd.Series(dtype="int64"),
                    "cell": pd.Series(dtype="int64"),
                    "cosine_sim": pd.Series(dtype="float64"),
                }
            )
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        cell = int(pdf["cell"].iloc[0])
        M = np.stack(pdf["v"].map(np.asarray).values)
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        out_a, out_b, out_s = [], [], []
        # fixed-size row blocks: peak extra memory is BLOCK x m doubles
        # even for a pathological mega-cell
        B = _VEC_DEDUP_CELL_BLOCK
        for lo in range(0, m, B):
            hi = min(lo + B, m)
            S = Mn[lo:hi] @ Mn.T  # (hi-lo) x m
            for i in range(lo, hi):
                row = S[i - lo]
                js = np.nonzero(row[i + 1 :] >= threshold)[0] + i + 1
                if len(js):
                    out_a.append(np.full(len(js), ids[i], dtype=np.int64))
                    out_b.append(ids[js])
                    out_s.append(row[js])
        if not out_a:
            return pd.DataFrame(
                {
                    "vec_a": pd.Series(dtype="int64"),
                    "vec_b": pd.Series(dtype="int64"),
                    "cell": pd.Series(dtype="int64"),
                    "cosine_sim": pd.Series(dtype="float64"),
                }
            )
        return pd.DataFrame(
            {
                "vec_a": np.concatenate(out_a),
                "vec_b": np.concatenate(out_b),
                "cell": cell,
                "cosine_sim": np.concatenate(out_s),
            }
        )

    return assigned.groupBy("cell").applyInPandas(
        score_cell, "vec_a long, vec_b long, cell long, cosine_sim double"
    )


@register(
    "label_centroid_cosine",
    """
    WITH q AS (
      SELECT label, t.i AS dim,
             CAST(floor(CAST(embedding[t.i] AS DOUBLE) * 1000000)
                  AS BIGINT) AS qv
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
    s AS (
      SELECT label, dim, CAST(SUM(qv) AS BIGINT) AS sq, COUNT(*) AS n
      FROM q GROUP BY label, dim),
    c AS (
      SELECT label, dim,
             CAST(floor(CAST(sq AS DOUBLE) / n) AS BIGINT) AS cq, n
      FROM s),
    pair AS (
      SELECT a.label AS label_a, b.label AS label_b,
             CAST(MAX(a.n) AS BIGINT) AS n_a,
             CAST(MAX(b.n) AS BIGINT) AS n_b,
             CAST(SUM(a.cq * b.cq) AS BIGINT) AS dot,
             CAST(SUM(a.cq * a.cq) AS BIGINT) AS na,
             CAST(SUM(b.cq * b.cq) AS BIGINT) AS nb
      FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
      GROUP BY a.label, b.label)
    SELECT label_a, label_b, n_a, n_b,
           CAST(dot AS DOUBLE)
             / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)))
             AS centroid_cosine
    FROM pair ORDER BY label_a, label_b
    """,
    "similarity",
    doc=(
        "Embedding drift / class-separation report: pairwise cosine "
        "between per-label CENTROIDS — the cheap detector for "
        "label-space collapse or domain shift between data slices. "
        "Cross-row float sums are order-dependent, so exactness comes "
        "from double-quantization: components are floor-quantized to "
        "1e-6 integers per row (float->double cast is exact), summed as "
        "integers (exact in any order), the centroid re-quantized after "
        "ONE exact integer/count division, and the pairwise dot then "
        "runs entirely in bigint arithmetic — both engines agree "
        "bit-for-bit including the final sqrt-normalized division. "
        "Plan: per-(label,dim) partial sums map-side combine (explode "
        "fans out x64 but collapses immediately); the pair join runs on "
        "a |labels| x dims table — at 100 TB the corpus is touched "
        "exactly once, everything after is constant-size."
    ),
)
def label_centroid_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    q = emb.select(
        "label", F.posexplode("embedding").alias("dim0", "v")
    ).select(
        "label",
        (F.col("dim0") + 1).alias("dim"),
        F.floor(F.col("v").cast("double") * 1000000).cast("bigint").alias("qv"),
    )
    s = q.groupBy("label", "dim").agg(
        F.sum("qv").cast("bigint").alias("sq"),
        F.count(F.lit(1)).alias("n"),
    )
    c = s.select(
        "label",
        "dim",
        F.floor(F.col("sq").cast("double") / F.col("n"))
        .cast("bigint")
        .alias("cq"),
        "n",
    )
    a, b = c.alias("a"), c.alias("b")
    pair = (
        a.join(
            F.broadcast(b),
            (F.col("a.dim") == F.col("b.dim"))
            & (F.col("a.label") < F.col("b.label")),
        )
        .groupBy(
            F.col("a.label").alias("label_a"),
            F.col("b.label").alias("label_b"),
        )
        .agg(
            F.max("a.n").cast("bigint").alias("n_a"),
            F.max("b.n").cast("bigint").alias("n_b"),
            F.sum(F.col("a.cq") * F.col("b.cq")).cast("bigint").alias("dot"),
            F.sum(F.col("a.cq") * F.col("a.cq")).cast("bigint").alias("na"),
            F.sum(F.col("b.cq") * F.col("b.cq")).cast("bigint").alias("nb"),
        )
    )
    return pair.select(
        "label_a",
        "label_b",
        "n_a",
        "n_b",
        (
            F.col("dot").cast("double")
            / (
                F.sqrt(F.col("na").cast("double"))
                * F.sqrt(F.col("nb").cast("double"))
            )
        ).alias("centroid_cosine"),
    ).orderBy("label_a", "label_b")


HARD_NEG_J = 3  # hard negatives mined per anchor


@register(
    "hard_negative_mining",
    f"""
    WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                      CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (SELECT vec_id AS centroid_id, v AS centv FROM e
             WHERE vec_id % (SELECT CAST(CEIL(SQRT(COUNT(*))) AS BIGINT) FROM e) = 0),
    cscore AS (
      SELECT e.vec_id, e.label, e.v, centroid_id,
             {_cos_sql_fwd('e.v', 'centv')} AS cos
      FROM e CROSS JOIN cent),
    assigned AS (
      SELECT vec_id, label, v, centroid_id AS cell FROM (
        SELECT vec_id, label, v, centroid_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, centroid_id) AS rn
        FROM cscore) WHERE rn = 1),
    scored AS (
      SELECT a.vec_id AS anchor_id, b.vec_id AS negative_id,
             a.label AS anchor_label, b.label AS negative_label,
             {_cos_sql_fwd('a.v', 'b.v')} AS cosine_sim
      FROM assigned a JOIN assigned b
        ON a.cell = b.cell AND a.vec_id <> b.vec_id
       AND a.label <> b.label),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                   ORDER BY cosine_sim DESC, negative_id)
                  AS rank
      FROM scored)
    SELECT anchor_id, negative_id, anchor_label, negative_label,
           cosine_sim, rank
    FROM ranked WHERE rank <= {HARD_NEG_J}
    """,
    "similarity",
    doc=(
        "Hard-negative mining for contrastive training: per anchor, "
        f"the top-{HARD_NEG_J} most-similar vectors with a DIFFERENT "
        "label — the pairs a contrastive or reranker objective learns "
        "most from (in-batch random negatives are mostly easy). "
        "Candidates come from the anchor's IVF cell (the SemDeDup "
        "blocking: deterministic stride-sampled sqrt(N) centroids, "
        "max-cosine assignment), so the pair stage is one "
        "co-partitioned self-join on the cell key — never all-pairs — "
        "and the per-anchor ranking window runs on cell-bounded "
        "candidate lists. Same sequential-fold cosine arithmetic as "
        "dedup_embedding_cosine, so scores match the oracle "
        "bit-for-bit; ties break on candidate id in both engines. At "
        "100 TB cell assignment happens at ingest and this is a "
        "co-partitioned join + window, the exact shape shipped here. "
        "The cell assignment is the shared bit-exact Arrow pass "
        "(_assign_cells_numpy, r12); the pair cosines stay sequential "
        "JVM folds."
    ),
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("label").cast("bigint").alias("label"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    n = _emb_count(spark, sf_dir)  # cached parquet-metadata count
    stride = max(1, math.ceil(math.sqrt(n)))
    if _ASSIGN_NUMPY:
        assigned = _assign_cells_numpy(
            _spread(e, spark, sf_dir),
            spark,
            e.filter(F.col("vec_id") % stride == 0).select("vec_id", "v"),
            "vec_id long, label long, v array<double>, n2 double, cell long",
            passthrough=("vec_id", "label"),
            vec_col="v",
        )
    else:
        e2 = e.withColumn("n2", norm2("v"))
        cent = e2.filter(F.col("vec_id") % stride == 0).select(
            F.col("vec_id").alias("centroid_id"),
            F.col("v").alias("centv"),
            F.col("n2").alias("n2cent"),
        )
        assigned = (
            _spread(e2, spark, sf_dir)
            .join(F.broadcast(cent))
            .select(
                "vec_id",
                "label",
                "v",
                "n2",
                "centroid_id",
                (
                    dot("v", "centv") / F.sqrt(F.col("n2") * F.col("n2cent"))
                ).alias("cos"),
            )
            .groupBy("vec_id")
            .agg(
                F.any_value("label").alias("label"),
                F.any_value("v").alias("v"),
                F.any_value("n2").alias("n2"),
                F.max_by(
                    "centroid_id",
                    F.struct(F.col("cos"), -F.col("centroid_id")),
                ).alias("cell"),
            )
        )
    a = assigned.select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("v").alias("va"),
        F.col("n2").alias("n2a"),
        "cell",
    )
    b = assigned.select(
        F.col("vec_id").alias("negative_id"),
        F.col("label").alias("negative_label"),
        F.col("v").alias("vb"),
        F.col("n2").alias("n2b"),
        "cell",
    )
    scored = (
        # corpus-sized embedding relations: SHUFFLE_HASH, never a
        # size-estimate broadcast (see _cell_blocked_pairs)
        a.join(b.hint("shuffle_hash"), "cell")
        .filter(
            (F.col("anchor_id") != F.col("negative_id"))
            & (F.col("anchor_label") != F.col("negative_label"))
        )
        .select(
            "anchor_id",
            "negative_id",
            "anchor_label",
            "negative_label",
            (dot("va", "vb") / F.sqrt(F.col("n2a") * F.col("n2b"))).alias(
                "cosine_sim"
            ),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine_sim").desc(), "negative_id"
    )
    return scored.select(
        "*", F.row_number().over(w).alias("rank")
    ).filter(F.col("rank") <= HARD_NEG_J)


@register(
    "embedding_outlier_report",
    """
    WITH q AS (
      SELECT vec_id, label, t.i AS dim,
             CAST(floor(CAST(embedding[t.i] AS DOUBLE) * 1000000)
                  AS BIGINT) AS qv
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
    s AS (
      SELECT label, dim, CAST(SUM(qv) AS BIGINT) AS sq, COUNT(*) AS n
      FROM q GROUP BY label, dim),
    c AS (
      SELECT label, dim,
             CAST(floor(CAST(sq AS DOUBLE) / n) AS BIGINT) AS cq
      FROM s),
    d AS (
      SELECT q.vec_id, q.label,
             CAST(SUM((q.qv - c.cq) * (q.qv - c.cq)) AS BIGINT) AS dist2
      FROM q JOIN c ON q.label = c.label AND q.dim = c.dim
      GROUP BY q.vec_id, q.label),
    r AS (
      SELECT label, vec_id, dist2,
             ROW_NUMBER() OVER (PARTITION BY label
                                ORDER BY dist2 DESC, vec_id) AS rk
      FROM d)
    SELECT label, vec_id, dist2, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= 3 ORDER BY label, rk
    """,
    "similarity",
    doc=(
        "Per-label outlier detection: top-3 vectors FARTHEST from their "
        "label centroid — the mislabeled-point / junk-embedding "
        "detector run before using labels for stratified sampling or "
        "eval splits. Same double-quantization discipline as "
        "label_centroid_cosine (1e-6 integer components, integer "
        "centroid after one exact division), so the squared distance "
        "is pure bigint arithmetic and the ranking is bit-exact "
        "cross-engine. Plan: per-(label,dim) sums map-side combine, "
        "centroids broadcast back over the exploded stream, one "
        "(vec,label) rollup, one tiny per-label ranking window — the "
        "corpus is scanned twice and shuffled only as (label,dim) and "
        "(vec,label) counter rows."
    ),
)
def embedding_outlier_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim0", "v")
    ).select(
        "vec_id",
        "label",
        (F.col("dim0") + 1).alias("dim"),
        F.floor(F.col("v").cast("double") * 1000000).cast("bigint").alias("qv"),
    )
    s = q.groupBy("label", "dim").agg(
        F.sum("qv").cast("bigint").alias("sq"),
        F.count(F.lit(1)).alias("n"),
    )
    c = s.select(
        "label",
        "dim",
        F.floor(F.col("sq").cast("double") / F.col("n"))
        .cast("bigint")
        .alias("cq"),
    )
    d = (
        q.join(F.broadcast(c), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum((F.col("qv") - F.col("cq")) * (F.col("qv") - F.col("cq")))
            .cast("bigint")
            .alias("dist2")
        )
    )
    w = Window.partitionBy("label").orderBy(F.col("dist2").desc(), "vec_id")
    return (
        d.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("label", "vec_id", "dist2", F.col("rk").cast("bigint").alias("rk"))
        .orderBy("label", "rk")
    )


@register(
    "semdedup_prune",
    f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    cent AS (SELECT vec_id AS centroid_id, v AS centv FROM e
             WHERE vec_id % (SELECT CAST(CEIL(SQRT(COUNT(*))) AS BIGINT)
                             FROM e) = 0),
    cscore AS (
      SELECT e.vec_id, e.v, centroid_id, {_cos_sql_fwd('e.v', 'centv')} AS cos
      FROM e CROSS JOIN cent),
    assigned AS (
      SELECT vec_id, v, centroid_id AS cell FROM (
        SELECT vec_id, v, centroid_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, centroid_id) AS rn
        FROM cscore) WHERE rn = 1),
    drops AS (
      SELECT DISTINCT b.vec_id AS vec_id
      FROM assigned a JOIN assigned b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE {_cos_sql_fwd('a.v', 'b.v')} >= 0.4),
    flagged AS (
      SELECT e.label,
             CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS kept
      FROM e LEFT JOIN drops d USING (vec_id))
    SELECT label,
           COUNT(*) AS n_vectors,
           CAST(SUM(kept) AS BIGINT) AS n_kept,
           CAST(COUNT(*) - SUM(kept) AS BIGINT) AS n_dropped,
           CAST(SUM(kept) AS BIGINT) / CAST(COUNT(*) AS BIGINT) AS retention
    FROM flagged GROUP BY label ORDER BY label
    """,
    "similarity",
    doc=(
        "SemDeDup (Abbas et al. 2023) pruning decision + retention "
        "report: within each IVF cell (the same stride-sampled "
        "max-cosine assignment as dedup_embedding_cosine), every "
        "vector with an above-threshold lower-id neighbor is dropped "
        "— the keep-lowest-id rule makes the survivor set "
        "deterministic and order-free (a vec is dropped iff ANY "
        "qualifying lower-id neighbor shares its cell, so no "
        "sequential scan order exists to disagree about). Emits "
        "per-label corpus size / kept / dropped / retention, the "
        "dataset-shrink readout a curation run reports. Plan: the "
        "pair join is the canonical cell-blocked shape (never "
        "all-pairs), drops is a distinct projection of the pair "
        "list's right column, and the final pass is one left join + "
        "label rollup with NO broadcast hint — the drop-set is "
        "O(N_dropped), unbounded on dup-heavy corpora, so AQE picks "
        "the strategy and the vec_id join may legitimately shuffle."
    ),
)
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _cell_blocked_pairs(spark, sf_dir)
    drops = pairs.select(F.col("vec_b").alias("vec_id")).distinct()
    e = t(spark, sf_dir, "embeddings").select("vec_id", "label")
    # No broadcast hint on the drop-set: SemDeDup prunes a large
    # fraction of dup-heavy corpora by design, so drops is O(N_dropped)
    # — unbounded at 100 TB.  AQE sizes the join at runtime (broadcast
    # when small, shuffled hash otherwise); the vec_id join MAY shuffle
    # and that is the correct scale posture.
    flagged = e.join(drops.withColumn("dropped", F.lit(1)), "vec_id", "left")
    kept = F.when(F.col("dropped").isNull(), F.lit(1)).otherwise(F.lit(0))
    return (
        flagged.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum(kept).cast("bigint").alias("n_kept"),
            (F.count(F.lit(1)) - F.sum(kept)).cast("bigint").alias("n_dropped"),
        )
        .select(
            "label",
            "n_vectors",
            "n_kept",
            "n_dropped",
            (
                F.col("n_kept").cast("double") / F.col("n_vectors")
            ).alias("retention"),
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# int8 symmetric quantization + recall readout
# --------------------------------------------------------------------------
# DuckDB renderings of the quantization pipeline. Folds mirror the
# Spark-side F.aggregate/F.transform expressions op-for-op so every
# intermediate is IEEE-identical; the quantized values themselves are
# integers (exact in any engine).
_ABSMAX_SQL = (
    "greatest(list_reduce(list_transform({v}, x -> abs(x)), "
    "(acc, x) -> greatest(acc, x)), 1e-30)"
)
_QUANT_SQL = "list_transform({v}, x -> CAST(floor(x * 127.0 / {m} + 0.5) AS BIGINT))"
_IDOT_SQL = (
    "list_reduce(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i]), "
    "(acc, x) -> acc + x)"
)
_IN2_SQL = "list_reduce(list_transform({q}, x -> x * x), (acc, x) -> acc + x)"


def _absmax(v: str | Column) -> Column:
    v = F.col(v) if isinstance(v, str) else v
    return F.greatest(
        F.aggregate(
            F.transform(v, F.abs), F.lit(0.0), lambda acc, x: F.greatest(acc, x)
        ),
        F.lit(1e-30),
    )


def _int8_quantize(v: str | Column, m: str | Column) -> Column:
    v = F.col(v) if isinstance(v, str) else v
    m = F.col(m) if isinstance(m, str) else m
    return F.transform(
        v, lambda x: F.floor(x * F.lit(127.0) / m + F.lit(0.5)).cast("bigint")
    )


def _idot(a: str | Column, b: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def _in2(q: str | Column) -> Column:
    q = F.col(q) if isinstance(q, str) else q
    return F.aggregate(
        F.transform(q, lambda x: x * x),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def _recall_oracle_sql(prep_ctes: str, approx_score: str) -> str:
    """Shared recall@k oracle scaffold for the compressed-representation
    gates (int8, matryoshka): `prep_ctes` must define CTEs q(query_id,
    qvec, ...) and c(cand_id, cvec, ...); `approx_score` scores a
    (q, c) row under the compressed representation. Exact side is the
    proven sequential-fold cosine; the report is integer counting."""
    return f"""
    WITH {prep_ctes},
    ex_scored AS (
      SELECT query_id, cand_id, {_cos_sql_fwd('qvec', 'cvec')} AS s
      FROM q CROSS JOIN c),
    exact AS (
      SELECT query_id, cand_id FROM (
        SELECT query_id, cand_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY s DESC, cand_id) AS r
        FROM ex_scored) WHERE r <= {RECALL_K}),
    ap_scored AS (
      SELECT query_id, cand_id, {approx_score} AS apx
      FROM q CROSS JOIN c),
    approx AS (
      SELECT query_id, cand_id FROM (
        SELECT query_id, cand_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY apx DESC, cand_id) AS r
        FROM ap_scored) WHERE r <= {RECALL_K})
    SELECT x.query_id,
           CAST(SUM(CASE WHEN i.cand_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hits,
           CAST(SUM(CASE WHEN i.cand_id IS NOT NULL THEN 1 ELSE 0 END)
                AS DOUBLE) / {RECALL_K} AS recall
    FROM exact x LEFT JOIN approx i USING (query_id, cand_id)
    GROUP BY x.query_id ORDER BY query_id
    """


def _topk_ids(scored: DataFrame, score: str) -> DataFrame:
    """Per-query top-RECALL_K (query_id, cand_id) under `score`,
    ties broken on cand_id — the Spark twin of the oracle scaffold's
    ranking subqueries."""
    w = Window.partitionBy("query_id").orderBy(
        F.col(score).desc(), F.col("cand_id")
    )
    return (
        scored.select(
            "query_id", "cand_id", F.row_number().over(w).alias("r")
        )
        .filter(F.col("r") <= RECALL_K)
        .select("query_id", "cand_id")
    )


def _recall_report(exact_ids: DataFrame, approx_ids: DataFrame) -> DataFrame:
    """recall@RECALL_K of `approx_ids` against `exact_ids` (both
    per-query id sets), one row per query."""
    hit = approx_ids.select("query_id", "cand_id", F.lit(1).alias("_hit"))
    return (
        exact_ids.join(F.broadcast(hit), ["query_id", "cand_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_hits"),
            (
                F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("double")
                / F.lit(RECALL_K)
            ).alias("recall"),
        )
        .orderBy("query_id")
    )


@register(
    "ann_int8_recall",
    _recall_oracle_sql(
        f"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    z AS (SELECT vec_id, v, {_ABSMAX_SQL.format(v='v')} AS m FROM e),
    qz AS (SELECT vec_id, v, {_QUANT_SQL.format(v='v', m='m')} AS qv FROM z),
    qn AS (SELECT vec_id, v, qv, {_IN2_SQL.format(q='qv')} AS qn2 FROM qz),
    q AS (SELECT vec_id AS query_id, v AS qvec, qv AS qq, qn2 AS qqn2
          FROM qn WHERE vec_id < {N_QUERY}),
    c AS (SELECT vec_id AS cand_id, v AS cvec, qv AS cq, qn2 AS cqn2
          FROM qn WHERE vec_id >= {N_QUERY})""",
        f"""CAST({_IDOT_SQL.format(a='qq', b='cq')} AS DOUBLE)
               / sqrt(CAST(qqn2 * cqn2 AS DOUBLE))""",
    ),
    "similarity",
    doc=(
        "int8 quantization acceptance gate: per-vector symmetric "
        "quantization (scale = 127/absmax, round-half-up — the "
        "standard embedding-compression scheme: 4x less memory "
        "bandwidth, integer SIMD dot products), ranked by the "
        "QUANTIZED integer cosine (scales cancel in cosine, so the "
        f"score is intdot/sqrt(n2a*n2b) — exact integer folds), and "
        f"recall@{RECALL_K} measured against the exact double-fold "
        "ranking. Every arithmetic step is either integer-exact or a "
        "single IEEE op mirrored in the oracle, so the pairing is "
        "bit-for-bit. At 100 TB the corpus is quantized once at "
        "ingest (a vectorized map over the scan, no shuffle) and this "
        "report runs over the fixed eval query set — the exact shape "
        "here: broadcast queries against one corpus pass each for the "
        "exact and quantized rankings, both scored inside bit-exact "
        "Arrow kernels (r12, _cos_scores_numpy/_int8_scores_numpy)."
    ),
)
def ann_int8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    if _SCORE_NUMPY:
        e0 = t(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        q_rows = (
            e0.filter(F.col("vec_id") < N_QUERY)
            .select(F.col("vec_id").alias("query_id"), "v")
            .collect()
        )
        c = e0.filter(F.col("vec_id") >= N_QUERY).select(
            F.col("vec_id").alias("cand_id"), F.col("v").alias("cvec")
        )
        # both rankings quantize/score inside their Arrow kernel from
        # the raw scan — no quantize columns, no persist needed
        exact = _topk_ids(
            _cos_scores_numpy(spark, q_rows, c, c_vec="cvec", out="s"), "s"
        )
        q8 = _topk_ids(_int8_scores_numpy(spark, q_rows, c), "q8cos")
        return _recall_report(exact, q8)
    e = (
        t(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .withColumn("m", _absmax("v"))
        .withColumn("qv", _int8_quantize("v", "m"))
        .withColumn("qn2", _in2("qv"))
    )
    q = e.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qvec"),
        F.col("qv").alias("qq"),
        F.col("qn2").alias("qqn2"),
    )
    from barco_spark.session import eager_persist

    # materialize once: BOTH rankings (exact + quantized) reference
    # this frame — without the cache the interpreted quantize fold
    # runs twice (eager_persist).  A repartition before the quantize
    # was A/B-measured NEGATIVE here (1.95 s plain vs 2.28 s spread:
    # one thin pass over 2k rows does not amortize the exchange).
    c = eager_persist(
        e.filter(F.col("vec_id") >= N_QUERY).select(
            F.col("vec_id").alias("cand_id"),
            F.col("v").alias("cvec"),
            F.col("qv").alias("cq"),
            F.col("qn2").alias("cqn2"),
        )
    )
    exact = _topk_ids(
        F.broadcast(q)
        .crossJoin(c)
        .select(
            "query_id",
            "cand_id",
            (dot("qvec", "cvec") / F.sqrt(norm2("qvec") * norm2("cvec"))).alias(
                "s"
            ),
        ),
        "s",
    )
    q8 = _topk_ids(
        F.broadcast(q)
        .crossJoin(c)
        .select(
            "query_id",
            "cand_id",
            (
                _idot("qq", "cq").cast("double")
                / F.sqrt((F.col("qqn2") * F.col("cqn2")).cast("double"))
            ).alias("q8cos"),
        ),
        "q8cos",
    )
    return _recall_report(exact, q8)


MRL_DIMS = 16  # truncated prefix width (of 64) the matryoshka gate tests


@register(
    "ann_matryoshka_recall",
    _recall_oracle_sql(
        f"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qvec, v[1:{MRL_DIMS}] AS qt
          FROM e WHERE vec_id < {N_QUERY}),
    c AS (SELECT vec_id AS cand_id, v AS cvec, v[1:{MRL_DIMS}] AS ct
          FROM e WHERE vec_id >= {N_QUERY})""",
        _cos_sql_fwd("qt", "ct"),
    ),
    "similarity",
    doc=(
        f"Matryoshka / embedding-shortening acceptance gate: rank by "
        f"cosine over the first {MRL_DIMS} of 64 dimensions only (the "
        "MRL deployment trick — prefix-truncated vectors cost 4x less "
        "memory and bandwidth, and MRL-trained models order "
        f"information by prefix), report recall@{RECALL_K} against "
        "the full-dimension exact ranking per query. The truncated "
        "cosine is the same sequential fold over a sliced array, so "
        "the pairing is bit-for-bit. Same 100 TB shape as "
        "ann_int8_recall: truncation happens at the scan (a prefix "
        "slice inside the scoring kernel), the report runs over the "
        "fixed eval query set, two broadcast-query corpus passes "
        "total (bit-exact Arrow scoring kernels, r12)."
    ),
)
def ann_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
    )
    if _SCORE_NUMPY:
        q_rows = (
            e.filter(F.col("vec_id") < N_QUERY)
            .select(F.col("vec_id").alias("query_id"), "v")
            .collect()
        )
        c0 = e.filter(F.col("vec_id") >= N_QUERY).select(
            F.col("vec_id").alias("cand_id"), F.col("v").alias("cvec")
        )
        # the truncated cosine folds the same dims the sliced-array
        # fold would — a numpy prefix slice of the identical doubles
        exact = _topk_ids(
            _cos_scores_numpy(spark, q_rows, c0, c_vec="cvec", out="s"), "s"
        )
        trunc = _topk_ids(
            _cos_scores_numpy(
                spark, q_rows, c0, c_vec="cvec", out="ts", ndims=MRL_DIMS
            ),
            "ts",
        )
        return _recall_report(exact, trunc)
    q = e.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qvec"),
        F.slice("v", 1, MRL_DIMS).alias("qt"),
    )
    c = e.filter(F.col("vec_id") >= N_QUERY).select(
        F.col("vec_id").alias("cand_id"),
        F.col("v").alias("cvec"),
        F.slice("v", 1, MRL_DIMS).alias("ct"),
    )
    exact = _topk_ids(
        F.broadcast(q)
        .crossJoin(c)
        .select(
            "query_id",
            "cand_id",
            (dot("qvec", "cvec") / F.sqrt(norm2("qvec") * norm2("cvec"))).alias(
                "s"
            ),
        ),
        "s",
    )
    trunc = _topk_ids(
        F.broadcast(q)
        .crossJoin(c)
        .select(
            "query_id",
            "cand_id",
            (dot("qt", "ct") / F.sqrt(norm2("qt") * norm2("ct"))).alias("ts"),
        ),
        "ts",
    )
    return _recall_report(exact, trunc)


# --------------------------------------------------------------------------
# MMR diverse rerank (retrieval-side diversity for RAG)
# --------------------------------------------------------------------------
MMR_POOL = 8  # relevance pool per query the greedy selects from
# lambda = 0.7 relevance / 0.3 diversity; both factors written as
# literals on BOTH sides (never 1-lambda in Python, which is not 0.3
# in binary) so the IEEE arithmetic is op-identical.

# r12: the unrolled greedy runs on the DRIVER over the collected pool
# (N_QUERY x MMR_POOL rows — bounded at ANY scale by construction, the
# session-4 pagerank fixed-point pattern). The DataFrame greedy is
# kept below as the A/B + parity arm.
_MMR_LOCAL = True


def _mmr_greedy_local(spark: SparkSession, pool_df: DataFrame) -> DataFrame:
    """Driver-side unrolled MMR greedy over the collected pool.

    Score arithmetic mirrors the Column ops EXACTLY: cosines fold
    left-to-right (Python floats are IEEE doubles — the same op
    sequence as aggregate(zip_with)), mmr = 0.7*rel - 0.3*max(cos...)
    with the same two mults + subtract, argmax ties break on lowest
    cand_id like the rn==1 windows. Result built through the Arrow
    local-rows path (no Python-worker fan-out)."""
    import math

    from barco_spark.session import local_rows_df

    def _seq_cos(a, b) -> float:
        d = 0.0
        for x, y in zip(a, b):
            d = d + x * y
        n2a = 0.0
        for x in a:
            n2a = n2a + x * x
        n2b = 0.0
        for y in b:
            n2b = n2b + y * y
        # math.sqrt is the correctly-rounded IEEE sqrt (matching the
        # JVM's); x ** 0.5 routes through libm pow and is not
        return d / math.sqrt(n2a * n2b)

    by_query: dict[int, list] = {}
    for r in pool_df.collect():
        by_query.setdefault(r.query_id, []).append(r)
    out = []
    for qid in by_query:
        rows = sorted(by_query[qid], key=lambda r: r.rnk)
        s1 = rows[0]
        out.append((qid, s1.cand_id, s1.rel, 0.7 * s1.rel, 1))
        rest = rows[1:]
        if not rest:
            continue
        # NaN-greatest key (zero-norm vector -> NaN cosine): the
        # DataFrame arm's ORDER BY mmr DESC and the DuckDB oracle both
        # order NaN as the greatest double, while bare Python NaN
        # comparisons are order-dependent — mirror it explicitly.
        def _desc_key(m: float, cid):
            # NaN sorts as one greatest-value class, ties on cand_id;
            # the score slot must be a CONSTANT for NaNs (a bare -nan
            # is unorderable and would poison the tuple comparison).
            return (0, 0.0, cid) if math.isnan(m) else (1, -m, cid)

        mmr2 = {
            r.cand_id: 0.7 * r.rel - 0.3 * _seq_cos(r.cv, s1.cv)
            for r in rest
        }
        s2 = min(rest, key=lambda r: _desc_key(mmr2[r.cand_id], r.cand_id))
        out.append((qid, s2.cand_id, s2.rel, mmr2[s2.cand_id], 2))
        rest3 = [r for r in rest if r.cand_id != s2.cand_id]
        if not rest3:
            continue
        mmr3 = {
            r.cand_id: 0.7 * r.rel
            - 0.3 * max(_seq_cos(r.cv, s1.cv), _seq_cos(r.cv, s2.cv))
            for r in rest3
        }
        s3 = min(rest3, key=lambda r: _desc_key(mmr3[r.cand_id], r.cand_id))
        out.append((qid, s3.cand_id, s3.rel, mmr3[s3.cand_id], 3))
    out.sort(key=lambda t: (t[0], t[4]))
    df = local_rows_df(
        spark,
        out,
        "query_id long, cand_id long, relevance double, "
        "mmr_score double, mmr_rank int",
    )
    return df.select(
        "query_id",
        "cand_id",
        "relevance",
        "mmr_score",
        # coalesce restores the non-nullable int the F.lit(rank)
        # columns of the DataFrame arm carry (values are never null)
        F.coalesce(F.col("mmr_rank"), F.lit(0)).alias("mmr_rank"),
    ).orderBy("query_id", "mmr_rank")


@register(
    "mmr_diverse_rerank",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERY}),
    c AS (SELECT vec_id AS cand_id, v AS cv FROM e WHERE vec_id >= {N_QUERY}),
    scored AS (
      SELECT query_id, cand_id, cv, {_cos_sql_fwd('qv', 'cv')} AS rel
      FROM q CROSS JOIN c),
    pool AS (
      SELECT * FROM (
        SELECT query_id, cand_id, cv, rel,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY rel DESC, cand_id) AS rnk
        FROM scored) WHERE rnk <= {MMR_POOL}),
    s1 AS (SELECT query_id, cand_id AS s1_id, cv AS s1v, rel AS s1_rel
           FROM pool WHERE rnk = 1),
    rest AS (SELECT * FROM pool WHERE rnk >= 2),
    st2 AS (
      SELECT r.query_id, r.cand_id, r.cv, r.rel,
             0.7::DOUBLE * r.rel
               - 0.3::DOUBLE * ({_cos_sql_fwd('r.cv', 's.s1v')}) AS mmr2
      FROM rest r JOIN s1 s ON r.query_id = s.query_id),
    s2 AS (
      SELECT query_id, cand_id AS s2_id, cv AS s2v, rel AS s2_rel,
             mmr2 AS s2_score
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY mmr2 DESC, cand_id) AS rn
        FROM st2) WHERE rn = 1),
    st3 AS (
      SELECT r.query_id, r.cand_id, r.rel,
             0.7::DOUBLE * r.rel
               - 0.3::DOUBLE * greatest(
                   {_cos_sql_fwd('r.cv', 's.s1v')},
                   {_cos_sql_fwd('r.cv', 'u.s2v')}) AS mmr3
      FROM rest r
      JOIN s1 s ON r.query_id = s.query_id
      JOIN s2 u ON r.query_id = u.query_id
      WHERE r.cand_id <> u.s2_id),
    s3 AS (
      SELECT query_id, cand_id, rel, mmr3
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY mmr3 DESC, cand_id) AS rn
        FROM st3) WHERE rn = 1)
    SELECT query_id, s1_id AS cand_id, s1_rel AS relevance,
           0.7::DOUBLE * s1_rel AS mmr_score, 1 AS mmr_rank
    FROM s1
    UNION ALL
    SELECT query_id, s2_id, s2_rel, s2_score, 2 FROM s2
    UNION ALL
    SELECT query_id, cand_id, rel, mmr3, 3 FROM s3
    ORDER BY query_id, mmr_rank
    """,
    "similarity",
    doc=(
        "Maximal Marginal Relevance rerank (Carbonell & Goldstein "
        "1998), the standard RAG retrieval diversifier: per query, "
        f"greedily pick 3 of the top-{MMR_POOL} relevance candidates, "
        "each step maximizing 0.7*relevance - 0.3*max-similarity-to-"
        "already-picked. The greedy is unrolled into pure DataFrame "
        "steps (argmax = ranking window, fixed k), so it is exactly "
        "expressible in SQL and oracle-paired: every score is the "
        "proven sequential-fold cosine plus two IEEE mults and a "
        "subtract, ties break on candidate id. Plan shape at 100 TB: "
        "the pool stage is the proven broadcast-query scoring pass "
        "(one corpus scan, top-k window); the pool itself is "
        "N_QUERY x pool rows — bounded by construction at ANY scale — "
        "so since r12 the unrolled greedy runs on the DRIVER over the "
        "collected pool (the bounded fixed-point pattern), mirroring "
        "the Column arithmetic op-for-op; the DataFrame greedy is "
        "kept as the verification arm."
    ),
)
def mmr_diverse_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    c = e.filter(F.col("vec_id") >= N_QUERY).select(
        F.col("vec_id").alias("cand_id"), F.col("v").alias("cv")
    )

    def cos(a: str, b: str) -> Column:
        return dot(a, b) / F.sqrt(norm2(a) * norm2(b))

    # numpy scoring (_cos_scores_numpy carry_vec=True) A/B-measured
    # NEGATIVE here (1.88 vs 1.68 min, loses every rep): the pool needs
    # the candidate vector, and re-emitting it N_QUERY x through Arrow
    # costs more than the fold saving. Stays the JVM fold pass.
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .select("query_id", "cand_id", "cv", cos("qv", "cv").alias("rel"))
    )
    wrel = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("cand_id")
    )
    pool_df = scored.select(
        "*", F.row_number().over(wrel).alias("rnk")
    ).filter(F.col("rnk") <= MMR_POOL)
    if _MMR_LOCAL:
        # NOTE: this arm is EAGER — collecting the bounded pool runs
        # the scoring job inside build(); explain() of the returned
        # frame shows only the driver-local result relation. bench.py
        # times build()+action together, so the cost is fully counted.
        return _mmr_greedy_local(spark, pool_df)
    # tiny (N_QUERY x MMR_POOL rows) but referenced by all three greedy
    # steps; persisting keeps the corpus scoring pass single-run (same
    # discipline as _lsh_pairs' signature cache, LRU-evicted)
    from barco_spark.session import eager_persist

    pool = eager_persist(pool_df)
    s1 = pool.filter(F.col("rnk") == 1).select(
        "query_id",
        F.col("cand_id").alias("s1_id"),
        F.col("cv").alias("s1v"),
        F.col("rel").alias("s1_rel"),
    )
    rest = pool.filter(F.col("rnk") >= 2)
    st2 = rest.join(F.broadcast(s1), "query_id").select(
        "query_id",
        "cand_id",
        "cv",
        "rel",
        (
            F.lit(0.7) * F.col("rel") - F.lit(0.3) * cos("cv", "s1v")
        ).alias("mmr2"),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("mmr2").desc(), F.col("cand_id")
    )
    s2 = (
        st2.select("*", F.row_number().over(w2).alias("rn"))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            F.col("cand_id").alias("s2_id"),
            F.col("cv").alias("s2v"),
            F.col("rel").alias("s2_rel"),
            F.col("mmr2").alias("s2_score"),
        )
    )
    st3 = (
        rest.join(F.broadcast(s1), "query_id")
        .join(F.broadcast(s2), "query_id")
        .filter(F.col("cand_id") != F.col("s2_id"))
        .select(
            "query_id",
            "cand_id",
            "rel",
            (
                F.lit(0.7) * F.col("rel")
                - F.lit(0.3) * F.greatest(cos("cv", "s1v"), cos("cv", "s2v"))
            ).alias("mmr3"),
        )
    )
    w3 = Window.partitionBy("query_id").orderBy(
        F.col("mmr3").desc(), F.col("cand_id")
    )
    s3 = (
        st3.select("*", F.row_number().over(w3).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("query_id", "cand_id", "rel", "mmr3")
    )
    out1 = s1.select(
        "query_id",
        F.col("s1_id").alias("cand_id"),
        F.col("s1_rel").alias("relevance"),
        (F.lit(0.7) * F.col("s1_rel")).alias("mmr_score"),
        F.lit(1).alias("mmr_rank"),
    )
    out2 = s2.select(
        "query_id",
        F.col("s2_id").alias("cand_id"),
        F.col("s2_rel").alias("relevance"),
        F.col("s2_score").alias("mmr_score"),
        F.lit(2).alias("mmr_rank"),
    )
    out3 = s3.select(
        "query_id",
        "cand_id",
        F.col("rel").alias("relevance"),
        F.col("mmr3").alias("mmr_score"),
        F.lit(3).alias("mmr_rank"),
    )
    return out1.unionAll(out2).unionAll(out3).orderBy("query_id", "mmr_rank")


# --------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of lexical + vector evidence
# --------------------------------------------------------------------------
RRF_K = 60  # the standard RRF damping constant (Cormack et al. 2009)
RRF_LIST = 20  # per-ranker candidate list depth
RRF_TOP = 10  # fused results returned
# query-by-example: document 0 / its embedding (vec_id == doc_id on the
# synthetic corpus: every document has exactly one embedding row)


@register(
    "hybrid_rrf_retrieval",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    qe AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    vec_scored AS (
      SELECT vec_id AS doc_id, {_cos_sql_fwd('v', 'qv')} AS cos
      FROM e CROSS JOIN qe WHERE vec_id >= {N_QUERY}),
    vec_list AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS vec_rank
      FROM (SELECT * FROM vec_scored ORDER BY cos DESC, doc_id
            LIMIT {RRF_LIST})),
    w AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws
          FROM documents),
    qw AS (SELECT ws AS qws FROM w WHERE doc_id = 0),
    lex_scored AS (
      SELECT doc_id,
             CAST(len(list_intersect(ws, qws)) AS DOUBLE)
               / (len(ws) + len(qws) - len(list_intersect(ws, qws))) AS jac
      FROM w CROSS JOIN qw WHERE doc_id >= {N_QUERY}),
    lex_list AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY jac DESC, doc_id) AS lex_rank
      FROM (SELECT * FROM lex_scored ORDER BY jac DESC, doc_id
            LIMIT {RRF_LIST})),
    fused AS (
      SELECT COALESCE(v.doc_id, l.doc_id) AS doc_id,
             v.vec_rank, l.lex_rank,
             COALESCE(CAST(1 AS DOUBLE) / ({RRF_K} + v.vec_rank), 0.0)
               + COALESCE(CAST(1 AS DOUBLE) / ({RRF_K} + l.lex_rank), 0.0)
               AS rrf_score
      FROM vec_list v FULL JOIN lex_list l ON v.doc_id = l.doc_id)
    SELECT doc_id, vec_rank, lex_rank, rrf_score,
           CAST(ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id)
                AS INTEGER) AS fused_rank
    FROM (SELECT * FROM fused ORDER BY rrf_score DESC, doc_id
          LIMIT {RRF_TOP})
    ORDER BY fused_rank
    """,
    "similarity",
    doc=(
        "Hybrid retrieval, the canonical RAG pattern: rank the corpus "
        "by semantic evidence (cosine against the example document's "
        "embedding; vec_id == doc_id joins the two tables) and by "
        "lexical evidence (word-set Jaccard against its text), take "
        f"each ranker's top-{RRF_LIST} (TakeOrderedAndProject — never "
        "a global sort), and fuse with reciprocal-rank fusion "
        f"1/({RRF_K}+rank) summed where present (Cormack et al. 2009, "
        "the fusion Elasticsearch/Vespa ship). Ranks are integers and "
        "each contribution is one IEEE division, so the pairing is "
        "bit-for-bit; ties break on doc id at every stage including "
        "both LIMIT boundaries. At 100 TB the per-ranker lists come "
        "from the ANN index and the inverted index (both shipped "
        "here); the fusion itself is a K-row outer join regardless of "
        "corpus size — exactly the plan this query compiles to."
    ),
)
def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    qe = e.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    vec_scored = (
        e.filter(F.col("vec_id") >= N_QUERY)
        .crossJoin(F.broadcast(qe))
        .select(
            F.col("vec_id").alias("doc_id"),
            (dot("v", "qv") / F.sqrt(norm2("v") * norm2("qv"))).alias("cos"),
        )
    )
    def ranked_list(scored: DataFrame, score: str, rank_name: str) -> DataFrame:
        # the tie-break discipline must match at BOTH boundaries: the
        # LIMIT cut and the rank numbering order by (score desc, doc_id)
        order = [F.col(score).desc(), F.col("doc_id")]
        return (
            scored.orderBy(*order)
            .limit(RRF_LIST)
            .select(
                "doc_id",
                F.row_number().over(Window.orderBy(*order)).alias(rank_name),
            )
        )

    vec_list = ranked_list(vec_scored, "cos", "vec_rank")
    w = t(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("ws")
    )
    qw = w.filter(F.col("doc_id") == 0).select(F.col("ws").alias("qws"))
    inter = F.size(F.array_intersect("ws", "qws"))
    lex_scored = (
        w.filter(F.col("doc_id") >= N_QUERY)
        .crossJoin(F.broadcast(qw))
        .select(
            "doc_id",
            (
                inter.cast("double")
                / (F.size("ws") + F.size("qws") - inter)
            ).alias("jac"),
        )
    )
    lex_list = ranked_list(lex_scored, "jac", "lex_rank")
    contrib = lambda r: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(RRF_K) + F.col(r)), F.lit(0.0)
    )
    fused = (
        vec_list.join(lex_list, "doc_id", "full")
        .select(
            "doc_id",
            "vec_rank",
            "lex_rank",
            (contrib("vec_rank") + contrib("lex_rank")).alias("rrf_score"),
        )
        .orderBy(F.col("rrf_score").desc(), "doc_id")
        .limit(RRF_TOP)
    )
    return fused.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.col("rrf_score").desc(), "doc_id"))
        .cast("int")
        .alias("fused_rank"),
    ).orderBy("fused_rank")
