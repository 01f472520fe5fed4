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
        "Brute-force cosine top-k: broadcast the query set against the "
        "corpus scan (the cross join's left side is tiny => BroadcastNestedLoop "
        "with no corpus shuffle), then per-query ranking window."
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
    scored = F.broadcast(q).crossJoin(c).select(
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
        .filter(F.col("rank") <= TOP_K)
    )


@register(
    "dedup_embedding_cosine",
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
        "Embedding near-duplicate pairs (cosine >= 0.4; the synthetic corpus has no planted dups, max pairwise cosine ~0.51). Correctness "
        "baseline is all-pairs; the scale path buckets by LSH sign bits "
        "first (ann_lsh_buckets) so only same-bucket pairs are scored."
    ),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    a = e.select(
        F.col("vec_id").alias("vec_a"),
        F.col("label").alias("label_a"),
        F.col("v").alias("va"),
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col("label").alias("label_b"),
        F.col("v").alias("vb"),
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            "label_a",
            "label_b",
            (dot("va", "vb") / F.sqrt(norm2("va") * norm2("vb"))).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= 0.4)
    )


@register(
    "ann_lsh_buckets",
    None,  # scale-path operator; verified by rows-only check + pytest
    "similarity",
    doc=(
        "Random-hyperplane LSH bucketing: 8 sign bits from pseudo-random "
        "hyperplanes (deterministic md5-derived components). At scale the "
        "corpus is written bucketed by this key; queries probe one bucket. "
        "Verified in tests/test_similarity.py against brute force recall."
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
    bucket = F.lit(0)
    for j, comps in enumerate(planes):
        arr = F.array(*[F.lit(c) for c in comps])
        d = F.aggregate(
            F.zip_with(v, arr, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(d >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


_PLANES = _planes()


@register(
    "ann_lsh_search",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    bucketed AS (SELECT vec_id, v, {_bucket_sql('v', _PLANES)} AS bucket FROM e),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM bucketed WHERE vec_id < {N_QUERY}),
    c AS (SELECT vec_id AS cand_id, v AS cv, bucket FROM bucketed WHERE vec_id >= {N_QUERY}),
    scored AS (
      SELECT query_id, cand_id,
             {_DOT_SQL.format(a="qv", b="cv")}
               / sqrt({_NORM2_SQL.format(a="qv")} * {_NORM2_SQL.format(a="cv")}) AS cosine_sim
      FROM q JOIN c USING (bucket)),
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
        "LSH-bucketed ANN (the 100 TB scale path): corpus and queries "
        "bucketed by 8 deterministic hyperplane sign bits; each query "
        "scores only its own bucket (equi join, no cross join), then "
        "per-query top-3. Same hyperplanes on both engines, so the "
        "oracle matches bit-for-bit."
    ),
)
def ann_lsh_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    bucketed = e.select("vec_id", "v", _bucket_col(F.col("v"), _PLANES).alias("bucket"))
    q = bucketed.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "bucket"
    )
    c = bucketed.filter(F.col("vec_id") >= N_QUERY).select(
        F.col("vec_id").alias("cand_id"), F.col("v").alias("cv"), "bucket"
    )
    scored = F.broadcast(q).join(c, "bucket").select(
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
