"""Integer-quantized k-means: the oracle-paired clustering twin.

kmeans_embeddings (similarity.py) is rows-only by a recorded r11
decline: float Lloyd updates accumulate per-partition partial sums and
float addition is non-associative, so centroids depend on the
row-to-partition mapping. This module applies the ann_int8_recall /
ann_pq_search_int8 quantization trick to the Lloyd loop itself:
per-vector int8 quantization makes every distance an exact integer and
every centroid update an integer sum + one mirrored IEEE
floor-division — associative, partition-independent, reproducible
bit-for-bit in DuckDB SQL, so the whole fixed-iteration fit can be
driver-hash-checked. kmeans_embeddings (numpy over Arrow batches, real
Lloyd convergence) remains the 100 TB throughput path; this twin
proves the assign/update/empty-cluster structure exactly.

Scale shape: each assignment is a broadcast of K x dim integers probed
by one JVM-codegen pass over the corpus (no corpus shuffle); each
update shuffles only tasks x K x dim partial sums (posexplode is
pipelined into a partial hash aggregate — map-side combine keeps the
exchange KB-sized at any corpus size). Centroids (K x dim longs) are
collected per iteration — a bounded aggregate, the same pattern as
kmeans_embeddings' fit.

Reference surface parity: the reference is a byte broker with no
clustering op (SURVEY.md §2); this extends the LLM-pipeline tranche
the brief asks for beyond reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from barco_spark.registry import register
from barco_spark.tables import t

KM_K = 8  # clusters
KM_ITERS = 2  # fixed Lloyd rounds (unrolled in the SQL oracle)
KM_DIM = 64  # embeddings table dimension

# r12: the fit runs as one bit-exact Arrow pass per Lloyd round
# (quantize + integer-L2 assign + per-cluster integer partial sums in
# the kernel; integer arithmetic is order-free-exact).  Fold pipeline
# kept below as the A/B + parity arm: scripts/ab_km_numpy.py.
_KM_NUMPY = True
# r13 (ADVICE r12 item 4): see pq.py — spread of the numpy kernel's
# scan input A/B-measured NEGATIVE (scripts/ab_numpy_spread.py);
# kept as an A/B hook, default OFF.
_NUMPY_SPREAD = False


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from barco_spark.operators.similarity import _absmax, _int8_quantize

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # The quantize + every Lloyd pass are interpreted higher-order
    # functions (CodegenFallback) — expensive per ROW, not per byte.
    # A small parquet file arrives as 1-3 splits, so on local[32] the
    # whole fit ran on <=3 cores (measured r12: 2.6 s executor time in
    # the quantize stage alone at sf0.1).  When the scan's split count
    # is below the session parallelism, spread rows round-robin before
    # the heavy math; at warehouse scale the corpus already has >=
    # parallelism splits and no extra shuffle is added (guide §2.5/§6).
    par = spark.sparkContext.defaultParallelism
    if e.rdd.getNumPartitions() < par:
        e = e.repartition(par)
    return e.select(
        "vec_id", _int8_quantize("v", _absmax("v")).alias("qv")
    ).localCheckpoint(eager=False)  # read+quantize once across 3 passes


def _assign(z: DataFrame, cents: list[tuple[int, list[int]]]) -> DataFrame:
    """vec_id -> (cid, d2) for the nearest centroid: integer L2 argmin,
    lowest cid on ties. Centroids ride in as ONE K x dim array-of-array
    literal (KB-sized) inside a single SQL expression, so the pass is
    one projection over the corpus — array_min() over K exact-integer
    (d2, cid) structs, no join, no shuffle.

    r12 shape note: the original form built K separate F.struct(
    F.aggregate(F.zip_with(qv, <64 F.lit columns>, ...))) Column trees
    — ~4,600 py4j/Catalyst nodes per assign, re-built and re-analyzed
    for every iteration (measured: ~5 s of DRIVER gaps per fit at
    sf0.1), and F.least(...)[field] referenced the un-collapsible
    expression twice, double-evaluating every interpreted fold.  One
    SQL string with a literal 2-D array is a ~30-node tree, and the
    struct min is evaluated once per row in its own projection (the
    field extraction happens in a separate Project that CollapseProject
    will not inline, because the struct expression is non-cheap).
    Integer argmin semantics are unchanged: struct comparison orders by
    (d2, cid), i.e. lowest distance then lowest centroid id."""
    cents_sql = (
        "array("
        + ",".join(
            "array(" + ",".join(f"{x}L" for x in c) + ")" for _, c in cents
        )
        + ")"
    )
    cids_sql = "array(" + ",".join(str(cid) for cid, _ in cents) + ")"
    best = (
        f"array_min(zip_with({cents_sql}, {cids_sql}, (c, id) -> struct("
        "aggregate(zip_with(qv, c, (x, y) -> (x - y) * (x - y)), 0L,"
        " (a, x) -> a + x) AS d2, cast(id AS int) AS cid)))"
    )
    return z.select("vec_id", "qv", F.expr(best).alias("b")).select(
        "vec_id",
        "qv",
        F.col("b.cid").alias("cid"),
        F.col("b.d2").alias("d2"),
    )


def _update(
    assigned: DataFrame, cents: list[tuple[int, list[int]]]
) -> list[tuple[int, list[int]]]:
    """New centroid = element-wise floor(sum/count) over the members
    (exact integers + one mirrored IEEE divide+floor); an empty cluster
    keeps its old centroid. The posexplode feeds a partial hash
    aggregate, so the exchange carries tasks x K x dim rows; the
    collect is K x dim longs — bounded."""
    rows = (
        assigned.select("cid", F.posexplode("qv").alias("pos", "x"))
        .groupBy("cid", "pos")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("cnt"))
        .select(
            "cid",
            "pos",
            F.floor(F.col("s") / F.col("cnt")).cast("bigint").alias("xc"),
        )
        .groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "xc"))),
                lambda s: s["xc"],
            ).alias("c")
        )
        .collect()
    )
    new = {r.cid: list(r.c) for r in rows}
    return [(cid, new.get(cid, old)) for cid, old in cents]


_KM_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
st AS (SELECT CAST(CEIL(COUNT(*) / {KM_K}.0) AS BIGINT) AS s FROM e),
z AS (SELECT vec_id,
             list_transform(v, x -> CAST(floor(x * 127.0 /
               greatest(list_reduce(list_transform(v, y -> abs(y)),
                        (acc, y) -> greatest(acc, y)), 1e-30)
               + 0.5) AS BIGINT)) AS qv
      FROM e),
c0 AS (SELECT CAST(vec_id // (SELECT s FROM st) AS INT) AS cid, qv AS c
       FROM z WHERE vec_id % (SELECT s FROM st) = 0),
a1 AS (
  SELECT vec_id, qv, cid, d2 FROM (
    SELECT z.vec_id, z.qv, c.cid,
           list_reduce(list_transform(range(1, {KM_DIM} + 1),
             i -> (z.qv[i] - c.c[i]) * (z.qv[i] - c.c[i])),
             (acc, x) -> acc + x) AS d2,
           ROW_NUMBER() OVER (PARTITION BY z.vec_id
                              ORDER BY list_reduce(
                                list_transform(range(1, {KM_DIM} + 1),
                                i -> (z.qv[i] - c.c[i]) * (z.qv[i] - c.c[i])),
                                (acc, x) -> acc + x), c.cid) AS rn
    FROM z CROSS JOIN c0 c) WHERE rn = 1),
u1 AS (
  SELECT cid, pos,
         CAST(FLOOR(CAST(SUM(qv[pos]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS xc
  FROM a1, generate_series(1, {KM_DIM}) g(pos)
  GROUP BY cid, pos),
c1n AS (SELECT cid, list(xc ORDER BY pos) AS c FROM u1 GROUP BY cid),
c1 AS (SELECT c0.cid, COALESCE(c1n.c, c0.c) AS c
       FROM c0 LEFT JOIN c1n USING (cid)),
a2 AS (
  SELECT vec_id, qv, cid, d2 FROM (
    SELECT z.vec_id, z.qv, c.cid,
           list_reduce(list_transform(range(1, {KM_DIM} + 1),
             i -> (z.qv[i] - c.c[i]) * (z.qv[i] - c.c[i])),
             (acc, x) -> acc + x) AS d2,
           ROW_NUMBER() OVER (PARTITION BY z.vec_id
                              ORDER BY list_reduce(
                                list_transform(range(1, {KM_DIM} + 1),
                                i -> (z.qv[i] - c.c[i]) * (z.qv[i] - c.c[i])),
                                (acc, x) -> acc + x), c.cid) AS rn
    FROM z CROSS JOIN c1 c) WHERE rn = 1),
u2 AS (
  SELECT cid, pos,
         CAST(FLOOR(CAST(SUM(qv[pos]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS xc
  FROM a2, generate_series(1, {KM_DIM}) g(pos)
  GROUP BY cid, pos),
c2n AS (SELECT cid, list(xc ORDER BY pos) AS c FROM u2 GROUP BY cid),
c2 AS (SELECT c1.cid, COALESCE(c2n.c, c1.c) AS c
       FROM c1 LEFT JOIN c2n USING (cid)),
a3 AS (
  SELECT vec_id, cid, d2 FROM (
    SELECT z.vec_id, c.cid,
           list_reduce(list_transform(range(1, {KM_DIM} + 1),
             i -> (z.qv[i] - c.c[i]) * (z.qv[i] - c.c[i])),
             (acc, x) -> acc + x) AS d2,
           ROW_NUMBER() OVER (PARTITION BY z.vec_id
                              ORDER BY list_reduce(
                                list_transform(range(1, {KM_DIM} + 1),
                                i -> (z.qv[i] - c.c[i]) * (z.qv[i] - c.c[i])),
                                (acc, x) -> acc + x), c.cid) AS rn
    FROM z CROSS JOIN c2 c) WHERE rn = 1)
SELECT cid AS cluster_id,
       COUNT(*) AS n_members,
       CAST(SUM(vec_id) AS BIGINT) AS sum_vec_id,
       CAST(SUM(d2) AS BIGINT) AS inertia_int
FROM a3 GROUP BY cid
"""


@register(
    "kmeans_int8_clusters",
    _KM_ORACLE,
    "similarity",
    doc=(
        "Oracle-paired k-means twin (the quantization trick applied to "
        "the Lloyd LOOP, not just a distance): per-vector int8 "
        f"quantization, {KM_K} stride-sampled initial centroids, "
        f"{KM_ITERS} fixed Lloyd rounds where assignment is an exact "
        "integer-L2 argmin (lowest cid on ties) and the update is an "
        "integer sum + one mirrored floor-division per dimension — "
        "every step associative and partition-independent, which is "
        "precisely the non-associativity that keeps the float "
        "kmeans_embeddings rows-only (its decline rationale, r11). "
        "Empty clusters keep their previous centroid on both sides. "
        "Output: per final cluster, member count, vec_id checksum and "
        "exact integer inertia — all integers, so the driver hash "
        "check covers the entire fit. Since r12 each Lloyd round is "
        "ONE bit-exact Arrow pass over the corpus scan (quantize + "
        "integer-L2 argmin + per-cluster integer partial sums in the "
        "kernel; integer arithmetic is order-free-exact, verified "
        "bit-equal to the fold pipeline at three SFs); centroids stay "
        "a bounded K x dim broadcast and the only exchange is the "
        "final K-row rollup."
    ),
)
def kmeans_int8_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    if _KM_NUMPY:
        return _kmeans_int8_numpy(spark, sf_dir)
    z = _quantized(spark, sf_dir)
    n = z.count()  # bounded driver scalar, mirrors the oracle's st CTE
    stride = max(1, math.ceil(n / KM_K))
    cents = [
        (int(r.vec_id // stride), list(r.qv))
        for r in z.filter(F.col("vec_id") % stride == 0).collect()
    ]
    cents.sort()
    for _ in range(KM_ITERS):
        cents = _update(_assign(z, cents), cents)
    final = _assign(z, cents)
    return final.groupBy(F.col("cid").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("vec_id").cast("bigint").alias("sum_vec_id"),
        F.sum("d2").cast("bigint").alias("inertia_int"),
    )


def _kmeans_int8_numpy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same fixed-iteration integer Lloyd fit as ONE bit-exact
    Arrow pass per round (r12, guide §4.2): each pass quantizes the
    batch in-kernel (_np_int8_quant — the exact _absmax/_int8_quantize
    scalar sequence), assigns by integer-L2 argmin (matmul expansion
    qn2 - 2*Q@C.T + cn2, bit-equal to the fold on integers; argmin
    first-index tie = lowest cid over the sorted centroid list = the
    array_min struct tie-break) and emits per-cluster integer partial
    sums.  Integer sums are associative, so driver-side accumulation
    over batches in any order is exact; the centroid update mirrors
    the fold arm's floor(double(sum) / count) exactly.  Replaces the
    quantize HOF + localCheckpoint, the per-round interpreted assign
    projections and the posexplode + groupBy(cid, pos) update
    exchanges; the only remaining exchange is the final K-row rollup."""
    import math

    import numpy as np
    import pandas as pd

    from barco_spark.operators.similarity import _emb_count, _np_int8_quant

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    n = _emb_count(spark, sf_dir)  # cached parquet-metadata count
    stride = max(1, math.ceil(n / KM_K))
    init_rows = e.filter(F.col("vec_id") % stride == 0).collect()
    # r13 (ADVICE r12): the numpy arm bypassed _quantized's narrow-scan
    # repartition, so every Lloyd pass ran its kernel on the raw 1-3
    # parquet splits.  Row-guarded hash spread — no-op at the driver's
    # correctness SFs and at warehouse scan widths.
    from barco_spark.tables import spread_rows

    if _NUMPY_SPREAD:
        e = spread_rows(e, spark, sf_dir, "vec_id", name="embeddings")
    init_rows.sort(key=lambda r: r[0])
    Q0, _ = _np_int8_quant(
        np.stack([np.asarray(r[1], dtype=np.float64) for r in init_rows])
    )
    cents = sorted(
        (int(r[0] // stride), [int(x) for x in Q0[i]])
        for i, r in enumerate(init_rows)
    )

    def _pass(cents_list, final: bool) -> DataFrame:
        cids = np.array([c for c, _ in cents_list], dtype=np.int64)
        C = np.stack(
            [np.asarray(v, dtype=np.int64) for _, v in cents_list]
        )
        cn2 = (C * C).sum(axis=1)
        bc = spark.sparkContext.broadcast((cids, C, cn2))
        schema = (
            "cid int, cnt long, svid long, inertia long"
            if final
            else "cid int, cnt long, s array<long>"
        )

        def kern(batches):
            cids_, C_, cn2_ = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                M = np.stack(pdf["v"].map(np.asarray).values)
                Q, _ = _np_int8_quant(M)
                qn2 = (Q * Q).sum(axis=1)
                d2 = qn2[:, None] - 2 * (Q @ C_.T) + cn2_[None, :]
                j = np.argmin(d2, axis=1)
                vids = pdf["vec_id"].to_numpy(dtype=np.int64)
                out = []
                for idx in range(len(cids_)):
                    mask = j == idx
                    if not mask.any():
                        continue
                    if final:
                        out.append(
                            (
                                int(cids_[idx]),
                                int(mask.sum()),
                                int(vids[mask].sum()),
                                int(d2[mask, idx].sum()),
                            )
                        )
                    else:
                        out.append(
                            (
                                int(cids_[idx]),
                                int(mask.sum()),
                                [int(x) for x in Q[mask].sum(axis=0)],
                            )
                        )
                cols = (
                    ["cid", "cnt", "svid", "inertia"]
                    if final
                    else ["cid", "cnt", "s"]
                )
                yield pd.DataFrame(out, columns=cols)

        return e.mapInPandas(kern, schema)

    for _ in range(KM_ITERS):
        sums: dict[int, np.ndarray] = {}
        cnts: dict[int, int] = {}
        for r in _pass(cents, final=False).collect():
            a = np.asarray(r.s, dtype=np.int64)
            if r.cid in sums:
                sums[r.cid] = sums[r.cid] + a
                cnts[r.cid] += r.cnt
            else:
                sums[r.cid] = a
                cnts[r.cid] = r.cnt
        cents = [
            (
                cid,
                [
                    int(x)
                    for x in np.floor(
                        sums[cid].astype(np.float64) / cnts[cid]
                    ).astype(np.int64)
                ]
                if cid in sums
                else old,
            )
            for cid, old in cents
        ]
    return (
        _pass(cents, final=True)
        .groupBy(F.col("cid").alias("cluster_id"))
        .agg(
            # coalesce keeps the column non-nullable, matching the fold
            # arm's count() schema exactly (a group always has >=1 row)
            F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias(
                "n_members"
            ),
            F.sum("svid").cast("bigint").alias("sum_vec_id"),
            F.sum("inertia").cast("bigint").alias("inertia_int"),
        )
    )
