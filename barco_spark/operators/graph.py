"""Graph analytics over the document-similarity graph.

``pagerank_similarity_graph``: PageRank (Page et al. 1999) over the
near-duplicate pair graph that ``dedup_minhash_lsh`` produces — the
centrality signal curation pipelines use to pick the canonical copy
inside a duplicate neighborhood (the most-connected variant wins,
rather than min-id).

The whole computation is INTEGER fixed-point (rank scaled by 1e9,
damping 0.85 as 85/100, every division an integer ``div``), so an
inherently iterative algorithm is still bit-exactly oracle-checkable:
the Spark side loops ``N_ITER`` times; the DuckDB oracle unrolls the
same update as ``N_ITER`` nested CTEs.  Float PageRank would diverge
across engines in summation order — fixed-point cannot.

Update rule per iteration (simplified PageRank, dangling mass dropped,
the standard formulation for similarity neighborhoods):

    p[v] = (15 * SCALE / 100) / N  +  85 * sum_{u->v} (p[u] / deg[u]) / 100

Scale notes (100 TB posture): the edge list is the LSH pair graph —
candidates after banding, ORDERS of magnitude smaller than the corpus
(SCALING.md LSH rows).  Each iteration is one hash-aggregate on dst +
one broadcast-joinable rank table; the corpus itself is never touched
after pair generation.  Same loop posture as dedup_clusters' label
propagation: lineage capped per round by the localCheckpoint helper if
rounds grow (3 here).

No reference analogue (the broker has no graph surface; SURVEY.md §2.7
marks the analytics categories ABSENT); PageRank per the public paper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from barco_spark.operators.dedup import _LSH_PAIRS_CTES, _lsh_pairs
from barco_spark.registry import register

SCALE = 1_000_000_000  # fixed-point: 1.0 == 1e9
N_ITER = 3
DAMP_NUM, DAMP_DEN = 85, 100  # 0.85 damping as an exact ratio

# Driver fast-path bound, same class as dedup._CLUSTER_DRIVER_MAX_EDGES:
# the pair graph is the OUTPUT of LSH+verify — near-dup pairs only,
# orders of magnitude smaller than the corpus — so up to ~32 MB of
# (long, long) pairs the whole fixed-point loop is cheaper on the
# driver than N_ITER rounds of join+aggregate job scheduling.  The
# arithmetic is INTEGER throughout (that is the point of the operator),
# so the local loop is bit-identical to the distributed one; beyond the
# cap the distributed loop below remains the only path.
_GRAPH_DRIVER_MAX_PAIRS = 2_000_000


def _one_iter_sql(prev: str, out: str) -> str:
    """One unrolled fixed-point PageRank update in DuckDB SQL."""
    return f"""
    {out} AS (
      SELECT n.node,
             CAST((15::BIGINT * {SCALE} // 100) // (SELECT cnt FROM nn)
                  + {DAMP_NUM}::BIGINT * COALESCE(c.contrib, 0)
                    // {DAMP_DEN} AS BIGINT) AS p
      FROM nodes n
      LEFT JOIN (
        SELECT e.dst AS node, SUM(pp.p // d.deg) AS contrib
        FROM edges e
        JOIN {prev} pp ON pp.node = e.src
        JOIN deg d ON d.node = e.src
        GROUP BY e.dst
      ) c ON c.node = n.node
    )"""


_PR_ITERS = ",".join(
    _one_iter_sql(f"p{i}", f"p{i + 1}") for i in range(N_ITER)
)


@register(
    "pagerank_similarity_graph",
    f"""
    WITH {_LSH_PAIRS_CTES},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    nn AS (SELECT COUNT(*) AS cnt FROM nodes),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),
    p0 AS (SELECT node, {SCALE}::BIGINT // (SELECT cnt FROM nn) AS p
           FROM nodes),
    {_PR_ITERS}
    SELECT node AS doc_id, p AS rank_fp
    FROM p{N_ITER}
    """,
    "similarity",
    doc=(
        "Integer fixed-point PageRank over the LSH near-duplicate "
        "graph (canonical-copy centrality): rank scaled by 1e9, "
        "damping 85/100, every step an integer div — so the iterative "
        "loop is bit-exactly oracle-paired (the DuckDB oracle unrolls "
        "the same 3 updates as nested CTEs). Each iteration is one "
        "dst-keyed hash aggregate over the pair graph, which is "
        "banding-bounded and far smaller than the corpus."
    ),
)
def pagerank_similarity_graph(
    spark: SparkSession, sf_dir: str, driver_max_pairs: int | None = None
) -> DataFrame:
    # Materialize the PAIR list before the symmetrizing union
    # references it twice (r12, guide §2.4/§5): building the union
    # plan over an un-materialized cached subtree made AQE run one
    # table-cache stage per reference — the interpreted-HOF signature
    # pass executed up to 8x inside the first action (measured 21.0 s
    # cold / 3.3 s warm for the edge build at sf0.1; with the pair
    # cache materialized first it is 4.6 s cold / 2.8 s warm).
    pairs = _lsh_pairs(spark, sf_dir).select("doc_a", "doc_b").persist()
    cap = _GRAPH_DRIVER_MAX_PAIRS if driver_max_pairs is None else driver_max_pairs
    # Adaptive small-graph path (r12, the dedup_clusters pattern),
    # decided by ONE capped probe job: when the pair graph fits on the
    # driver, run the integer fixed point locally — the distributed
    # loop costs N_ITER rounds of join+aggregate JOB SCHEDULING on a
    # node-count-sized relation (measured: ~45 jobs, 16.7 s of driver
    # gaps under contamination), while the same integer arithmetic over
    # a collected edge list is milliseconds.  Bit-identical by
    # construction: every step is bigint div on positive operands
    # (Python // == Spark div there).
    head = pairs.limit(cap + 1).collect()
    if len(head) <= cap:
        pairs.unpersist()
        from barco_spark.session import local_rows_df

        deg: dict[int, int] = {}
        for r in head:
            deg[r.doc_a] = deg.get(r.doc_a, 0) + 1
            deg[r.doc_b] = deg.get(r.doc_b, 0) + 1
        n_nodes = len(deg)
        if n_nodes == 0:
            return local_rows_df(spark, [], "doc_id long, rank_fp long")
        base = (15 * SCALE // 100) // n_nodes
        p = {v: SCALE // n_nodes for v in deg}
        for _ in range(N_ITER):
            share = {v: p[v] // deg[v] for v in deg}
            contrib = dict.fromkeys(deg, 0)
            for r in head:
                contrib[r.doc_b] += share[r.doc_a]
                contrib[r.doc_a] += share[r.doc_b]
            p = {v: base + DAMP_NUM * contrib[v] // DAMP_DEN for v in deg}
        return local_rows_df(
            spark, sorted(p.items()), "doc_id long, rank_fp long"
        )

    n_pairs = pairs.count()  # scalar; materializes the pair cache
    edges = pairs.selectExpr("doc_a AS src", "doc_b AS dst").unionByName(
        pairs.selectExpr("doc_b AS src", "doc_a AS dst")
    )
    n_edges = 2 * n_pairs  # exact: the union mirrors every pair once
    # the pair graph is tiny relative to the corpus; persist it so the
    # per-iteration joins do not re-run the LSH pipeline
    edges = edges.persist()
    if n_edges < 1_000_000:
        # small graph: 32-partition shuffles per round are pure task
        # overhead — persist the edges into a handful of partitions
        # (reads from the pair cache, no recompute; measured 4.4 s
        # -> 3.9 s at sf0.1 together with the rank broadcast below)
        edges.unpersist()
        edges = edges.coalesce(8).persist()
    edges.count()  # materialize from the pair cache, then free it
    pairs.unpersist()
    # the degree table is ITERATION-INVARIANT and NODE-sized; persist it
    # once — it carries the node set too (every node of the symmetrized
    # edge list appears as a src), so the old separate nodes
    # distinct+persist+count and the EDGE-sized src_deg persist+count
    # are both gone (r12: two fewer materialization jobs, one fewer
    # edge-wide cache; the pagerank driver-gap audit measured ~0.37 s
    # of driver time per job at bench scale)
    deg_nodes = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .persist()
    )
    nodes = deg_nodes.select("node")
    n_nodes = deg_nodes.count()  # scalar; also materializes the cache
    # rank table is one row per NODE: broadcast it only when measurably
    # small — at petabyte pair graphs it stays a shuffled hash join
    bcast_rank = n_nodes < 500_000
    base = (15 * SCALE // 100) // n_nodes
    p = nodes.select("node", F.lit(SCALE // n_nodes).alias("p"))
    for _ in range(N_ITER):
        # per-node share FIRST (node-sized join + integer div once per
        # NODE), then probe the edge cache with the small side: the
        # old shape joined rank onto a persisted (src, dst, deg) edge
        # copy and divided per EDGE row — same integers, more work,
        # one more corpus... er, edge-scale cache to build and hold
        share = p.join(deg_nodes, "node").select(
            F.col("node").alias("src"),
            F.expr("p div deg").cast("bigint").alias("share"),
        )
        sj = F.broadcast(share) if bcast_rank else share
        contrib = (
            edges.join(sj, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("share").alias("contrib"))
        )
        p = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(
                    f"{DAMP_NUM} * coalesce(contrib, 0) div {DAMP_DEN}"
                ).cast("bigint")
            ).alias("p"),
        )
    # Cache release (the _kcore_peel discipline): the returned frame
    # depends lazily on all three iteration caches, so eagerly
    # materialize the FINAL ranks (one row per node — the smallest
    # relation here) via localCheckpoint, then free the edge/node/degree
    # blocks.  Library and long-lived-session callers thus hold one
    # node-sized checkpoint (released at the next free_persistent_rdds
    # sweep or session boundary) instead of leaking three edge-scale
    # caches per invocation.
    out = p.select(
        F.col("node").alias("doc_id"), F.col("p").alias("rank_fp")
    ).localCheckpoint()
    deg_nodes.unpersist()
    edges.unpersist()
    return out


@register(
    "graph_triangle_census",
    f"""
    WITH {_LSH_PAIRS_CTES},
    edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs),
    tri AS (
      SELECT e1.a, e1.b, e2.b AS c
      FROM edges e1
      JOIN edges e2 ON e2.a = e1.b
      JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b),
    tpn AS (
      SELECT node, COUNT(*) AS tri FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
      GROUP BY node),
    deg AS (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT doc_a AS node FROM pairs
        UNION ALL SELECT doc_b FROM pairs)
      GROUP BY node)
    SELECT d.node AS doc_id,
           CAST(d.deg AS BIGINT) AS degree,
           CAST(COALESCE(t.tri, 0) AS BIGINT) AS triangles,
           CASE WHEN d.deg >= 2
                THEN CAST(2 * COALESCE(t.tri, 0) AS DOUBLE)
                     / (d.deg * (d.deg - 1))
                ELSE CAST(0 AS DOUBLE) END AS local_clustering
    FROM deg d LEFT JOIN tpn t USING (node)
    ORDER BY triangles DESC, doc_id
    LIMIT 10
    """,
    "similarity",
    doc=(
        "Triangle census of the near-duplicate graph: for each node its "
        "degree, triangle count, and local clustering coefficient — the "
        "signal that separates a TEMPLATE CLUSTER (boilerplate families "
        "form near-cliques, clustering ~1) from chain-shaped drift "
        "(successive edits, clustering ~0), which matters when deciding "
        "whether to keep one canonical copy or one per chain endpoint. "
        "Degree-oriented enumeration: edges are oriented low-(deg,id) "
        "-> high, wedges enumerated on oriented out-edges and closed "
        "against oriented edges, so each triangle is counted exactly "
        "once AND the wedge fan-out per node is bounded by O(sqrt(|E|)) "
        "— a hub node cannot re-quadratize the join. The final "
        "coefficient is one double division of exact integers; all "
        "joins run on the banding-bounded pair graph, never the corpus."
    ),
)
def graph_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Degree-oriented enumeration (the 100 TB standard, e.g. Suri &
    # Vassilvitskii 2011): orient each undirected edge from its
    # lower-(deg, id) endpoint to the higher one, enumerate wedges on
    # the ORIENTED out-edges, and close them against oriented edges.
    # Out-degree under this orientation is bounded by O(sqrt(|E|)), so
    # a hub node (e.g. boilerplate shared by a million docs after
    # raising _LSH_BUCKET_CAP) can never re-quadratize the wedge join —
    # the naive b==a2 join fans out by raw degree squared on hubs.
    # Each triangle {x<y<z by (deg,id)} is counted exactly once as the
    # wedge x->y, x->z closed by y->z. Same triangles, same census as
    # the (orientation-free) DuckDB oracle above.
    from barco_spark.session import eager_persist

    pairs = eager_persist(
        _lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    )
    o = None
    try:
        deg = (
            pairs.selectExpr("doc_a AS node")
            .unionByName(pairs.selectExpr("doc_b AS node"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        da = deg.selectExpr("node AS doc_a", "deg AS deg_a")
        db = deg.selectExpr("node AS doc_b", "deg AS deg_b")
        lower_a = (F.col("deg_a") < F.col("deg_b")) | (
            (F.col("deg_a") == F.col("deg_b"))
            & (F.col("doc_a") < F.col("doc_b"))
        )
        # oriented edge list, with the destination's rank carried so the
        # wedge join can order its two legs without another deg join
        o = (
            pairs.join(da, "doc_a")
            .join(db, "doc_b")
            .select(
                F.when(lower_a, F.col("doc_a"))
                .otherwise(F.col("doc_b"))
                .alias("src"),
                F.when(lower_a, F.col("doc_b"))
                .otherwise(F.col("doc_a"))
                .alias("dst"),
                F.when(lower_a, F.col("deg_b"))
                .otherwise(F.col("deg_a"))
                .alias("dst_deg"),
            )
        )
        o = eager_persist(o)  # feeds both wedge legs + the closing join
        e1 = o.selectExpr("src", "dst AS b", "dst_deg AS bdeg")
        e2 = o.selectExpr("src AS src2", "dst AS c", "dst_deg AS cdeg")
        wedge = e1.join(
            e2,
            (F.col("src") == F.col("src2"))
            & (
                (F.col("bdeg") < F.col("cdeg"))
                | (
                    (F.col("bdeg") == F.col("cdeg"))
                    & (F.col("b") < F.col("c"))
                )
            ),
        )
        e3 = o.selectExpr("src AS b3", "dst AS c3")
        tri = wedge.join(
            e3, (F.col("b") == F.col("b3")) & (F.col("c") == F.col("c3"))
        ).select(F.col("src").alias("a"), "b", "c")
        tpn = (
            tri.selectExpr("a AS node")
            .unionByName(tri.selectExpr("b AS node"))
            .unionByName(tri.selectExpr("c AS node"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("tri"))
        )
        out = (
            deg.join(tpn, "node", "left")
            .select(
                F.col("node").alias("doc_id"),
                F.col("deg").cast("bigint").alias("degree"),
                F.coalesce(F.col("tri"), F.lit(0))
                .cast("bigint")
                .alias("triangles"),
                F.when(
                    F.col("deg") >= 2,
                    (F.coalesce(F.col("tri"), F.lit(0)) * 2).cast("double")
                    / (F.col("deg") * (F.col("deg") - 1)),
                )
                .otherwise(F.lit(0.0))
                .alias("local_clustering"),
            )
            .orderBy(F.col("triangles").desc(), "doc_id")
            .limit(10)
        )
        # the census is 10 rows: materialize eagerly so the persisted
        # pair graph can be released NOW instead of leaking cached
        # blocks for the session lifetime (the dedup_clusters pattern)
        rows = [
            (r["doc_id"], r["degree"], r["triangles"], r["local_clustering"])
            for r in out.collect()
        ]
        from barco_spark.session import local_rows_df

        return local_rows_df(
            spark,
            rows,
            "doc_id long, degree long, triangles long, local_clustering double",
        )
    finally:
        if o is not None:
            o.unpersist()
        pairs.unpersist()


KCORE_K = 2  # minimum within-core degree
KCORE_ROUNDS = 3  # unrolled peel rounds (matches the oracle CTEs)


def _kcore_round_sql(edges_in: str, edges_out: str) -> str:
    """One peel round in DuckDB SQL: drop nodes with degree < K, keep
    only edges between survivors."""
    return f"""
    n_{edges_out} AS (
      SELECT src AS node FROM {edges_in}
      GROUP BY src HAVING COUNT(*) >= {KCORE_K}),
    {edges_out} AS (
      SELECT e.src, e.dst FROM {edges_in} e
      JOIN n_{edges_out} a ON a.node = e.src
      JOIN n_{edges_out} b ON b.node = e.dst)"""


_KCORE_ROUNDS_SQL = ",".join(
    _kcore_round_sql(f"e{i}", f"e{i + 1}") for i in range(KCORE_ROUNDS)
)


@register(
    "graph_kcore",
    f"""
    WITH {_LSH_PAIRS_CTES},
    e0 AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs),
    {_KCORE_ROUNDS_SQL}
    SELECT src AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM e{KCORE_ROUNDS}
    GROUP BY src
    ORDER BY core_degree DESC, doc_id
    """,
    "similarity",
    doc=(
        f"{KCORE_ROUNDS}-round {KCORE_K}-core peel of the near-"
        "duplicate graph: repeatedly drop nodes with degree < "
        f"{KCORE_K} and the edges touching them. Survivors are the "
        "DENSE duplication communities — template/boilerplate families "
        "that warrant one canonical representative — separated from "
        "incidental pairwise matches, which a single threshold on pair "
        "similarity cannot do. Bit-exact oracle pairing via the same "
        "unrolled-rounds idiom as the fixed-point PageRank (the oracle "
        "unrolls the identical peel as nested CTEs). Each round is one "
        "degree aggregate + two semi-joins on the banding-bounded pair "
        "graph (never the corpus); the edge list is persisted once and "
        "released eagerly, and at 100 TB the loop extends to "
        "convergence exactly like dedup_clusters' label propagation "
        "(see graph_kcore_converged). The result stays DISTRIBUTED — "
        "dense duplication communities at web scale make the survivor "
        "set large, so nothing here collects to the driver; all but "
        "the final round's checkpoint blocks are freed inside the "
        "loop, the last at the session's next-query boundary "
        "(bench.py free_persistent_rdds)."
    ),
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    out, _ = _kcore_peel(spark, sf_dir, rounds=KCORE_ROUNDS)
    return out


def _kcore_peel(
    spark: SparkSession,
    sf_dir: str,
    rounds: int | None,
    driver_max_pairs: int | None = None,
) -> tuple[DataFrame, int]:
    """Shared k-core peel loop.

    ``rounds=N`` unrolls exactly N rounds (oracle-matchable);
    ``rounds=None`` peels to fixpoint (edge count stable round over
    round — peeling is monotone, so an unchanged count IS convergence).
    Returns (distributed result frame, rounds actually run).

    Adaptive small-graph path (r12, the dedup_clusters pattern): one
    capped probe job collects the undirected pair list; when it fits
    (see _GRAPH_DRIVER_MAX_PAIRS) the peel runs on the driver — integer
    degree counting and set filtering, identical round/convergence
    semantics — instead of per-round aggregate + two semi-joins + a
    localCheckpoint job on a near-empty relation.  Beyond the cap the
    distributed loop below is unchanged.

    Block discipline: each round localCheckpoints (the plan references
    `edges` three times per round — degree agg + both semi-join probes
    — so without a lineage cut round i re-executes round i-1 three
    times: measured 23.8 s vs 1.5 s at sf0.01).  The PREVIOUS round's
    checkpoint blocks are freed as soon as the new round materializes
    (localCheckpoint is eager), so live storage is one round's edge
    list, never the whole peel history.  The final round's blocks back
    the returned frame and are released at the next-query boundary.
    """
    from barco_spark.session import persistent_rdd_ids, unpersist_rdds

    before = persistent_rdd_ids(spark)
    pairs = _lsh_pairs(spark, sf_dir).select("doc_a", "doc_b").persist()
    cap = _GRAPH_DRIVER_MAX_PAIRS if driver_max_pairs is None else driver_max_pairs
    head = pairs.limit(cap + 1).collect()
    if len(head) <= cap:
        pairs.unpersist()
        from barco_spark.session import local_rows_df

        und = [(r.doc_a, r.doc_b) for r in head]
        n_edges = 2 * len(und) if rounds is None else -1
        done = 0
        while True:
            if rounds is not None and done >= rounds:
                break
            deg: dict[int, int] = {}
            for a, b in und:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            und = [
                (a, b)
                for a, b in und
                if deg[a] >= KCORE_K and deg[b] >= KCORE_K
            ]
            done += 1
            if rounds is None:
                n = 2 * len(und)
                if n == n_edges:
                    break
                n_edges = n
        core: dict[int, int] = {}
        for a, b in und:
            core[a] = core.get(a, 0) + 1
            core[b] = core.get(b, 0) + 1
        rows = sorted(core.items(), key=lambda kv: (-kv[1], kv[0]))
        return (
            local_rows_df(spark, rows, "doc_id long, core_degree long"),
            done,
        )
    try:
        # materialize the pair cache BEFORE the symmetrizing union
        # references it twice (the pagerank r12 finding, guide §2.4:
        # un-materialized cache + multi-reference plan = one AQE
        # table-cache stage per reference, re-running the signature
        # pass up to 8x on the first action)
        pairs.count()
        edges = (
            pairs.selectExpr("doc_a AS src", "doc_b AS dst")
            .unionByName(pairs.selectExpr("doc_b AS src", "doc_a AS dst"))
            .coalesce(8)
            .localCheckpoint()
        )
    finally:
        # the checkpoint materialized (or raised); either way the
        # upstream pair persist is no longer needed
        pairs.unpersist()
    n_edges = edges.count() if rounds is None else -1
    done = 0
    while True:
        if rounds is not None and done >= rounds:
            break
        keep = (
            edges.groupBy(F.col("src").alias("node"))
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= KCORE_K)
            .select("node")
        )
        prev_ids = persistent_rdd_ids(spark) - before
        edges = (
            edges.join(keep.withColumnRenamed("node", "src"), "src", "semi")
            .join(keep.withColumnRenamed("node", "dst"), "dst", "semi")
            .select("src", "dst")
            .localCheckpoint()
        )
        # new round is materialized; the previous round's blocks are dead
        unpersist_rdds(spark, prev_ids)
        done += 1
        if rounds is None:
            n = edges.count()
            if n == n_edges:
                break
            n_edges = n
    out = (
        edges.groupBy(F.col("src").alias("doc_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_degree"))
        .orderBy(F.col("core_degree").desc(), "doc_id")
    )
    return out, done


@register(
    "graph_kcore_converged",
    # ORACLE-PAIRED since r9: the fixpoint is a well-defined function
    # of the graph (the maximal subgraph with min degree >= K),
    # independent of peel order — so a DuckDB RECURSIVE CTE computes
    # the TRUE fixpoint. The peel is monotone-shrinking, so UNION ALL
    # recursion terminates; degrees need only ONE working-table
    # reference because the edge list is symmetric (degree(v) =
    # COUNT(*) OVER (PARTITION BY src) and, by symmetry, the dst
    # partition gives the neighbor's degree); each level carries its
    # edge count so the recursive term can stop when a round removes
    # nothing. The final select applies ONE extra peel round to the
    # last emitted level: recursion also stops when a round empties
    # the graph (zero rows emitted), and in that case the extra round
    # turns the last non-empty level into the true (empty) fixpoint —
    # while at a genuine fixpoint it is the identity.
    f"""
    WITH RECURSIVE {_LSH_PAIRS_CTES},
    e0 AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs),
    peel AS (
      SELECT src, dst, (SELECT COUNT(*) FROM e0) AS n FROM e0
      UNION ALL
      SELECT src, dst, new_n FROM (
        SELECT src, dst, COUNT(*) OVER () AS new_n, n AS old_n
        FROM (
          SELECT src, dst, n,
                 COUNT(*) OVER (PARTITION BY src) AS ds,
                 COUNT(*) OVER (PARTITION BY dst) AS dd
          FROM peel) t
        WHERE ds >= {KCORE_K} AND dd >= {KCORE_K}) s
      WHERE new_n < old_n),
    last AS (
      SELECT src, dst FROM peel WHERE n = (SELECT MIN(n) FROM peel)),
    fixpt AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               COUNT(*) OVER (PARTITION BY src) AS ds,
               COUNT(*) OVER (PARTITION BY dst) AS dd
        FROM last) t WHERE ds >= {KCORE_K} AND dd >= {KCORE_K})
    SELECT src AS doc_id, CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM fixpt GROUP BY src ORDER BY core_degree DESC, doc_id
    """,
    "similarity",
    doc=(
        f"{KCORE_K}-core peel of the near-duplicate graph run to "
        "CONVERGENCE rather than a fixed unroll: the peel repeats "
        "until the edge count is stable round over round (peeling "
        "only removes edges, so a stable count is the fixpoint). "
        "This is the shape the 100 TB playbook promises for "
        "graph_kcore — same per-round plan (one degree aggregate + "
        "two semi-joins on the banding-bounded pair graph), same "
        "localCheckpoint lineage cut per round, previous-round blocks "
        "freed as soon as the next round materializes so live storage "
        "is ONE round's edge list. ORACLE-PAIRED since r9 despite the "
        "data-dependent round count: the fixpoint is peel-order-"
        "independent, so a DuckDB RECURSIVE CTE (monotone-shrinking, "
        "terminates under UNION ALL) re-derives it exactly; "
        "tests/test_graph.py additionally proves it equals the "
        "unrolled graph_kcore whenever the fixpoint is reached within "
        f"{KCORE_ROUNDS} rounds, and rounds-run is bounded by the "
        "longest peel chain, not corpus size."
    ),
)
def graph_kcore_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    out, _ = _kcore_peel(spark, sf_dir, rounds=None)
    return out
