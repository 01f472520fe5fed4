"""Relational operator surface (SURVEY.md §2.7) over the TPC-H-ish tables.

The reference broker has no relational operators at all (SURVEY.md §2.7
— verified ABSENT); this module supplies the full inventory Spark-first:
scans with pushdown, projections/filters, every join shape, hash
aggregation with partial/final phases, rollup/cube/grouping sets,
sorts/limits/top-k, set operations and scalar functions.

Scale notes (100 TB design point):
- Dimension tables (region/nation/customer/supplier/part) are broadcast
  (`F.broadcast`) so fact-side scans never shuffle for the join.
- Aggregations are expressed as groupBy().agg() => Catalyst plans
  partial (map-side) + final aggregation automatically.
- Money math is DECIMAL so partial aggregation is order-independent —
  required for deterministic results under any partitioning.
- Filters sit directly on the scan so parquet gets PushedFilters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from barco_spark.registry import register
from barco_spark.tables import t


def _dec2(c: str) -> F.Column:
    return F.col(c).cast("decimal(18,2)")


def _dec4(c: str) -> F.Column:
    return F.col(c).cast("decimal(18,4)")


# Domain-bounded narrow casts (r13, guide §2.3 "narrower types"): the
# money columns are bounded by the DATA DOMAIN (l_extendedprice <=
# ~104,950.00 — 3 spare integer digits in decimal(11,2)), discount/tax
# by construction <= 0.10 (decimal(5,4)); sums still get Spark's +10
# precision headroom ON TOP of the domain bound, so the narrowing is
# scale-safe, and ANSI mode raises loudly if a bound is ever violated.
# Why it matters: ep(11,2) * (1-d)(6,4) -> decimal(18,6) stays inside
# Spark's 18-digit compact-long decimal, while the old (18,2) x (19,4)
# -> (38,6) widths forced the per-row product through JavaBigDecimal.
# Values are bit-identical at both widths (decimal math is exact, the
# ROUND(x,2)/DOUBLE casts downstream are unchanged); measured on q1:
# min 1.151/1.176/1.236 vs 1.248/1.230/1.336 across three ABBA
# sittings (scripts/ab_q1_decimal.py).
def _m2(c: str) -> F.Column:
    return F.col(c).cast("decimal(11,2)")


def _r4(c: str) -> F.Column:
    return F.col(c).cast("decimal(5,4)")


def _one4() -> F.Column:
    return F.lit(1).cast("decimal(5,4)")


def _rev2(ep: str = "l_extendedprice", disc: str = "l_discount") -> F.Column:
    """ep * (1 - disc) as a compact decimal(18,6) product (see above)."""
    return _m2(ep) * (_one4() - _r4(disc))


# --------------------------------------------------------------------------
# Aggregation: TPC-H Q1 style pricing summary (partial+final hash agg)
# --------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,4))) * (1 + CAST(l_tax AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    "aggregation",
    doc="Full-scan hash aggregation with exact decimal money math.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # all casts domain-bound narrowed (see _m2/_r4/_rev2 above): the
    # disc_price product is compact decimal(18,6) per row, and the
    # discount sum buffer decimal(15,4) fits the compact-long path.
    cnt = F.count(F.lit(1))
    return (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_m2("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_m2("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.round(F.sum(_rev2()), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(_rev2() * (_one4() + _r4("l_tax"))), 2)
            .cast("double")
            .alias("sum_charge"),
            (F.sum(_m2("l_quantity")).cast("double") / cnt).alias("avg_qty"),
            (F.sum(_m2("l_extendedprice")).cast("double") / cnt).alias("avg_price"),
            (F.sum(_r4("l_discount")).cast("double") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Join + agg + top-k: TPC-H Q3 style shipping priority
# --------------------------------------------------------------------------
@register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-15'
      AND l_shipdate > TIMESTAMP '1998-06-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    "join",
    doc="Broadcast dim join -> hash agg -> global top-k (TakeOrderedAndProject).",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # scale shape: customer is the only broadcast side; orders+lineitem
    # are fact tables and join via shuffle (AQE upgrades to broadcast at
    # small SF automatically — never hint a fact-table broadcast)
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-15").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-15").cast("timestamp")
    )
    return (
        li.join(
            orders.join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(_rev2()), 2).cast("double").alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Multi-way star join: TPC-H Q5 style local supplier volume
# --------------------------------------------------------------------------
@register(
    "q5_region_revenue",
    """
    SELECT n_name,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
    "join",
    doc="Six-way star join; all dims broadcast so the fact scan shuffles once.",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = t(spark, sf_dir, "nation")
    supplier = t(spark, sf_dir, "supplier")
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    # scale shape: orders/customer join by shuffle (facts); supplier is
    # modest (10k x SF) and nation/region are tiny => broadcast those.
    # AQE upgrades the small-SF shuffle joins to broadcast at runtime.
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(_rev2()), 2).cast("double").alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# Scan + filter + projection (predicate pushdown / column pruning)
# --------------------------------------------------------------------------
@register(
    "scan_filter_project",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-04-01'
      AND l_quantity > 45
    """,
    "scan",
    doc="Filters land in parquet PushedFilters; ReadSchema is 5 columns.",
)
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
            & (F.col("l_quantity") > 45)
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


# --------------------------------------------------------------------------
# Join shapes: broadcast inner, left outer, semi, anti, range
# --------------------------------------------------------------------------
@register(
    "join_broadcast_agg",
    """
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    "join",
    doc="Fact-to-dim join with an explicit broadcast hint, then a hash aggregate — zero shuffle on the probe side.",
)
def join_broadcast_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .join(F.broadcast(t(spark, sf_dir, "customer")), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec2("o_totalprice")).cast("double").alias("total_price"),
        )
    )


@register(
    "join_left_outer",
    """
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
    "join",
    doc="Left outer join preserving customers with no orders; COUNT(col) keeps the null-row semantics.",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "customer")
        .join(t(spark, sf_dir, "orders"), F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count(F.col("o_orderkey")).alias("n_orders"))
    )


@register(
    "join_semi",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 200000)
    """,
    "join",
    doc="EXISTS as a left-semi join: probe rows pass at first match, no duplication, build side never materialized in the output.",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    big = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return (
        t(spark, sf_dir, "customer")
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


@register(
    "join_anti",
    """
    SELECT c_custkey FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "join",
    doc="NOT EXISTS as a left-anti join — the orphan-detection shape.",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "customer")
        .join(t(spark, sf_dir, "orders"), F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey")
    )


@register(
    "join_range_interval",
    """
    SELECT o_orderkey,
           COUNT(*) AS n_shipped_30d,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_30d
    FROM orders JOIN lineitem
      ON l_orderkey = o_orderkey
     AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
    GROUP BY o_orderkey
    """,
    "join",
    doc="Equi key + range predicate (range predicate evaluated post-join-key match).",
)
def join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .join(
            t(spark, sf_dir, "lineitem"),
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") <= F.expr("o_orderdate + INTERVAL 30 DAY")),
        )
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_shipped_30d"),
            # decimal(4,2): l_quantity <= 50 by domain -> SUM plans at
            # (14,2) = the sum(UnscaledValue(..)) long-add path (r13
            # ABBA: min 0.973 vs 1.055 wide, 3/4 paired positions)
            F.sum(F.col("l_quantity").cast("decimal(4,2)"))
            .cast("double")
            .alias("qty_30d"),
        )
    )


# --------------------------------------------------------------------------
# Aggregation variants: distinct, rollup, cube, grouping sets
# --------------------------------------------------------------------------
@register(
    "agg_distinct",
    """
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_acctbal
    FROM customer
    GROUP BY c_mktsegment
    """,
    "aggregation",
    doc="COUNT(DISTINCT) via Expand + two-phase aggregation (exact).",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cnt = F.count(F.lit(1))
    return (
        t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.count_distinct(F.col("c_nationkey")).alias("n_nations"),
            cnt.alias("n_customers"),
            (F.sum(_dec2("c_acctbal")).cast("double") / cnt).alias("avg_acctbal"),
        )
    )


@register(
    "agg_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "aggregation",
    doc="ROLLUP hierarchy totals in one pass (Expand), not one scan per level.",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from barco_spark.tables import spread

    # r13 (guide §2.5, the lineitem_unpivot_stats precedent): the
    # Expand x3 + decimal partial aggs rode the 3-split scan; exchange
    # the three pre-projected columns (project early, §2.3) and run
    # the Expand at ceil(rows/20k) width. ABBA both orders: spread min
    # 0.931/1.070 vs plain 1.072/1.242, winning 6/8 paired positions.
    # No-op at the driver's correctness SFs and warehouse scan widths.
    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity"
    )
    li = spread(li, spark, sf_dir, "lineitem", rows_per_task=20_000)
    # decimal(4,2): l_quantity <= 50 by domain, so SUM plans at (14,2)
    # — within the 18-digit bound where Spark rewrites the sum to
    # sum(UnscaledValue(..)), pure long adds across the Expand x3
    # (r13 ABBA: min 0.947/1.118 vs 1.097/1.194 wide, two sittings).
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(4,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "agg_cube",
    """
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "aggregation",
    doc="CUBE over two dims: all 4 grouping sets from a single Expand pass.",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    from barco_spark.tables import spread

    # r13: same row-guarded pre-Expand spread as agg_rollup (ABBA:
    # spread min 0.464 vs plain 0.511, 3/4 positions)
    o = t(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    o = spread(o, spark, sf_dir, "orders", rows_per_task=20_000)
    # decimal(8,2): o_totalprice <= ~555,285 by domain (6 integer
    # digits), so SUM plans at exactly (18,2) — the UnscaledValue
    # long-add path, across the Expand x4 (r13 ABBA: min 0.611/0.531
    # vs 0.642/0.612 wide, 6/8 paired positions over two sittings).
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(8,2)"))
            .cast("double")
            .alias("total"),
        )
    )


@register(
    "agg_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    "aggregation",
    doc="Explicit GROUPING SETS with grouping() to disambiguate the null rows.",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "orders").createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# --------------------------------------------------------------------------
# Sort / limit / top-k
# --------------------------------------------------------------------------
@register(
    "sort_topk",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
    "sort",
    doc="Global top-k: Spark plans TakeOrderedAndProject (no full sort).",
)
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------
@register(
    "set_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    "setop",
    doc="INTERSECT (distinct) of two key sets, planned as a left-semi join after aggregation.",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "set_except",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    "setop",
    doc="EXCEPT (distinct), planned as a left-anti join — set difference without a full sort.",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.distinct().exceptAll(s.distinct())


@register(
    "set_union_all",
    """
    SELECT c_custkey, 'BUILDING' AS seg FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey, 'MACHINERY' AS seg FROM customer WHERE c_mktsegment = 'MACHINERY'
    """,
    "setop",
    doc="UNION ALL keeping duplicates, then one aggregate over the combined relation.",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    b = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", F.lit("BUILDING").alias("seg")
    )
    m = c.filter(F.col("c_mktsegment") == "MACHINERY").select(
        "c_custkey", F.lit("MACHINERY").alias("seg")
    )
    return b.unionByName(m)


@register(
    "set_intersect_all",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    "setop",
    doc="INTERSECT ALL (multiset: min of per-side multiplicities), "
    "planned as a count-bucketed semi join — no full materialization "
    "of either side's duplicates.",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersectAll(s)


@register(
    "set_except_all",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    "setop",
    doc="EXCEPT ALL (multiset difference: per-key multiplicity n1-n2), "
    "planned as a counted anti-semi join on the key.",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s)


@register(
    "join_full_outer",
    """
    WITH c AS (
      SELECT c_custkey, c_acctbal FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    o AS (
      SELECT o_custkey, COUNT(*) AS n_orders
      FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey
    )
    SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
           c.c_acctbal AS acctbal,
           o.n_orders AS n_orders
    FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey
    """,
    "join",
    doc="FULL OUTER join with unmatched rows on BOTH sides (segment-"
    "filtered customers vs pre-aggregated finished orders); the "
    "pre-aggregation keeps the outer join 1:1 so null padding is "
    "per-key, and a full-outer SMJ shuffles both sides exactly once.",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_acctbal")
    )
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "full_outer").select(
        F.coalesce(F.col("c_custkey"), F.col("o_custkey")).alias("custkey"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("n_orders"),
    )


# --------------------------------------------------------------------------
# Scalar functions: strings, math, dates, json
# --------------------------------------------------------------------------
@register(
    "scalar_string_math",
    """
    SELECT p_partkey,
           UPPER(p_brand) AS brand_u,
           LENGTH(p_name) AS name_len,
           SUBSTR(p_type, 1, 5) AS type5,
           ABS(p_size - 25) AS size_dist,
           CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 1.1 AS DOUBLE) AS marked_up,
           p_partkey % 7 AS bucket7
    FROM part
    """,
    "scalar",
    doc="String/math scalar surface (substr, concat, round, power, abs, mod) evaluated inside whole-stage codegen.",
)
def scalar_string_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type5"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        (_dec2("p_retailprice") * F.lit("1.1").cast("decimal(2,1)"))
        .cast("double")
        .alias("marked_up"),
        (F.col("p_partkey") % 7).alias("bucket7"),
    )


@register(
    "scalar_dates",
    """
    SELECT o_orderkey,
           YEAR(o_orderdate) AS order_year,
           MONTH(o_orderdate) AS order_month,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month_start,
           o_orderdate + INTERVAL 7 DAY AS week_later
    FROM orders
    WHERE o_orderkey < 500
    """,
    "scalar",
    doc="Date/time scalar surface (extract, trunc, datediff, add_months) with cross-engine-deterministic integer results.",
)
def scalar_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 500)
        .select(
            "o_orderkey",
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.date_trunc("month", F.col("o_orderdate")).alias("order_month_start"),
            F.expr("o_orderdate + INTERVAL 7 DAY").alias("week_later"),
        )
    )


@register(
    "json_extract_agg",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
           COUNT(*) AS n
    FROM events
    GROUP BY 1
    """,
    "scalar",
    doc="The reference never parses payloads (SURVEY §1.2); we parse on demand.",
)
def json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .select(F.get_json_object("props", "$.k").cast("int").alias("k_val"))
        .groupBy("k_val")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "variant_shred_stats",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_min,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_max,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_sum
    FROM events
    GROUP BY event_type
    """,
    "scalar",
    doc=(
        "Semi-structured shredding through Spark 4's VARIANT type: "
        "props parses ONCE into a binary variant (parse_json) and "
        "typed paths shred out with variant_get — the engine-native "
        "path for JSON-heavy event payloads, unlike get_json_object "
        "which re-parses the string per extraction (json_extract_agg "
        "keeps that classic path for comparison). At scale the parse "
        "is map-side in the scan projection and the aggregate is one "
        "hash shuffle keyed on event_type; typed extraction means the "
        "aggregation runs on BIGINTs, never strings."
    ),
)
def variant_shred_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return (
        t(spark, sf_dir, "events")
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.sum("k").cast("bigint").alias("k_sum"),
        )
    )
