"""Completes the 22 TPC-H query shapes (q8, q9, q11, q16, q17, q21).

The driver schema has no `partsupp` table and lineitem carries no
commit/receipt dates, so q11/q16 use `lineitem` as the part-supplier
bridge and q21 defines "late" as shipping >90 days after the order
date. Shapes (join graphs, subquery forms, aggregation structure)
follow the originals.

Same determinism conventions as operators/relational.py: money math in
DECIMAL(18,2)/(18,4), ROUND on the exact decimal, cast to DOUBLE last;
double division only between values both engines computed identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from barco_spark.operators.relational import _rev2
from barco_spark.registry import register
from barco_spark.tables import t


def _dec2(c: str) -> F.Column:
    return F.col(c).cast("decimal(18,2)")


def _dec4(c: str) -> F.Column:
    return F.col(c).cast("decimal(18,4)")


@register(
    "q8_market_share",
    """
    WITH v AS (
      SELECT YEAR(o_orderdate) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,4))) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN part     ON p_partkey = l_partkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'STANDARD')
    SELECT o_year,
           CAST(ROUND(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume
                               ELSE CAST(0 AS DECIMAL(18,6)) END), 2) AS DOUBLE) AS nation_volume,
           CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS total_volume,
           CAST(ROUND(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume
                               ELSE CAST(0 AS DECIMAL(18,6)) END), 2) AS DOUBLE)
             / CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS mkt_share
    FROM v
    GROUP BY o_year
    """,
    "join",
    doc="TPC-H Q8 shape: NATION_2 suppliers' share of STANDARD-part "
    "revenue sold to ASIA customers, per order year. Eight-table star: "
    "dims broadcast, facts join on their keys. Share = double division "
    "of two exactly-rounded decimals (deterministic both engines).",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    volume = _rev2()
    nation_vol = F.when(
        F.col("supp_nation") == "NATION_2", volume
    ).otherwise(F.lit(0).cast("decimal(18,6)"))
    v = (
        t(spark, sf_dir, "lineitem")
        .join(t(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(t(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(region), F.col("c_rk") == F.col("r_regionkey"))
        .join(
            F.broadcast(t(spark, sf_dir, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
    )
    agg = v.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.round(F.sum(nation_vol), 2).cast("double").alias("nation_volume"),
        F.round(F.sum(volume), 2).cast("double").alias("total_volume"),
    )
    return agg.select(
        "o_year",
        "nation_volume",
        "total_volume",
        (F.col("nation_volume") / F.col("total_volume")).alias("mkt_share"),
    )


@register(
    "q9_product_profit",
    """
    SELECT n_name AS nation,
           YEAR(o_orderdate) AS o_year,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS profit
    FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN part     ON p_partkey = l_partkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, YEAR(o_orderdate)
    """,
    "join",
    doc="TPC-H Q9 shape (no partsupp => profit is discounted revenue): "
    "per supplier-nation, per order year, over parts named '%gear%'. "
    "The part filter semi-reduces lineitem before the orders join.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    return (
        t(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(t(spark, sf_dir, "orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(t(spark, sf_dir, "supplier")),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(
            F.broadcast(t(spark, sf_dir, "nation")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(
            F.round(F.sum(_rev2()), 2)
            .cast("double")
            .alias("profit")
        )
    )


@register(
    "q11_important_parts",
    """
    WITH value_per_part AS (
      SELECT l_partkey AS partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS val
      FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        JOIN region   ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY l_partkey)
    SELECT partkey, CAST(ROUND(val, 2) AS DOUBLE) AS part_value
    FROM value_per_part
    WHERE CAST(val AS DOUBLE) >
          (SELECT CAST(SUM(val) AS DOUBLE) * 0.002 FROM value_per_part)
    """,
    "subquery",
    doc="TPC-H Q11 shape (lineitem as the part-supplier bridge): parts "
    "whose EUROPE-supplied value exceeds 0.2% of the total, via a "
    "scalar-subquery threshold. Threshold compare in DOUBLE of exact "
    "decimal sums so both engines see identical operands.",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    nations = (
        t(spark, sf_dir, "nation")
        .join(
            F.broadcast(t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .select("n_nationkey")
    )
    suppliers = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(nations), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_suppkey")
    )
    value_per_part = (
        t(spark, sf_dir, "lineitem")
        .join(F.broadcast(suppliers), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(_rev2()).alias("val")
        )
    )
    threshold = value_per_part.agg(
        (F.sum("val").cast("double") * F.lit(0.002)).alias("thr")
    )
    return (
        value_per_part.join(F.broadcast(threshold))
        .filter(F.col("val").cast("double") > F.col("thr"))
        .select("partkey", F.round(F.col("val"), 2).cast("double").alias("part_value"))
    )


@register(
    "q16_supplier_part_counts",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20, 25)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
    GROUP BY p_brand, p_type, p_size
    """,
    "subquery",
    doc="TPC-H Q16 shape (lineitem as the bridge; name-pattern supplier "
    "exclusion instead of complaints): distinct supplier count per "
    "(brand, type, size) with a NOT-IN anti join.",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
    )
    excluded = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%7"))
        .select("s_suppkey")
    )
    return (
        t(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(excluded),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    """
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS small_qty_revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (
        SELECT 0.5 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    "subquery",
    doc="TPC-H Q17 shape: revenue of below-half-average-quantity "
    "lineitems for one brand. The correlated per-part average is a "
    "window over l_partkey (one shuffle) after a broadcast semi-join "
    "reduces lineitem to the brand's parts; the mean is an exact "
    "decimal sum over the part's rows divided in DOUBLE.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    brand_parts = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    li = t(spark, sf_dir, "lineitem").join(
        F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey")
    )
    w = Window.partitionBy("l_partkey")
    threshold = F.lit(0.5) * (
        # decimal(4,2): quantity window sum at (14,2) -> long adds (r13)
        F.sum(F.col("l_quantity").cast("decimal(4,2)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        li.withColumn("_thr", threshold)
        .filter(F.col("l_quantity") < F.col("_thr"))
        .agg(
            F.round(F.sum(_dec2("l_extendedprice")), 2)
            .cast("double")
            .alias("small_qty_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q21_waiting_suppliers",
    """
    WITH flagged AS (
      SELECT l_orderkey, l_suppkey,
             l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'),
    per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
      FROM flagged GROUP BY l_orderkey)
    SELECT s_name, COUNT(*) AS numwait
    FROM flagged
      JOIN per_order USING (l_orderkey)
      JOIN supplier ON s_suppkey = l_suppkey
    WHERE late AND n_supp > 1 AND n_late = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 25
    """,
    "subquery",
    doc="TPC-H Q21 shape (late = shipped >90 days after order date; no "
    "receipt/commit dates in this schema): suppliers who were the sole "
    "late supplier on a multi-supplier finished order. The classic "
    "EXISTS/NOT-EXISTS double self-join is re-expressed over ONE "
    "repartition of the flagged rows by l_orderkey: collapse to "
    "(order, supplier) pairs carrying any-late + late-row counts, "
    "derive the per-order supplier counts from the pairs, and join "
    "pairs back to those counts — both branches hang off the same "
    "exchange (ReusedExchange), so the fact table is scanned once and "
    "the double COUNT(DISTINCT) Expand never materializes (r13: min "
    "0.995 vs 1.164 / 1.113 vs 1.357 at sf0.1, 6/8 ABBA positions). "
    "The explicit l_suppkey IS NOT NULL filter exists to make the two "
    "branch subtrees canonically EQUAL (the pairs side infers it from "
    "the supplier join, the counts side does not) — without it AQE "
    "cannot reuse the shuffle stage and lineitem is scanned twice.",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    flagged = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_suppkey").isNotNull())
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)).alias("late"),
        )
    )
    # one exchange on the per-order key (3 narrow columns cross it);
    # the pair rollup, the per-order counts, and the pairs<->counts
    # join all reuse its hashpartitioning(l_orderkey) output.
    # COUNT(DISTINCT l_suppkey)        == count of non-null pair rows;
    # COUNT(DISTINCT late ? suppkey)   == pairs with any late row;
    # final COUNT(*) over late rows    == sum of per-pair late counts.
    pairs = (
        flagged.repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max("late").alias("supp_late"),
            F.sum(F.when(F.col("late"), 1).otherwise(0)).alias("n_late_rows"),
        )
    )
    per_order = pairs.groupBy("l_orderkey").agg(
        F.count("l_suppkey").alias("n_supp"),
        F.count(F.when(F.col("supp_late"), F.col("l_suppkey"))).alias("n_late"),
    )
    return (
        pairs.filter(F.col("supp_late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(
            F.broadcast(t(spark, sf_dir, "supplier")),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.sum("n_late_rows").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(25)
    )


@register(
    "join_null_safe",
    """
    WITH c AS (
      SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg, c_acctbal
      FROM customer),
    d AS (
      SELECT DISTINCT NULLIF(c_mktsegment, 'BUILDING') AS seg FROM customer)
    SELECT d.seg, COUNT(c.c_custkey) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM d JOIN c ON d.seg IS NOT DISTINCT FROM c.seg
    GROUP BY d.seg
    """,
    "join",
    doc=(
        "Null-safe equi-join (<=> / IS NOT DISTINCT FROM): the NULL "
        "segment key must match NULL on the dim side instead of being "
        "dropped like a plain equi-join would. Spark plans <=> as a "
        "HashJoin with null-safe keys (still broadcast-able, no "
        "fallback to nested-loop). Money sum in DECIMAL for "
        "cross-engine determinism."
    ),
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
        "c_acctbal",
    )
    dim = cust.select("seg").distinct()
    return (
        dim.alias("d")
        .join(cust.alias("c"), F.col("d.seg").eqNullSafe(F.col("c.seg")))
        .groupBy(F.col("d.seg").alias("seg"))
        .agg(
            F.count("c.c_custkey").alias("n_customers"),
            F.sum(F.col("c.c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_bal"),
        )
    )


@register(
    "scd1_upsert_shape",
    """
    WITH updates AS (
      SELECT o_orderkey, o_custkey, 'F' AS o_orderstatus,
             o_totalprice, 1 AS version
      FROM orders WHERE o_orderkey % 10 = 0),
    unioned AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 0 AS version
      FROM orders
      UNION ALL
      SELECT * FROM updates),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                                   ORDER BY version DESC) AS rk
      FROM unioned)
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM ranked WHERE rk = 1
    GROUP BY o_orderstatus
    """,
    "join",
    doc=(
        "SCD-1 upsert (latest-wins MERGE) without a table format: union "
        "base + updates, one ranking window on the key, keep rank 1 — "
        "the standard Spark upsert shape when Delta/Iceberg MERGE isn't "
        "available. One shuffle on the merge key; at 100 TB the same "
        "plan works partition-wise when the base is bucketed on the key "
        "(sources/warehouse.py). Updates here are synthesized from the "
        "base table (every 10th order flipped to status F) so the "
        "query is self-contained."
    ),
)
def scd1_upsert_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.lit(0).alias("version"),
    )
    updates = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            F.lit("F").alias("o_orderstatus"),
            "o_totalprice",
            F.lit(1).alias("version"),
        )
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.col("version").desc())
    merged = (
        base.unionByName(updates)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
    )


@register(
    "cohort_retention_weekly",
    """
    WITH firsts AS (
      SELECT user_id,
             MIN(CAST(date_trunc('week', ts) AS DATE)) AS cohort_week
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS act_week
      FROM events)
    SELECT cohort_week,
           CAST(datediff('day', cohort_week, act_week) // 7 AS BIGINT)
             AS weeks_since,
           COUNT(*) AS n_users
    FROM activity JOIN firsts USING (user_id)
    GROUP BY cohort_week, weeks_since
    """,
    "aggregation",
    doc=(
        "Cohort retention matrix: users bucketed by first-seen week, "
        "counted in each subsequent activity week — the standard "
        "product-analytics retention triangle. Two aggregations share "
        "one shuffle on user_id (first-seen min and distinct activity "
        "weeks), then a join on user_id that AQE keeps co-partitioned "
        "with that shuffle; the final rollup's cardinality is "
        "weeks x weeks, tiny at any scale. All-integer week math "
        "(datediff // 7) — no doubles anywhere."
    ),
)
def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    )
    firsts = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    activity = ev.distinct().withColumnRenamed("wk", "act_week")
    return (
        activity.join(firsts, "user_id")
        .select(
            "cohort_week",
            (F.datediff(F.col("act_week"), F.col("cohort_week")) / 7)
            .cast("bigint")
            .alias("weeks_since"),
        )
        .groupBy("cohort_week", "weeks_since")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "scd2_history_build",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(event_type) OVER w IS NULL
                    OR event_type <> LAG(event_type) OVER w
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    versioned AS (
      SELECT user_id, ts, event_type,
             CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version_id
      FROM flagged),
    intervals AS (
      SELECT user_id, version_id,
             MIN(event_type) AS attr,
             MIN(ts) AS valid_from,
             COUNT(*) AS n_events
      FROM versioned GROUP BY user_id, version_id),
    closed AS (
      SELECT *,
             LEAD(valid_from) OVER (PARTITION BY user_id
                                    ORDER BY version_id) AS valid_to
      FROM intervals)
    SELECT attr AS event_type,
           COUNT(*) AS n_versions,
           CAST(SUM(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_current,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(COALESCE(SUM(date_diff('microsecond', valid_from, valid_to)), 0)
                AS BIGINT) AS closed_duration_us
    FROM closed GROUP BY attr
    """,
    "window",
    doc=(
        "SCD type-2 history build: collapse each user's event_type "
        "stream into validity intervals [valid_from, valid_to) — change "
        "detection via lag, version numbering via running sum, interval "
        "close via lead on the collapsed versions — then summarize per "
        "attribute value. The standard dimension-history shape when a "
        "table format's MERGE isn't available. All three windows share "
        "the user_id partitioning, so the plan shuffles the events once "
        "and the lead runs on the (much smaller) collapsed intervals. "
        "Durations are exact microsecond integers (no double folds)."
    ),
)
def scd2_history_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev = t(spark, sf_dir, "events")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("event_type").over(order).isNull()
            | (F.col("event_type") != F.lag("event_type").over(order)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("chg"),
    )
    versioned = flagged.select(
        "user_id",
        "ts",
        "event_type",
        F.sum("chg").over(run).cast("bigint").alias("version_id"),
    )
    intervals = versioned.groupBy("user_id", "version_id").agg(
        F.min("event_type").alias("attr"),
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    vorder = Window.partitionBy("user_id").orderBy("version_id")
    closed = intervals.withColumn(
        "valid_to", F.lead("valid_from").over(vorder)
    )
    return closed.groupBy(F.col("attr").alias("event_type")).agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.sum(F.when(F.col("valid_to").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_current"),
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.coalesce(
            F.sum(
                F.unix_micros(F.col("valid_to")) - F.unix_micros(F.col("valid_from"))
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("closed_duration_us"),
    )


@register(
    "value_percentiles_per_type",
    """
    SELECT event_type,
           COUNT(*) AS n,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.9) AS p90,
           quantile_cont(value, 0.99) AS p99
    FROM events GROUP BY event_type
    """,
    "aggregation",
    doc=(
        "Exact interpolated per-group percentiles (the latency-SLO "
        "P50/P90/P99 shape). Sort-based, not sum-based, so doubles are "
        "deterministic: both engines interpolate the same two order "
        "statistics. At 100 TB swap percentile() for approx_percentile "
        "(t-digest) — same query shape, bounded memory."
    ),
)
def value_percentiles_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("percentile(value, array(0.5, 0.9, 0.99))").alias("ps"),
        )
        .select(
            "event_type",
            "n",
            F.col("ps")[0].alias("p50"),
            F.col("ps")[1].alias("p90"),
            F.col("ps")[2].alias("p99"),
        )
    )


@register(
    "interpolate_missing_daily",
    """
    WITH bounds AS (
      SELECT CAST(DATE_TRUNC('day', MIN(ts)) AS TIMESTAMP) AS lo,
             CAST(DATE_TRUNC('day', MAX(ts)) AS TIMESTAMP) AS hi
      FROM events
    ),
    spine AS (
      SELECT t.event_type, CAST(u.day AS TIMESTAMP) AS day
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (
        SELECT unnest(generate_series((SELECT lo FROM bounds),
                                      (SELECT hi FROM bounds),
                                      INTERVAL 1 DAY)) AS day) u
    ),
    daily AS (
      SELECT event_type,
             CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS v
      FROM events GROUP BY 1, 2
    ),
    joined AS (
      SELECT s.event_type, s.day, d.v FROM spine s
      LEFT JOIN daily d ON s.event_type = d.event_type AND s.day = d.day
    ),
    ctx AS (
      SELECT event_type, day, v,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
             first_value(v IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM joined
    )
    SELECT event_type, day,
           v IS NULL AS was_missing,
           CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NULL THEN nv
             WHEN nv IS NULL THEN pv
             ELSE pv + (nv - pv) * (CAST(datediff('day', pd, day) AS DOUBLE)
                                    / datediff('day', pd, nd))
           END AS v_filled
    FROM ctx
    """,
    "window",
    doc=(
        "Time-series linear interpolation: a per-type calendar spine is "
        "left-joined to daily decimal-exact averages, then gaps are "
        "filled by interpolating between the last and next observed "
        "points (edges extend the nearest observation). Doubles stay "
        "deterministic: one division per daily average, and the "
        "interpolation combines the same two row values on both "
        "engines. The spine is (types x days) — tiny and broadcast at "
        "any corpus scale; the windows partition by type."
    ),
)
def interpolate_missing_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    )
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(
                bounds.select(
                    F.explode(
                        F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
                    ).alias("day")
                )
            )
        )
    )
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("v")
    )
    joined = spine.join(daily, ["event_type", "day"], "left")
    back = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    ctx = joined.select(
        "event_type",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(back).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(back).alias("pd"),
        F.first("v", ignorenulls=True).over(fwd).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(fwd).alias("nd"),
    )
    frac = F.datediff(F.col("day"), F.col("pd")).cast("double") / F.datediff(
        F.col("nd"), F.col("pd")
    )
    return ctx.select(
        "event_type",
        "day",
        F.col("v").isNull().alias("was_missing"),
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
        .alias("v_filled"),
    )


APPROX_PCT_ACCURACY = 10_000  # rank error <= n / accuracy (Spark contract)


@register(
    "approx_quantile_profile",
    None,  # approx_percentile's picks are engine-specific: no SQL oracle.
    # Pairing was ATTEMPTED and rejected in r8 rather than assumed: in
    # the exact regime (n <= accuracy, single partition) Spark's pick
    # is provably the order statistic ceil(p*n) — a DuckDB list_sort
    # twin matches bit-for-bit at sf0.01 — but the distributed merge of
    # per-partition Greenwald-Khanna summaries compresses regardless of
    # accuracy (verified: accuracy=32768 > n=20k still drifts at
    # sf0.1), so any SQL oracle is partition-layout-dependent and would
    # be flaky exactly where the operator earns its keep. Property gate
    # instead: tests/test_properties.py bounds the rank error of every
    # estimate against the exact order statistics at three scales.
    "aggregation",
    doc=(
        "The 100 TB percentile path value_percentiles_per_type points "
        "at: per-group approx_percentile (Greenwald-Khanna summaries, "
        "t-digest-class bounded memory, mergeable across partitions) "
        "for P50/P90/P99. Estimates are real data elements with rank "
        "error <= n/accuracy; the property test pins that bound "
        "against the exact percentiles at three scales."
    ),
)
def approx_quantile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                "approx_percentile(value, array(0.5, 0.9, 0.99), "
                f"{APPROX_PCT_ACCURACY})"
            ).alias("ps"),
        )
        .select(
            "event_type",
            "n",
            F.col("ps")[0].alias("p50"),
            F.col("ps")[1].alias("p90"),
            F.col("ps")[2].alias("p99"),
        )
    )


_NIN_SQL = """
    SELECT
      (SELECT COUNT(*) FROM {c}
       WHERE c_nationkey NOT IN (
         SELECT n_nationkey FROM {n} WHERE n_regionkey <= 1))
        AS n_clean_not_in,
      (SELECT COUNT(*) FROM {c}
       WHERE c_nationkey NOT IN (
         SELECT CASE WHEN n_nationkey % 7 = 3 THEN NULL ELSE n_nationkey END
         FROM {n} WHERE n_regionkey <= 1))
        AS n_null_poisoned_not_in
"""


@register(
    "subquery_not_in_nulls",
    _NIN_SQL.format(c="customer", n="nation"),
    "subquery",
    doc=(
        "Three-valued-logic NOT IN, both faces in one row: against a "
        "null-free list NOT IN behaves like an anti join (first "
        "count, nonzero); once the list contains a single NULL, every "
        "candidate compares UNKNOWN and the second count MUST be 0 — "
        "the classic NOT-IN-vs-anti-join trap. Spark plans the "
        "poisoned branch as a null-aware anti join; a plain LeftAnti "
        "would report the first count twice. Oracle-paired so both "
        "engines' 3VL agrees exactly."
    ),
)
def subquery_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "customer").createOrReplaceTempView("_nin_customer")
    t(spark, sf_dir, "nation").createOrReplaceTempView("_nin_nation")
    return spark.sql(_NIN_SQL.format(c="_nin_customer", n="_nin_nation"))


@register(
    "division_all_parts_suppliers",
    """
    WITH target AS (
      SELECT p_partkey FROM part WHERE p_size = 1
    ),
    sp AS (
      SELECT DISTINCT l_suppkey AS s_suppkey, l_partkey AS p_partkey
      FROM lineitem
    ),
    cover AS (
      SELECT s_suppkey, COUNT(DISTINCT p_partkey) AS n_cov
      FROM sp JOIN target USING (p_partkey)
      GROUP BY s_suppkey
    )
    SELECT s_suppkey, n_cov
    FROM cover
    WHERE n_cov = (SELECT COUNT(*) FROM target)
    ORDER BY s_suppkey
    """,
    "subquery",
    doc=(
        "Relational division (suppliers covering EVERY size-1 part): "
        "the double-NOT-EXISTS classic, planned the scalable way — "
        "count distinct covered targets per supplier and compare to "
        "the target cardinality (one scalar). One hash aggregation on "
        "supplier instead of nested correlated anti joins; the target "
        "set is a broadcast dimension."
    ),
)
def division_all_parts_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    target = (
        t(spark, sf_dir, "part").filter(F.col("p_size") == 1).select("p_partkey")
    )
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"),
        F.col("l_partkey").alias("p_partkey"),
    ).distinct()
    n_target = target.count()  # scalar: target-set cardinality
    cover = (
        li.join(F.broadcast(target), "p_partkey")
        .groupBy("s_suppkey")
        .agg(F.count_distinct("p_partkey").alias("n_cov"))
    )
    return (
        cover.filter(F.col("n_cov") == n_target)
        .select("s_suppkey", "n_cov")
        .orderBy("s_suppkey")
    )


@register(
    "rolling_anomaly_daily",
    """
    WITH daily AS (
      SELECT event_type, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT event_type, day, n,
             SUM(n)     OVER win AS s,
             SUM(n * n) OVER win AS sq,
             COUNT(*)   OVER win AS k
      FROM daily
      WINDOW win AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, day, n, k AS window_days,
           CASE WHEN k > 0 THEN CAST(s AS DOUBLE) / k END AS mean_prior,
           CASE WHEN k > 1 AND (CAST(sq AS DOUBLE) / k
                  - (CAST(s AS DOUBLE) / k) * (CAST(s AS DOUBLE) / k)) > 0
                THEN (n - CAST(s AS DOUBLE) / k)
                     / SQRT(CAST(sq AS DOUBLE) / k
                            - (CAST(s AS DOUBLE) / k) * (CAST(s AS DOUBLE) / k))
           END AS zscore
    FROM w
    ORDER BY event_type, day
    """,
    "window",
    doc=(
        "Rolling time-series anomaly detection: each day's event count "
        "z-scored against the PRIOR week's rolling mean/std per type. "
        "Variance is derived manually from integer SUM and SUM(n*n) "
        "window frames with one fixed expression order — NOT the "
        "engine's stddev aggregate, whose Welford fold is "
        "accumulation-order-dependent and diverges across engines; "
        "this shape is IEEE-deterministic (each divide/multiply/sqrt "
        "correctly rounded on identical inputs). One shuffle on "
        "event_type shared by all three frames."
    ),
)
def rolling_anomaly_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    win = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, -1)
    )
    w = daily.select(
        "event_type",
        "day",
        "n",
        F.sum("n").over(win).alias("s"),
        F.sum(F.col("n") * F.col("n")).over(win).alias("sq"),
        F.count(F.lit(1)).over(win).alias("k"),
    )
    mean = F.col("s").cast("double") / F.col("k")
    var = F.col("sq").cast("double") / F.col("k") - mean * mean
    return w.select(
        "event_type",
        "day",
        "n",
        F.col("k").alias("window_days"),
        F.when(F.col("k") > 0, mean).alias("mean_prior"),
        F.when((F.col("k") > 1) & (var > 0), (F.col("n") - mean) / F.sqrt(var))
        .alias("zscore"),
    ).orderBy("event_type", "day")


@register(
    "key_skew_report",
    """
    WITH c AS (
      SELECT o_custkey AS key, COUNT(*) AS n
      FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT SUM(n) AS total, COUNT(*) AS n_keys FROM c),
    top AS (
      SELECT key, n, ROW_NUMBER() OVER (ORDER BY n DESC, key) AS rk
      FROM c
    )
    SELECT top.key, top.n, top.rk,
           CAST(top.n AS DOUBLE) / tot.total AS share,
           CAST(tot.total AS BIGINT) AS total_rows,
           CAST(tot.n_keys AS BIGINT) AS n_keys,
           CAST(tot.total AS DOUBLE) / tot.n_keys AS mean_per_key
    FROM top CROSS JOIN tot
    WHERE top.rk <= 20
    ORDER BY top.rk
    """,
    "aggregation",
    doc=(
        "Join-key skew diagnostic — the measurement that justifies "
        "salting (functions/skew.py) or AQE skew-join before a big "
        "join: top-20 heaviest keys with their share of total rows "
        "and the corpus mean per key. One hash aggregation; the "
        "totals are a broadcast single-row table; top-k is "
        "rank-limited (WindowGroupLimit pushes the cutoff), never a "
        "full sort. At 100 TB this runs as a cheap pre-flight on the "
        "join column and its output is human-sized."
    ),
)
def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = c.agg(
        F.sum("n").cast("bigint").alias("total_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
    )
    w = Window.orderBy(F.col("n").desc(), "key")
    top = c.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 20)
    return (
        top.crossJoin(F.broadcast(tot))
        .select(
            "key",
            "n",
            "rk",
            (F.col("n").cast("double") / F.col("total_rows")).alias("share"),
            "total_rows",
            "n_keys",
            (F.col("total_rows").cast("double") / F.col("n_keys")).alias(
                "mean_per_key"
            ),
        )
        .orderBy("rk")
    )


@register(
    "data_freshness_report",
    """
    WITH g AS (SELECT MAX(ts) AS global_max FROM events),
    per AS (
      SELECT event_type,
             COUNT(*) AS n_events,
             MIN(ts) AS first_ts,
             MAX(ts) AS last_ts
      FROM events GROUP BY event_type
    )
    SELECT per.event_type, per.n_events, per.first_ts, per.last_ts,
           CAST(epoch_us(g.global_max) - epoch_us(per.last_ts) AS BIGINT)
             AS staleness_us,
           epoch_us(g.global_max) - epoch_us(per.last_ts)
             <= 86400000000 AS fresh_24h
    FROM per CROSS JOIN g
    ORDER BY per.event_type
    """,
    "aggregation",
    doc=(
        "Per-stream freshness/staleness report — the monitoring query "
        "every ingest pipeline runs: last event time per type vs the "
        "global high-water mark, integer-microsecond staleness, and a "
        "24h freshness flag. One aggregation; the global max is a "
        "broadcast single-row table. Exact timestamp math only."
    ),
)
def data_freshness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    g = ev.agg(F.max("ts").alias("global_max"))
    per = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )
    stale = F.unix_micros(F.col("global_max")) - F.unix_micros(F.col("last_ts"))
    return (
        per.crossJoin(F.broadcast(g))
        .select(
            "event_type",
            "n_events",
            "first_ts",
            "last_ts",
            stale.cast("bigint").alias("staleness_us"),
            (stale <= 86_400_000_000).alias("fresh_24h"),
        )
        .orderBy("event_type")
    )


@register(
    "funnel_conversion_rates",
    """
    WITH e3 AS (
      SELECT user_id, event_type, ts FROM events
      WHERE event_type IN ('view', 'click', 'purchase')),
    s1 AS (
      SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts END)
                  OVER (PARTITION BY user_id) AS t_view
      FROM e3),
    s2 AS (
      SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t_view THEN ts END)
                  OVER (PARTITION BY user_id) AS t_click
      FROM s1),
    s3 AS (
      SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t_click THEN ts END)
                  OVER (PARTITION BY user_id) AS t_purchase
      FROM s2),
    u AS (
      SELECT user_id, MAX(t_view) AS t_view, MAX(t_click) AS t_click,
             MAX(t_purchase) AS t_purchase
      FROM s3 GROUP BY user_id)
    SELECT COUNT(*) AS n_users,
           CAST(COUNT(t_view) AS BIGINT) AS n_viewed,
           CAST(COUNT(t_click) AS BIGINT) AS n_clicked,
           CAST(COUNT(t_purchase) AS BIGINT) AS n_purchased,
           CAST(COUNT(t_click) AS DOUBLE) / COUNT(t_view) AS view_to_click,
           CAST(COUNT(t_purchase) AS DOUBLE) / COUNT(t_click)
             AS click_to_purchase
    FROM u
    """,
    "window",
    doc=(
        "Funnel conversion rates — the business rollup of "
        "events_funnel's per-user stage machine: users reaching each "
        "ordered stage (view -> click after view -> purchase after "
        "click) and the stage-to-stage conversion ratios. Shares "
        "events_funnel's cascaded conditional-min windows (one "
        "user_id shuffle, one scan); the final rollup is a "
        "single-row aggregate of integer counts."
    ),
)
def funnel_conversion_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_user = Window.partitionBy("user_id")
    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "event_type", "ts")
    )
    s1 = ev.withColumn(
        "t_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(per_user),
    )
    s2 = s1.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
                F.col("ts"),
            )
        ).over(per_user),
    )
    s3 = s2.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t_click")),
                F.col("ts"),
            )
        ).over(per_user),
    )
    u = s3.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    return u.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").cast("bigint").alias("n_viewed"),
        F.count("t_click").cast("bigint").alias("n_clicked"),
        F.count("t_purchase").cast("bigint").alias("n_purchased"),
        (F.count("t_click").cast("double") / F.count("t_view")).alias(
            "view_to_click"
        ),
        (F.count("t_purchase").cast("double") / F.count("t_click")).alias(
            "click_to_purchase"
        ),
    )


@register(
    "numeric_profile_lineitem",
    """
    WITH m AS (
      SELECT 'l_quantity' AS measure,
             CAST(l_quantity AS DECIMAL(18,2)) AS v FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', CAST(l_extendedprice AS DECIMAL(18,2))
      FROM lineitem
      UNION ALL
      SELECT 'l_discount', CAST(l_discount AS DECIMAL(18,2)) FROM lineitem
      UNION ALL
      SELECT 'l_tax', CAST(l_tax AS DECIMAL(18,2)) FROM lineitem
    )
    SELECT measure,
           COUNT(*) AS n,
           CAST(COUNT(*) - COUNT(v) AS BIGINT) AS n_null,
           CAST(MIN(v) AS DOUBLE) AS min_v,
           CAST(MAX(v) AS DOUBLE) AS max_v,
           CAST(ROUND(SUM(v), 2) AS DOUBLE) / COUNT(v) AS mean_v
    FROM m GROUP BY measure
    ORDER BY measure
    """,
    "aggregation",
    doc=(
        "Numeric data-profiling over the wide fact table: per-measure "
        "count/nulls/min/max/mean in one pass. The Spark side unpivots "
        "with df.unpivot (ONE pruned scan + Expand, not 4 unioned "
        "scans — lineitem_unpivot_stats' plan shape); means are exact "
        "DECIMAL sums divided once. The profiling primitive every "
        "ingest QA step runs before accepting a drop."
    ),
)
def numeric_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    m = (
        t(spark, sf_dir, "lineitem")
        .select([F.col(c).cast("decimal(18,2)").alias(c) for c in cols])
        .unpivot([], cols, "measure", "v")
    )
    return (
        m.groupBy("measure")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.count(F.lit(1)) - F.count("v")).cast("bigint").alias("n_null"),
            F.min("v").cast("double").alias("min_v"),
            F.max("v").cast("double").alias("max_v"),
            (F.round(F.sum("v"), 2).cast("double") / F.count("v")).alias(
                "mean_v"
            ),
        )
        .orderBy("measure")
    )


@register(
    "revenue_pareto_deciles",
    """
    WITH rev AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS r
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT o_custkey, r, NTILE(10) OVER (ORDER BY r DESC, o_custkey) AS decile
      FROM rev
    ),
    tot AS (SELECT SUM(r) AS total FROM rev)
    SELECT decile,
           COUNT(*) AS n_customers,
           CAST(SUM(r) AS DOUBLE) AS revenue,
           CAST(SUM(r) AS DOUBLE) / CAST(tot.total AS DOUBLE) AS share
    FROM ranked CROSS JOIN tot
    GROUP BY decile, tot.total
    ORDER BY decile
    """,
    "window",
    doc=(
        "Pareto/concentration analysis: customers ranked by exact-"
        "decimal revenue, NTILE(10) deciles (ties broken by custkey so "
        "the bucketing is engine-deterministic), revenue share per "
        "decile against a broadcast scalar total. The '20% of keys "
        "carry 80% of load' readout that guides partitioning and "
        "salting decisions at scale."
    ),
)
def revenue_pareto_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("r"))
    )
    ranked = rev.withColumn(
        "decile", F.ntile(10).over(Window.orderBy(F.col("r").desc(), "o_custkey"))
    )
    tot = rev.agg(F.sum("r").alias("total"))
    return (
        ranked.crossJoin(F.broadcast(tot))
        .groupBy("decile", "total")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("r").cast("double").alias("revenue"),
            (
                F.sum("r").cast("double") / F.col("total").cast("double")
            ).alias("share"),
        )
        .drop("total")
        .orderBy("decile")
    )


@register(
    "order_backlog_aging",
    """
    WITH mx AS (SELECT MAX(o_orderdate) AS asof FROM orders),
    open_orders AS (
      SELECT o_orderkey, o_orderdate, o_totalprice, mx.asof,
             date_diff('day', o_orderdate, mx.asof) AS age_days
      FROM orders CROSS JOIN mx
      WHERE o_orderstatus <> 'F'
    )
    SELECT CASE WHEN age_days < 365 THEN '0-1y'
                WHEN age_days < 730 THEN '1-2y'
                WHEN age_days < 1460 THEN '2-4y'
                ELSE '4y+' END AS age_bucket,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS open_value
    FROM open_orders
    GROUP BY 1
    ORDER BY age_bucket
    """,
    "aggregation",
    doc=(
        "Backlog aging report: non-finalized orders bucketed by age "
        "against the dataset's own as-of date (broadcast one-row max), "
        "with exact-decimal open value per bucket. All-integer date "
        "math; the classic operational aging readout."
    ),
)
def order_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderdate").alias("asof"))
    aged = (
        o.filter(F.col("o_orderstatus") != "F")
        .crossJoin(F.broadcast(mx))
        .withColumn("age_days", F.datediff(F.col("asof"), F.col("o_orderdate")))
    )
    bucket = (
        F.when(F.col("age_days") < 365, "0-1y")
        .when(F.col("age_days") < 730, "1-2y")
        .when(F.col("age_days") < 1460, "2-4y")
        .otherwise("4y+")
    )
    return (
        aged.groupBy(bucket.alias("age_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("open_value"),
        )
        .orderBy("age_bucket")
    )


@register(
    "events_hourly_heatmap",
    """
    SELECT CAST(EXTRACT(isodow FROM ts) AS BIGINT) AS weekday,
           CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY weekday, hour
    """,
    "aggregation",
    doc=(
        "Activity heatmap: ISO-weekday x hour-of-day event counts and "
        "exact-decimal value totals — the usage-seasonality profile "
        "behind capacity planning and trigger-interval tuning. One "
        "hash aggregation over <=168 groups, map-side combined."
    ),
)
def events_hourly_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.expr("extract(dayofweek_iso from ts)").cast("bigint").alias(
                "weekday"
            ),
            F.hour("ts").cast("bigint").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("weekday", "hour")
    )


@register(
    "events_value_outliers_mad",
    """
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, ABS(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT e.event_type,
           COUNT(*) AS n,
           CAST(ANY_VALUE(m.med) AS DOUBLE) AS median_v,
           CAST(ANY_VALUE(d.mad) AS DOUBLE) AS mad_v,
           CAST(SUM(CASE WHEN ABS(e.value - m.med) > 3 * d.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e
    JOIN med m USING (event_type)
    JOIN mad d USING (event_type)
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
    "aggregation",
    doc=(
        "Robust outlier detection via median absolute deviation: "
        "per-type exact median, median of absolute deviations, and "
        "the |x - med| > 3*MAD outlier count — the heavy-tail-safe "
        "alternative to z-scores (rolling_anomaly_daily). Exact "
        "interpolated medians are sort-based (engine-deterministic, "
        "value_percentiles_per_type's contract); the per-type "
        "median/MAD tables are group-cardinality-sized broadcasts. "
        "Two passes over events sharing one event_type shuffle key."
    ),
)
def events_value_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    joined = ev.join(F.broadcast(med), "event_type").join(
        F.broadcast(mad), "event_type"
    )
    out = F.when(
        F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad"), 1
    ).otherwise(0)
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.any_value("med").cast("double").alias("median_v"),
            F.any_value("mad").cast("double").alias("mad_v"),
            F.sum(out).cast("bigint").alias("n_outliers"),
        )
        .orderBy("event_type")
    )


@register(
    "orders_interarrival_stats",
    """
    WITH seq AS (
      SELECT o_custkey, o_orderdate,
             LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey)
               AS prev_date
      FROM orders
    ),
    gaps AS (
      SELECT o_custkey,
             date_diff('day', prev_date, o_orderdate) AS gap_days
      FROM seq WHERE prev_date IS NOT NULL
    )
    SELECT o_custkey,
           COUNT(*) AS n_gaps,
           CAST(MIN(gap_days) AS BIGINT) AS min_gap,
           CAST(MAX(gap_days) AS BIGINT) AS max_gap,
           CAST(SUM(gap_days) AS DOUBLE) / COUNT(*) AS mean_gap
    FROM gaps
    GROUP BY o_custkey
    HAVING COUNT(*) >= 5
    ORDER BY o_custkey
    """,
    "window",
    doc=(
        "Inter-arrival analysis: per-customer gaps between consecutive "
        "orders (lag over one custkey shuffle), all-integer day math, "
        "min/max/mean gap for active customers — the purchase-cadence "
        "signal behind churn and replenishment models. The window and "
        "the final aggregation share the o_custkey partitioning."
    ),
)
def orders_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        F.lag("o_orderdate").over(w).alias("prev_date"),
    )
    gaps = seq.filter(F.col("prev_date").isNotNull()).select(
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.col("prev_date")).alias("gap_days"),
    )
    return (
        gaps.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.min("gap_days").cast("bigint").alias("min_gap"),
            F.max("gap_days").cast("bigint").alias("max_gap"),
            (F.sum("gap_days").cast("double") / F.count(F.lit(1))).alias(
                "mean_gap"
            ),
        )
        .filter(F.col("n_gaps") >= 5)
        .orderBy("o_custkey")
    )


@register(
    "event_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    tr AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    ),
    tot AS (SELECT prev_type, SUM(n) AS row_total FROM tr GROUP BY prev_type)
    SELECT tr.prev_type, tr.next_type, tr.n,
           CAST(tr.n AS DOUBLE) / tot.row_total AS p
    FROM tr JOIN tot USING (prev_type)
    ORDER BY tr.prev_type, tr.next_type
    """,
    "window",
    doc=(
        "First-order Markov transition matrix over per-user event "
        "sequences: lag pairs -> transition counts -> row-normalized "
        "probabilities (one integer division each). The next-event "
        "model behind session simulation and anomaly scoring. One "
        "user_id window shuffle; the transition table is "
        "event-type-squared-sized and its row totals broadcast back."
    ),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    tr = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = tr.groupBy("prev_type").agg(F.sum("n").alias("row_total"))
    return (
        tr.join(F.broadcast(tot), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            (F.col("n").cast("double") / F.col("row_total")).alias("p"),
        )
        .orderBy("prev_type", "next_type")
    )


@register(
    "supplier_otif_rate",
    """
    SELECT l_suppkey AS s_suppkey,
           COUNT(*) AS n_lines,
           CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_on_time,
           CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
             AS on_time_rate
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_suppkey
    HAVING COUNT(*) >= 20
    ORDER BY s_suppkey
    """,
    "aggregation",
    doc=(
        "Supplier on-time ship rate (shipped within 30 days of order "
        "date; the testdata lineitem carries no receipt/commit dates) "
        "for suppliers with enough volume to judge — the SLA "
        "scorecard. One orderkey join + one hash aggregation of "
        "integer flags, map-side combined; HAVING keeps the output "
        "supplier-sized."
    ),
)
def supplier_otif_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    joined = li.join(o, li.l_orderkey == o.o_orderkey)
    on_time = F.when(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) <= 30, 1
    ).otherwise(0)
    return (
        joined
        .groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(on_time).cast("bigint").alias("n_on_time"),
            (F.sum(on_time).cast("double") / F.count(F.lit(1))).alias(
                "on_time_rate"
            ),
        )
        .filter(F.col("n_lines") >= 20)
        .orderBy("s_suppkey")
    )


@register(
    "discount_band_effect",
    """
    SELECT CAST(ROUND(CAST(l_discount AS DECIMAL(18,2)) * 100, 0) AS BIGINT)
             AS discount_pct,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
             AS avg_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
                AS DOUBLE) AS net_revenue
    FROM lineitem
    GROUP BY 1
    ORDER BY discount_pct
    """,
    "aggregation",
    doc=(
        "Discount-band effectiveness: quantity and net revenue per "
        "integer discount percent — the pricing-elasticity readout. "
        "Exact-decimal products summed before the one ROUND+cast "
        "(the registry's money-math convention); <=11 groups, "
        "map-side combined."
    ),
)
def discount_band_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    band = (
        F.round(F.col("l_discount").cast("decimal(18,2)") * 100, 0)
        .cast("bigint")
        .alias("discount_pct")
    )
    net = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
    )
    return (
        li.groupBy(band)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_qty"),
            F.round(net, 2).cast("double").alias("net_revenue"),
        )
        .orderBy("discount_pct")
    )


# market_basket_lift: persist the distinct (order, part) list only when
# the fact table is big enough that its four scan pipelines are real
# I/O (r12 A/B: persist loses at sf0.1 where the scans schedule
# concurrently on idle cores).  Row threshold ~= a few GB of lineitem;
# overridable for cluster profiles (same env pattern as the bench).
import os as _os

_MB_PERSIST_MIN_ROWS = int(
    _os.environ.get("BARCO_MB_PERSIST_MIN_ROWS", 50_000_000)
)


@register(
    "market_basket_lift",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    n AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM items),
    marg AS (SELECT pk, COUNT(*) AS n_p FROM items GROUP BY pk),
    pairs AS (
      SELECT a.pk AS part_a, b.pk AS part_b, COUNT(*) AS n_ab
      FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY a.pk, b.pk)
    SELECT p.part_a, p.part_b,
           CAST(p.n_ab AS BIGINT) AS n_ab,
           CAST(ma.n_p AS BIGINT) AS n_a,
           CAST(mb.n_p AS BIGINT) AS n_b,
           CAST(p.n_ab * n.n_orders AS DOUBLE) / (ma.n_p * mb.n_p) AS lift
    FROM pairs p
    JOIN marg ma ON ma.pk = p.part_a
    JOIN marg mb ON mb.pk = p.part_b
    CROSS JOIN n
    WHERE p.n_ab >= 2
    ORDER BY lift DESC, part_a, part_b
    LIMIT 15
    """,
    "aggregation",
    doc=(
        "Market-basket affinity: top part pairs by lift "
        "(P(a,b)/(P(a)P(b))) across orders — the co-purchase signal "
        "behind recommendations and assortment analysis. The pair "
        "generator self-joins the DISTINCT (order, part) items on the "
        "order key, so fan-out is bounded by basket size squared (13 "
        "parts max here, and real baskets are small by nature — this "
        "is the bounded-key self-join, NOT a corpus cross join); "
        "marginals and the one-row order count broadcast back. Lift is "
        "one double division of exact integer products, so the ranking "
        "is bit-exact cross-engine. Global top-15 is a "
        "TakeOrderedAndProject, never a full sort. Audit note (r7): "
        "the distinct item list feeds four consumers (count, "
        "marginals, both self-join sides) in ONE action plan, and "
        "Catalyst's ReuseExchange serves all four from a single "
        "materialization — an explicit persist was A/B-measured "
        "neutral-to-worse at sf0.1 and rejected; the agg-join trap "
        "only bites when differing projections defeat exchange reuse."
    ),
)
def market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = (
        t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    # r13 (closing the r12 "Not yet optimized" debt, guide §5): the
    # distinct item list feeds four consumers.  At bench scale the
    # four scan pipelines schedule CONCURRENTLY on idle cores and an
    # explicit persist measured WORSE (r12, twice: 5.41 vs 3.90 and
    # the session-6 marg-reuse wash) — but at warehouse scale four
    # full fact-table scans are real I/O and materializing the
    # distinct once wins.  Footer-count guard (metadata-cheap, the
    # dsir/dedup_clusters adaptive pattern): persist only above
    # MB_PERSIST_MIN_ROWS; inert at the driver's bench/correctness
    # SFs so the measured-fastest small shape is unchanged.
    from barco_spark.tables import scan_rows

    if scan_rows(spark, sf_dir, "lineitem") >= _MB_PERSIST_MIN_ROWS:
        from barco_spark.session import eager_persist

        items = eager_persist(items)
    n = items.select("ok").distinct().agg(F.count(F.lit(1)).alias("n_orders"))
    marg = items.groupBy("pk").agg(F.count(F.lit(1)).alias("n_p"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .groupBy(F.col("a.pk").alias("part_a"), F.col("b.pk").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 2)
    )
    ma = marg.select(F.col("pk").alias("part_a"), F.col("n_p").alias("n_a"))
    mb = marg.select(F.col("pk").alias("part_b"), F.col("n_p").alias("n_b"))
    return (
        pairs.join(F.broadcast(ma), "part_a")
        .join(F.broadcast(mb), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            (
                (F.col("n_ab") * F.col("n_orders")).cast("double")
                / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "part_a", "part_b")
        .limit(15)
    )


@register(
    "join_lateral_topk",
    """
    SELECT n.n_name, c.c_name, CAST(c.c_acctbal AS DOUBLE) AS acctbal
    FROM nation n,
    LATERAL (SELECT c_name, c_acctbal FROM customer
             WHERE c_nationkey = n.n_nationkey
             ORDER BY c_acctbal DESC, c_name LIMIT 2) c
    ORDER BY n_name, acctbal DESC, c_name
    """,
    "join",
    doc=(
        "LATERAL correlated subquery: top-2 customers by balance PER "
        "nation, expressed as the SQL-standard lateral join both "
        "engines support. Catalyst decorrelates it into the windowed "
        "rank plan (DomainJoin rewrite -> rank <= k per key), so "
        "despite the correlated-loop surface syntax the execution is "
        "the same single-shuffle WindowGroupLimit as "
        "window_topk_per_group — the demonstration that correlated "
        "per-group-limit SQL does NOT cost a per-outer-row re-scan at "
        "100 TB. Scale-2 decimal ordering is exact in both engines."
    ),
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "nation").createOrReplaceTempView("_lat_nation")
    t(spark, sf_dir, "customer").createOrReplaceTempView("_lat_customer")
    return spark.sql(
        """
        SELECT n.n_name, c.c_name, CAST(c.c_acctbal AS DOUBLE) AS acctbal
        FROM _lat_nation n,
        LATERAL (SELECT c_name, c_acctbal FROM _lat_customer
                 WHERE c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_name LIMIT 2) c
        ORDER BY n_name, acctbal DESC, c_name
        """
    )


@register(
    "agg_grouping_id",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT)
             AS grouping_id,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ORDER BY grouping_id, l_returnflag, l_linestatus
    """,
    "aggregation",
    doc=(
        "ROLLUP with the GROUPING bitmask: grouping_id distinguishes "
        "'this column is aggregated away at this level' from a natural "
        "NULL in the data — the only reliable way to consume rollup/"
        "cube output programmatically (filtering on IS NULL breaks the "
        "moment real NULLs appear). Spark's grouping_id() and DuckDB's "
        "GROUPING(a, b) produce the same bit vector (MSB = first "
        "column), verified exactly. Same Expand + two-phase aggregate "
        "plan as agg_rollup."
    ),
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("bigint").alias("grouping_id"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
        .orderBy("grouping_id", "l_returnflag", "l_linestatus")
    )


@register(
    "agg_bitwise",
    """
    SELECT event_type,
           CAST(bit_xor(event_id) AS BIGINT) AS xor_ids,
           CAST(bit_or(CAST(user_id % 64 AS BIGINT)) AS BIGINT) AS user_mask,
           CAST(bit_and(CAST(event_id % 16 + 16 AS BIGINT)) AS BIGINT)
             AS and_low
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    "aggregation",
    doc=(
        "Bitwise aggregates: per type, XOR of all event ids (the "
        "order-free set checksum used for exactly-once reconciliation "
        "— XOR of a replayed set cancels to the original), an OR-mask "
        "of user residues (compact membership summary, the same "
        "primitive the distributed Bloom build uses), and an AND over "
        "a biased low nibble. All three are commutative/associative "
        "integer folds — exact in any order and map-side combinable, "
        "the cheapest aggregates a 100 TB scan can carry."
    ),
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.bit_xor("event_id").cast("bigint").alias("xor_ids"),
            F.bit_or((F.col("user_id") % 64).cast("bigint"))
            .cast("bigint")
            .alias("user_mask"),
            F.bit_and((F.col("event_id") % 16 + 16).cast("bigint"))
            .cast("bigint")
            .alias("and_low"),
        )
        .orderBy("event_type")
    )
