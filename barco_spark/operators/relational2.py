"""Extended relational coverage: more TPC-H-shaped queries, subqueries,
pivot, array aggregation, approximate distinct.

Same determinism conventions as operators/relational.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from barco_spark.operators.relational import _m2, _r4, _rev2
from barco_spark.registry import register
from barco_spark.tables import t


def _dec2(c: str) -> F.Column:
    return F.col(c).cast("decimal(18,2)")


def _dec4(c: str) -> F.Column:
    return F.col(c).cast("decimal(18,4)")


@register(
    "q6_forecast_revenue",
    """
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    "aggregation",
    doc="TPC-H Q6 shape: pure filter+agg, fully pushed to the scan.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(_m2("l_extendedprice") * _r4("l_discount")), 2)
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    "join",
    doc="TPC-H Q10 shape: returned-item revenue per customer, top 20.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum(_rev2()), 2)
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q12_priority_case_agg",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
    "aggregation",
    doc="TPC-H Q12 shape: CASE-conditional counts inside the aggregate.",
)
def q12_priority_case_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t(spark, sf_dir, "orders")
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_count"),
        )
    )


@register(
    "q14_promo_share",
    """
    SELECT CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,4)))
                     ELSE CAST(0 AS DECIMAL(18,6)) END), 2) AS DOUBLE) AS promo_revenue,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS total_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
    "join",
    doc="TPC-H Q14 shape: promo revenue share; part dim broadcast.",
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    disc = _rev2()
    return (
        li.join(F.broadcast(t(spark, sf_dir, "part")), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("p_type") == "PROMO", disc).otherwise(
                        F.lit(0).cast("decimal(18,6)")
                    )
                ),
                2,
            )
            .cast("double")
            .alias("promo_revenue"),
            F.round(F.sum(disc), 2).cast("double").alias("total_revenue"),
        )
    )


@register(
    "q18_large_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderkey, o_custkey, o_totalprice
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 50
    """,
    "aggregation",
    doc="TPC-H Q18 shape: HAVING over a join aggregate, top 50.",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .join(t(spark, sf_dir, "lineitem"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_custkey", "o_totalprice")
        # decimal(4,2): l_quantity <= 50 by domain -> the sum plans at
        # (14,2), the sum(UnscaledValue(..)) long-add path (r13; same
        # mechanism A/B-proven on agg_rollup/join_range_interval)
        .agg(F.sum(F.col("l_quantity").cast("decimal(4,2)")).alias("_qty"))
        .filter(F.col("_qty") > 150)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.col("_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(50)
    )


@register(
    "q19_disjunctive_predicates",
    """
    SELECT COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 40)
    """,
    "join",
    doc="TPC-H Q19 shape: OR-of-ANDs join predicates.",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    q = F.col("l_quantity")
    size = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & size.between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & size.between(1, 25) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & size.between(1, 35) & q.between(20, 40))
    )
    return joined.filter(cond).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(_rev2()), 2)
        .cast("double")
        .alias("revenue"),
    )


@register(
    "subquery_scalar_avg",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) * 2
      FROM orders)
    """,
    "subquery",
    doc="Scalar subquery (exact-decimal mean so the threshold is engine-equal).",
)
def subquery_scalar_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "orders").createOrReplaceTempView("_sq_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM _sq_orders
        WHERE o_totalprice > (
          SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) * 2
          FROM _sq_orders)
        """
    )


@register(
    "subquery_correlated_exists",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_suppkey = s_suppkey AND l_quantity > 49)
    """,
    "subquery",
    doc="Correlated EXISTS, decorrelated by Catalyst into a semi join.",
)
def subquery_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "supplier").createOrReplaceTempView("_sq_supplier")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("_sq_lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM _sq_supplier
        WHERE EXISTS (
          SELECT 1 FROM _sq_lineitem
          WHERE l_suppkey = s_suppkey AND l_quantity > 49)
        """
    )


@register(
    "array_agg_per_nation",
    """
    SELECT c_nationkey AS nationkey,
           COUNT(*) AS n_customers,
           array_to_string(list(DISTINCT c_mktsegment ORDER BY c_mktsegment), ',') AS segments
    FROM customer
    GROUP BY c_nationkey
    """,
    "aggregation",
    doc="Array aggregation: sorted distinct collect per group, joined to "
    "a CSV string so the result is hashable by the driver's pandas-based "
    "canonicalizer (raw list cells are unhashable there).",
)
def array_agg_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ",").alias(
                "segments"
            ),
        )
    )


@register(
    "events_pivot",
    """
    SELECT user_id,
           COUNT(*) FILTER (event_type = 'click') AS click,
           COUNT(*) FILTER (event_type = 'view') AS view,
           COUNT(*) FILTER (event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (event_type = 'signup') AS signup,
           COUNT(*) FILTER (event_type = 'error') AS error
    FROM events
    GROUP BY user_id
    """,
    "aggregation",
    doc="Pivot: per-user event-type counts (explicit value list => no "
    "extra pass to discover pivot values).",
)
def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
        .na.fill(0)
    )


@register(
    "approx_count_distinct",
    None,  # HLL sketches are engine-specific; rows-only check
    "aggregation",
    doc="approx_count_distinct (HyperLogLog++); exactness is checked "
    "against count_distinct in tests/test_relational_extra.py.",
)
def approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.count_distinct(F.col("user_id")).alias("exact_users"),
        )
    )


def _events_exact_tokens_oracle() -> str:
    # Cassandra Murmur3 re-derived in pure DuckDB SQL (HUGEINT wrapping
    # arithmetic, one CTE per hash step) — valid for ASCII keys <= 15
    # bytes, which the integer-string user_id keys are at every SF.
    # See murmur3_tail_oracle_ctes for the construction; fuzzed against
    # the Python twin in tests/test_tokens.py.
    from barco_spark.functions.tokens import murmur3_tail_oracle_ctes

    ctes = murmur3_tail_oracle_ctes(keys_cte="keys", key_col="partition_key")
    return f"""
    WITH keys AS (
      SELECT DISTINCT CAST(user_id AS VARCHAR) AS partition_key FROM events
    ),
    {ctes}
    SELECT partition_key, token, bucket FROM mm_out
    """


@register(
    "events_exact_tokens",
    _events_exact_tokens_oracle(),
    "broker",
    doc="P1/P2 exact path: partition keys routed with the bit-exact "
    "Cassandra murmur3 ring via an Arrow-batched pandas UDF "
    "(vectors verified in tests/test_tokens.py). ORACLE-PAIRED since "
    "round 7: the oracle re-derives the full Murmur3 x64_128 h1 tail "
    "path + GetPrimaryTokenIndex ring lookup in pure DuckDB SQL "
    "(HUGEINT 64-bit wrapping arithmetic, 32-bit-split multiplies), "
    "so the driver hash-compares token AND bucket bit-for-bit.",
)
def events_exact_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from barco_spark.functions.tokens import bucket_for_key_udf, murmur3_token_udf

    ev = t(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("partition_key")
    )
    return ev.select(
        "partition_key",
        murmur3_token_udf()(F.col("partition_key")).alias("token"),
        bucket_for_key_udf()(F.col("partition_key")).alias("bucket"),
    ).distinct()


@register(
    "scalar_string_extra",
    """
    SELECT p_partkey,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS vowelless,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           trim(concat('  ', p_brand, '  ')) AS brand_trim,
           replace(p_type, 'PROMO', 'SALE') AS type_repl,
           split_part(p_brand, '#', 2) AS brand_num,
           reverse(p_brand) AS brand_rev,
           contains(p_name, 'a') AS has_a
    FROM part
    WHERE p_partkey < 100
    """,
    "scalar",
    doc="String function battery: regexp_replace/lpad/trim/replace/split_part/reverse/contains.",
)
def scalar_string_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    return p.select(
        "p_partkey",
        F.regexp_replace("p_name", "[aeiou]", "_").alias("vowelless"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias(
            "brand_trim"
        ),
        F.replace(F.col("p_type"), F.lit("PROMO"), F.lit("SALE")).alias("type_repl"),
        F.split_part(F.col("p_brand"), F.lit("#"), F.lit(2)).alias("brand_num"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.contains(F.col("p_name"), F.lit("a")).alias("has_a"),
    )


@register(
    "null_handling",
    """
    SELECT c_custkey,
           CAST(COALESCE(SUM(CASE WHEN o_orderkey IS NOT NULL THEN 1 END), 0) AS BIGINT) AS n_orders,
           COALESCE(CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), -1.0) AS max_price,
           NULLIF(COUNT(o_orderkey), 0) AS n_or_null
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey AND o_totalprice > 250000
    GROUP BY c_custkey
    """,
    "scalar",
    doc="NULL semantics through outer joins: COALESCE / NULLIF / conditional COUNT.",
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    joined = t(spark, sf_dir, "customer").join(
        orders,
        (F.col("o_custkey") == F.col("c_custkey")) & (F.col("o_totalprice") > 250000),
        "left",
    )
    return joined.groupBy("c_custkey").agg(
        F.coalesce(
            F.sum(F.when(F.col("o_orderkey").isNotNull(), 1)), F.lit(0)
        ).alias("n_orders"),
        F.coalesce(
            F.max(_dec2("o_totalprice")).cast("double"), F.lit(-1.0)
        ).alias("max_price"),
        F.nullif(F.count("o_orderkey"), F.lit(0)).alias("n_or_null"),
    )


@register(
    "q7_volume_by_year",
    """
    SELECT n_name AS supp_nation,
           YEAR(l_shipdate) AS ship_year,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS volume
    FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name, YEAR(l_shipdate)
    """,
    "join",
    doc="TPC-H Q7 shape: supplier-nation volume by ship year.",
)
def q7_volume_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        li.join(
            F.broadcast(t(spark, sf_dir, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(
            F.round(F.sum(_rev2()), 2)
            .cast("double")
            .alias("volume")
        )
    )


@register(
    "q2_min_cost_supplier",
    """
    SELECT p_partkey, l_suppkey, l_extendedprice
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_size > 40
      AND l_extendedprice = (
        SELECT MIN(l2.l_extendedprice) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey)
    """,
    "subquery",
    doc="TPC-H Q2 shape (no partsupp table in this schema): correlated "
    "MIN subquery picking the cheapest lineitem per part.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "part").createOrReplaceTempView("_q2_part")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("_q2_lineitem")
    return spark.sql(
        """
        SELECT p_partkey, l_suppkey, l_extendedprice
        FROM _q2_part JOIN _q2_lineitem ON p_partkey = l_partkey
        WHERE p_size > 40
          AND l_extendedprice = (
            SELECT MIN(l2.l_extendedprice) FROM _q2_lineitem l2
            WHERE l2.l_partkey = p_partkey)
        """
    )


@register(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    "subquery",
    doc="TPC-H Q15 shape: CTE revenue view + scalar-max subquery.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "supplier").createOrReplaceTempView("_q15_supplier")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("_q15_lineitem")
    return spark.sql(
        """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                                * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS total_revenue
          FROM _q15_lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1997-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM _q15_supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        """
    )


@register(
    "q20_promo_shippers",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
      GROUP BY l_suppkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 100)
    """,
    "subquery",
    doc="TPC-H Q20 shape: nested IN subqueries with HAVING.",
)
def q20_promo_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "supplier").createOrReplaceTempView("_q20_supplier")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("_q20_lineitem")
    t(spark, sf_dir, "part").createOrReplaceTempView("_q20_part")
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM _q20_supplier
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM _q20_lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM _q20_part WHERE p_type = 'PROMO')
          GROUP BY l_suppkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 100)
        """
    )


@register(
    "q22_idle_rich_customers",
    """
    SELECT c_nationkey AS nationkey,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_totalprice > 100000)
    GROUP BY c_nationkey
    """,
    "subquery",
    doc="TPC-H Q22 shape: above-average balance + anti-join on big orders.",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "customer").createOrReplaceTempView("_q22_customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("_q22_orders")
    return spark.sql(
        """
        SELECT c_nationkey AS nationkey,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        FROM _q22_customer
        WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
            FROM _q22_customer WHERE c_acctbal > 0)
          AND NOT EXISTS (
            SELECT 1 FROM _q22_orders
            WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        GROUP BY c_nationkey
        """
    )


@register(
    "map_functions",
    """
    SELECT user_id,
           COUNT(*) FILTER (event_type = 'click') AS clicks,
           COUNT(*) FILTER (event_type = 'purchase') AS purchases,
           COUNT(DISTINCT event_type) AS n_types
    FROM events
    GROUP BY user_id
    """,
    "scalar",
    doc=(
        "Map-typed columns: per-user counts are built as a "
        "map<event_type, count> (map_from_entries over collected "
        "structs), then extracted with element_at and map_keys — the "
        "oracle states the same result relationally."
    ),
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = (
        t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("user_id")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("event_type", "c")))
            ).alias("type_counts")
        )
    )
    return counts.select(
        "user_id",
        F.coalesce(F.element_at(F.col("type_counts"), F.lit("click")), F.lit(0)).alias(
            "clicks"
        ),
        F.coalesce(
            F.element_at(F.col("type_counts"), F.lit("purchase")), F.lit(0)
        ).alias("purchases"),
        F.size(F.map_keys(F.col("type_counts"))).alias("n_types"),
    )


@register(
    "calendar_gap_fill",
    """
    WITH days AS (
      SELECT CAST(unnest(generate_series(TIMESTAMP '1997-01-01',
                                         TIMESTAMP '1997-03-31',
                                         INTERVAL 1 DAY)) AS TIMESTAMP) AS day),
    daily AS (
      SELECT CAST(DATE_TRUNC('day', o_orderdate) AS TIMESTAMP) AS day,
             COUNT(*) AS n
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1997-04-01'
      GROUP BY 1)
    SELECT d.day, COALESCE(daily.n, 0) AS n_orders
    FROM days d LEFT JOIN daily USING (day)
    """,
    "scalar",
    doc=(
        "Time-series gap filling: a generated calendar spine "
        "(F.sequence + explode) left-joined to daily counts, zero-"
        "filled. At scale the spine is tiny and broadcast."
    ),
)
def calendar_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1997-01-01").cast("timestamp"),
                F.lit("1997-03-31").cast("timestamp"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    daily = (
        t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        F.broadcast(days)
        .join(daily, "day", "left")
        .select("day", F.coalesce(F.col("n"), F.lit(0)).alias("n_orders"))
    )


@register(
    "interval_open_orders_daily",
    """
    WITH days AS (
      SELECT CAST(unnest(generate_series(TIMESTAMP '1997-01-01',
                                         TIMESTAMP '1997-03-31',
                                         INTERVAL 1 DAY)) AS DATE) AS day)
    SELECT d.day,
           CAST((SELECT COUNT(*) FROM orders o
                  WHERE CAST(o.o_orderdate AS DATE) <= d.day
                    AND d.day < CAST(o.o_orderdate AS DATE) + 31)
                AS BIGINT) AS open_orders
    FROM days d ORDER BY day
    """,
    "aggregation",
    doc=(
        "Sweep-line interval coverage: how many orders are OPEN (within "
        "31 days of placement) on each day of 1997 Q1. The naive form "
        "is an interval join — every (day, order) pair tested against "
        "containment, O(days x orders), and with no equi key Spark "
        "would plan it as a nested-loop join. The sweep replaces it "
        "with +count at each start day, -count at each end day, one "
        "tiny cumulative sum over the ~thousands of distinct change "
        "days — O(orders) scan work and a bounded window, the standard "
        "way interval coverage scales to 100 TB. The DuckDB oracle IS "
        "the naive containment count, so parity proves the sweep "
        "equals the quadratic semantics, not merely itself."
    ),
)
def interval_open_orders_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = t(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("od")
    )
    starts = od.groupBy(F.col("od").alias("day")).agg(
        F.count(F.lit(1)).alias("delta")
    )
    ends = (
        od.select(F.date_add("od", 31).alias("day"))
        .groupBy("day")
        .agg((-F.count(F.lit(1))).alias("delta"))
    )
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1997-01-01").cast("date"),
                F.lit("1997-03-31").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
        F.lit(0).cast("long").alias("delta"),
    )
    deltas = (
        starts.unionByName(ends)
        .unionByName(spine)
        .groupBy("day")
        .agg(F.sum("delta").alias("delta"))
    )
    # single-partition window over the distinct CHANGE DAYS (calendar-
    # bounded, ~2.5k rows for 7 years of data) — not the fact table
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = deltas.withColumn("open_orders", F.sum("delta").over(w))
    return (
        cum.where(
            (F.col("day") >= F.lit("1997-01-01").cast("date"))
            & (F.col("day") <= F.lit("1997-03-31").cast("date"))
        )
        .select("day", F.col("open_orders").cast("bigint").alias("open_orders"))
        .orderBy("day")
    )


@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    "subquery",
    doc="TPC-H Q4 shape: EXISTS with a correlated column comparison.",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "orders").createOrReplaceTempView("_q4_orders")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("_q4_lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM _q4_orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-04-01'
          AND EXISTS (
            SELECT 1 FROM _q4_lineitem
            WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        """
    )


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) c_orders
    GROUP BY c_count
    """,
    "aggregation",
    doc="TPC-H Q13 shape: two-level aggregation (distribution of per-"
    "customer order counts) over a filtered outer join.",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_cust = (
        t(spark, sf_dir, "customer")
        .join(
            t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "hll_sketch_cardinality",
    None,  # Apache DataSketches HLL: no DuckDB twin (different sketch
    # family); accuracy vs exact count_distinct is asserted in
    # tests/test_relational_extra.py
    "aggregation",
    doc=(
        "Mergeable cardinality sketches (Apache DataSketches HLL, "
        "Spark 3.5+): per-event-type user sketches plus their UNION "
        "re-aggregated to a global estimate. THE pattern for distinct "
        "counts at 100 TB — per-partition/day sketch tables are tiny, "
        "mergeable after the fact (exact count_distinct is not), and "
        "one map-side pass each. Deterministic for a fixed input "
        "multiset (sketch updates commute)."
    ),
)
def hll_sketch_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from barco_spark.session import eager_persist

    # eager: one sketch pass feeds both branches of the union (a
    # handful of rows; without the persist the union re-scans events,
    # and without the materialization the two cache references can
    # each recompute the scan — see eager_persist)
    per = eager_persist(
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    per_type = per.select(
        "event_type",
        F.hll_sketch_estimate("sk").alias("distinct_users_est"),
    )
    overall = per.agg(
        F.lit("ALL").alias("event_type"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("distinct_users_est"),
    )
    return per_type.unionByName(overall)


KMV_K = 256  # k-minimum-values sketch size (rel. err ~ 1/sqrt(K-2) ~ 6%)
_KMV_SPACE = 4503599627370496.0  # 2^52: 13-hex-char md5 slice, exact in double


@register(
    "kmv_distinct_sketch",
    f"""
    WITH hashed AS (
      SELECT DISTINCT event_type,
             (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))::BIGINT) AS h
      FROM events),
    ranked AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM hashed),
    per_type AS (
      SELECT event_type, COUNT(*) AS n_kept, MAX(h) AS h_k
      FROM ranked WHERE rn <= {KMV_K} GROUP BY event_type),
    all_k AS (
      SELECT COUNT(*) AS n_kept, MAX(h) AS h_k FROM (
        SELECT DISTINCT h FROM hashed ORDER BY h LIMIT {KMV_K})),
    unioned AS (
      SELECT event_type, n_kept, h_k FROM per_type
      UNION ALL
      SELECT 'ALL' AS event_type, n_kept, h_k FROM all_k)
    SELECT event_type,
           CASE WHEN n_kept < {KMV_K} THEN CAST(n_kept AS DOUBLE)
                -- explicit DOUBLE casts: DuckDB types dotted literals
                -- as DECIMAL and overflows the multiplication
                ELSE (CAST({KMV_K - 1} AS DOUBLE) * CAST({int(_KMV_SPACE)} AS DOUBLE))
                     / CAST(h_k AS DOUBLE)
           END AS distinct_users_est
    FROM unioned
    """,
    "aggregation",
    doc=(
        "KMV (k-minimum-values) cardinality sketch — the ORACLE-PAIRED "
        "counterpart to hll_sketch_cardinality: per-event-type distinct-"
        "user estimates plus the merged 'ALL' row, where merging k-min "
        "sets is just re-taking the k smallest of their union (the "
        "Bar-Yossef et al. mergeable-sketch property HLL shares). "
        f"Estimator: (k-1)/max-normalized k-th smallest of a {KMV_K}-min "
        "set over a 52-bit md5 slice — every intermediate is an exact "
        "integer and the single IEEE multiply+divide is reproduced "
        "bit-for-bit by DuckDB, so unlike HLL (engine-specific sketch "
        "family, rows-only) even the estimation ERROR hash-matches. "
        "Scale shape: one distinct shuffle + one width-k-bounded window "
        "per type; sketch state is k longs per group — mergeable across "
        "partitions/days like the 100 TB rollup pattern requires."
    ),
)
def kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = KMV_K
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 13), 16, 10
    ).cast("bigint")
    # k smallest DISTINCT hashes per type, WITHOUT a full-corpus
    # distinct first: dense_rank counts distinct values, so filtering
    # dense_rank <= K before dedup selects exactly the same set as
    # distinct-then-row_number — and Spark's InferWindowGroupLimit
    # inserts a Partial WindowGroupLimit ahead of the exchange, so each
    # map task ships only its own K smallest per type (~tasks*types*K
    # rows) instead of every distinct (type, hash) pair. This is the
    # difference between a bounded-state sketch build and a full
    # distinct shuffle at 100 TB (measured: the r10 distinct-first plan
    # went 21.9x for the 10M->100M decade; this plan is ~linear —
    # SCALING.md round-11).
    hashed = t(spark, sf_dir, "events").select("event_type", h.alias("h"))
    w = Window.partitionBy("event_type").orderBy("h")
    kmin = (
        hashed.withColumn("dr", F.dense_rank().over(w))
        .filter(F.col("dr") <= k)
        .select("event_type", "h")
        .distinct()  # dedupe WITHIN the k-min sets (<= types*K values)
    )
    from barco_spark.session import eager_persist

    kmin = eager_persist(kmin)  # two consumers (per-type + ALL)
    per_type = kmin.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("h_k")
    )
    # merged sketch: k smallest of the union of per-type k-min sets ==
    # k smallest of all distinct hashes; operates on the tiny persisted
    # sketch table, plans as TakeOrderedAndProject
    all_k = (
        kmin.select("h")
        .distinct()
        .orderBy("h")
        .limit(k)
        .agg(F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("h_k"))
        .select(F.lit("ALL").alias("event_type"), "n_kept", "h_k")
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(_KMV_SPACE) / F.col("h_k").cast("double")
    )
    return per_type.unionByName(all_k).select(
        "event_type", est.alias("distinct_users_est")
    )


CMS_D = 4  # count-min-sketch hash rows
CMS_W = 256  # buckets per row
CMS_CAND = 20  # candidate heavy keys to point-query

# kmv_set_overlap pair-expansion guard: the pair list is quadratic in
# the number of group keys, which is fine at the warehouse's 6 event
# types but NOT at a 100 TB corpus keyed by, say, source domain
# (thousands of values: 1000 types -> 499_500 pairs x K rows). Cap the
# pair stage at the top KMV_MAX_TYPES types by estimated cardinality
# (exact-integer ordering: sketch fill n DESC, theta ASC — smaller kth
# minimum = larger set — then type name), so the expansion is bounded
# at C(64,2)=2016 pairs regardless of key cardinality. The oracle SQL
# applies the identical cap, so the pairing stays bit-exact on both
# sides of the cap threshold.
KMV_MAX_TYPES = 64


@register(
    "kmv_set_overlap",
    f"""
    WITH hashed AS (
      SELECT DISTINCT event_type,
             (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))::BIGINT) AS h
      FROM events),
    kmin AS (
      SELECT event_type, h FROM (
        SELECT event_type, h,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM hashed) WHERE rn <= {KMV_K}),
    ty AS (
      SELECT event_type FROM (
        SELECT event_type, COUNT(*) AS n, MAX(h) AS theta
        FROM kmin GROUP BY event_type
        ORDER BY n DESC, theta ASC, event_type ASC
        LIMIT {KMV_MAX_TYPES})),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM ty a JOIN ty b ON a.event_type < b.event_type),
    u_rows AS (
      SELECT p.type_a, p.type_b, k.h,
             MAX(CASE WHEN k.event_type = p.type_a THEN 1 ELSE 0 END) AS in_a,
             MAX(CASE WHEN k.event_type = p.type_b THEN 1 ELSE 0 END) AS in_b
      FROM pairs p JOIN kmin k
        ON k.event_type = p.type_a OR k.event_type = p.type_b
      GROUP BY p.type_a, p.type_b, k.h),
    u_ranked AS (
      SELECT type_a, type_b, h, in_a, in_b,
             ROW_NUMBER() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn
      FROM u_rows),
    agg AS (
      SELECT type_a, type_b,
             COUNT(*) AS n_u, MAX(h) AS theta,
             CAST(SUM(in_a * in_b) AS BIGINT) AS common
      FROM u_ranked WHERE rn <= {KMV_K}
      GROUP BY type_a, type_b),
    est AS (
      SELECT type_a, type_b, common,
             CASE WHEN n_u < {KMV_K} THEN CAST(n_u AS DOUBLE)
                  ELSE (CAST({KMV_K - 1} AS DOUBLE)
                        * CAST({int(_KMV_SPACE)} AS DOUBLE))
                       / CAST(theta AS DOUBLE) END AS union_est,
             CAST(common AS DOUBLE) / CAST(n_u AS DOUBLE) AS jaccard_est
      FROM agg)
    SELECT type_a, type_b, common, union_est, jaccard_est,
           jaccard_est * union_est AS inter_est
    FROM est
    """,
    "aggregation",
    doc=(
        "KMV set operations (theta-sketch style): distinct-user UNION, "
        "JACCARD, and INTERSECTION estimates for every unordered "
        "event-type pair, computed ONLY from the per-type k-min sets — "
        "the corpus is touched once to build the sketches; all 15 pair "
        "combinations run in sketch space (<= types*K rows). The pair "
        "list is quadratic in key cardinality, so it is capped at the "
        f"top {KMV_MAX_TYPES} types by estimated cardinality "
        "(KMV_MAX_TYPES, exact-integer ordering mirrored in the "
        "oracle): at a corpus keyed by thousands of domains the "
        "expansion stays <= C(64,2) pairs instead of growing "
        "unboundedly. This bounded shape is "
        "the entire point at 100 TB: audience-overlap questions answered "
        "from KBs of mergeable state instead of pairwise exact "
        "count_distincts. Estimators (Beyer et al. 2007): k smallest of "
        "the merged k-min sets give theta and union_est = "
        "(k-1)*space/theta; jaccard_est = |rows below theta present in "
        "BOTH sketches| divided by min(k, merged distinct count) (n_u — "
        "when the merged sets hold fewer than K values the estimator "
        "degrades to the exact Jaccard over everything seen). Every "
        "count is an exact integer; the two "
        "IEEE divisions and one multiply reproduce bit-for-bit in "
        "DuckDB, so the driver hash check covers even the estimation "
        "error. Oracle-paired sibling of kmv_distinct_sketch."
    ),
)
def kmv_set_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = KMV_K
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 13), 16, 10
    ).cast("bigint")
    # same bounded k-min build as kmv_distinct_sketch: dense_rank <= K
    # (Partial WindowGroupLimit prunes map-side, ~tasks*types*K rows
    # shuffled) then a tiny distinct — identical result to
    # distinct-then-row_number without the full-corpus distinct
    # exchange
    hashed = t(spark, sf_dir, "events").select("event_type", h.alias("h"))
    w = Window.partitionBy("event_type").orderBy("h")
    kmin = (
        hashed.withColumn("dr", F.dense_rank().over(w))
        .filter(F.col("dr") <= k)
        .select("event_type", "h")
        .distinct()
    )
    from barco_spark.session import eager_persist

    # sketch state: <= types*K rows, feeds pair list + both sides of
    # the pair expansion — materialized before the multi-reference plan
    kmin = eager_persist(kmin)
    # Pair-expansion guard (KMV_MAX_TYPES comment above): keep only the
    # top types by estimated cardinality before the quadratic pair
    # stage. Exact-integer ordering (n DESC, theta ASC, name ASC) so
    # the oracle reproduces the selection bit-for-bit; the groupBy runs
    # on the sketch table (<= types*K rows) and TakeOrderedAndProject
    # bounds the driver-side result at KMV_MAX_TYPES rows.
    ty = (
        kmin.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("theta"))
        .orderBy(
            F.col("n").desc(), F.col("theta").asc(), F.col("event_type").asc()
        )
        .limit(KMV_MAX_TYPES)
        .select("event_type")
    )
    pairs = (
        ty.alias("a")
        .join(
            ty.alias("b"),
            F.col("a.event_type") < F.col("b.event_type"),
        )
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
    )
    # pair x sketch expansion stays in sketch space; the sketch side is
    # tiny by construction so broadcast is always correct here
    u_rows = (
        pairs.join(
            F.broadcast(kmin),
            (F.col("event_type") == F.col("type_a"))
            | (F.col("event_type") == F.col("type_b")),
        )
        .groupBy("type_a", "type_b", "h")
        .agg(
            F.max(
                F.when(F.col("event_type") == F.col("type_a"), 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("event_type") == F.col("type_b"), 1).otherwise(0)
            ).alias("in_b"),
        )
    )
    wp = Window.partitionBy("type_a", "type_b").orderBy("h")
    agg = (
        u_rows.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= k)
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).alias("n_u"),
            F.max("h").alias("theta"),
            F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("common"),
        )
    )
    union_est = F.when(
        F.col("n_u") < k, F.col("n_u").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(_KMV_SPACE) / F.col("theta").cast("double")
    )
    jaccard_est = F.col("common").cast("double") / F.col("n_u").cast("double")
    return agg.select(
        "type_a",
        "type_b",
        "common",
        union_est.alias("union_est"),
        jaccard_est.alias("jaccard_est"),
        (jaccard_est * union_est).alias("inter_est"),
    )


@register(
    "cms_heavy_hitters",
    f"""
    WITH cms AS (
      SELECT d,
             (('0x' || substr(md5(d || ':' || CAST(user_id AS VARCHAR)), 1, 7))::BIGINT)
               % {CMS_W} AS bucket,
             COUNT(*) AS n
      FROM events, unnest(range(0, {CMS_D})) AS u(d)
      GROUP BY 1, 2
    ),
    cand AS (
      SELECT user_id, COUNT(*) AS exact_count
      FROM events WHERE user_id < {CMS_CAND} GROUP BY user_id
    ),
    probes AS (
      SELECT c.user_id, c.exact_count, u.d,
             (('0x' || substr(md5(u.d || ':' || CAST(c.user_id AS VARCHAR)), 1, 7))::BIGINT)
               % {CMS_W} AS bucket
      FROM cand c, unnest(range(0, {CMS_D})) AS u(d)
    )
    SELECT p.user_id,
           MIN(cms.n) AS est_count,
           p.exact_count,
           MIN(cms.n) - p.exact_count AS overestimate
    FROM probes p JOIN cms ON p.d = cms.d AND p.bucket = cms.bucket
    GROUP BY p.user_id, p.exact_count
    """,
    "aggregation",
    doc=(
        "Count-min sketch built with pure DataFrame ops and the "
        "portable md5-prefix hash, so (unlike the HLL/approx entries) "
        "the sketch itself is integer-exact and fully ORACLE-PAIRED: "
        f"{CMS_D} hash rows x {CMS_W} buckets of integer counts "
        "(bounded state, partial-agg before the shuffle, mergeable by "
        "addition — the 100 TB streaming heavy-hitter pattern), then "
        "point queries for candidate keys as min-over-rows via an "
        "equi-join on (row, bucket). CMS guarantee est >= exact is "
        "asserted in tests/test_relational_extra.py."
    ),
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    def bucket(d_col, key_col):
        h = F.conv(
            F.substring(
                F.md5(F.concat(d_col.cast("string"), F.lit(":"), key_col.cast("string"))),
                1,
                7,
            ),
            16,
            10,
        ).cast("bigint")
        return (h % CMS_W).alias("bucket")

    ev = t(spark, sf_dir, "events")
    rows = F.array(
        *[
            F.struct(F.lit(d).alias("d"), bucket(F.lit(d), F.col("user_id")))
            for d in range(CMS_D)
        ]
    )
    cms = (
        ev.select(F.explode(rows).alias("r"))
        .select("r.d", "r.bucket")
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cand = (
        ev.filter(F.col("user_id") < CMS_CAND)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    probes = cand.select(
        "user_id",
        "exact_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), bucket(F.lit(d), F.col("user_id"))
                    )
                    for d in range(CMS_D)
                ]
            )
        ).alias("r"),
    ).select("user_id", "exact_count", "r.d", "r.bucket")
    return (
        probes.join(F.broadcast(cms), ["d", "bucket"])
        .groupBy("user_id", "exact_count")
        .agg(F.min("n").alias("est_count"))
        .select(
            "user_id",
            "est_count",
            "exact_count",
            (F.col("est_count") - F.col("exact_count")).alias("overestimate"),
        )
    )
