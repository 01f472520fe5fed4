"""Window functions, sessionization and as-of joins over `events`.

The reference stores event timestamps but never interprets them
(SURVEY.md §1.2 "Time"); this module supplies the event-time analytics
a streaming engine needs: ranking/analytic windows, gap-based
sessionization (batch mirror of session_window), and as-of joins.

Scale notes: all windows partition by a key (user_id / custkey) so state
is distributed; no global windows without partitioning. Sessionize is a
single shuffle on user_id followed by narrow ops. The as-of join is
expressed as union+last_value (one shuffle, no row explosion) rather
than an O(n*m) theta join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from barco_spark.registry import register
from barco_spark.tables import t


@register(
    "window_topk_per_group",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) x
    WHERE rn <= 3
    """,
    "window",
    doc="Top-k per group via ranking window; shuffle once on the group key.",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running_analytics",
    """
    SELECT event_id, user_id, value,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_sum,
           LAG(value) OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           RANK() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS value_rank
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    "window",
    doc="Running/analytic frame; total order (ts, event_id) makes the double fold deterministic.",
)
def window_running_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wr = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("running_sum"),
        F.lag("value").over(Window.partitionBy("user_id").orderBy("ts", "event_id")).alias("prev_value"),
        F.lead("value").over(Window.partitionBy("user_id").orderBy("ts", "event_id")).alias("next_value"),
        F.rank().over(wr).alias("value_rank"),
    )


@register(
    "events_sessionize",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    numbered AS (
      SELECT user_id, ts, event_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged)
    SELECT user_id, session_id, COUNT(*) AS n_events,
           CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_s
    FROM numbered
    GROUP BY user_id, session_id
    """,
    "window",
    doc="Gap-based sessionization (batch mirror of F.session_window, 30 min gap).",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev = t(spark, sf_dir, "events")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(order).isNull()
            | (
                F.col("ts").cast("long") - F.lag("ts").over(order).cast("long")
                > 30 * 60
            ),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_session"),
    )
    numbered = flagged.select(
        "user_id", "ts", "event_id", F.sum("new_session").over(run).alias("session_id")
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(F.col("ts")).cast("long") - F.min(F.col("ts")).cast("long")).alias(
            "duration_s"
        ),
    )


@register(
    "asof_join_last_click",
    """
    WITH tagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'click' THEN ts END AS click_ts,
             event_type
      FROM events WHERE event_type IN ('click', 'purchase')),
    filled AS (
      SELECT user_id, ts, event_id, event_type,
             MAX(click_ts) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
      FROM tagged)
    SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, last_click_ts
    FROM filled WHERE event_type = 'purchase'
    """,
    "asof",
    doc=(
        "As-of join (each purchase matched to the latest prior-or-equal click) "
        "via union+running-max: one shuffle on user_id, no theta-join explosion. "
        "This is the scale-path shape for as-of joins at 100 TB."
    ),
)
def asof_join_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev = t(spark, sf_dir, "events").filter(F.col("event_type").isin("click", "purchase"))
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
    )
    filled = tagged.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.max("click_ts").over(run).alias("last_click_ts"),
    )
    return filled.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "last_click_ts",
    )


@register(
    "events_tumbling_window",
    """
    SELECT DATE_TRUNC('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    "window",
    doc="Batch mirror of a 1h tumbling event-time window (F.window in streaming).",
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )
