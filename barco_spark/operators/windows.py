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
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
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
                # microsecond-exact gap test, matching the oracle's
                # `ts - LAG(ts) > INTERVAL 30 MINUTE` (whole-second
                # casts would truncate and can flip boundary sessions)
                F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(order))
                > 30 * 60 * 1_000_000
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


@register(
    "events_type_correlation",
    """
    WITH hourly AS (
      SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS h, event_type,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS v
      FROM events GROUP BY 1, 2),
    paired AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n,
             CAST(SUM(a.v) AS DOUBLE) AS sx,
             CAST(SUM(b.v) AS DOUBLE) AS sy,
             CAST(SUM(a.v * b.v) AS DOUBLE) AS sxy,
             CAST(SUM(a.v * a.v) AS DOUBLE) AS sxx,
             CAST(SUM(b.v * b.v) AS DOUBLE) AS syy
      FROM hourly a JOIN hourly b ON a.h = b.h AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type)
    SELECT type_a, type_b, n AS n_hours,
           (CAST(n AS DOUBLE) * sxy - sx * sy)
             / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                    * (CAST(n AS DOUBLE) * syy - sy * sy)) AS pearson
    FROM paired
    """,
    "window",
    doc=(
        "Time-series correlation matrix: hourly value series per event "
        "type, Pearson over shared hours. All totals are exact decimal "
        "sums cast to double, so the correlation is bit-deterministic "
        "(F.corr/corr() would fold doubles in partition order)."
    ),
)
def events_type_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = (
        t(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("h"),
            F.col("event_type"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("v")
        )
    )
    a = hourly.select(
        F.col("h"), F.col("event_type").alias("type_a"), F.col("v").alias("va")
    )
    b = hourly.select(
        F.col("h"), F.col("event_type").alias("type_b"), F.col("v").alias("vb")
    )
    paired = (
        a.join(b, "h")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("va").cast("double").alias("sx"),
            F.sum("vb").cast("double").alias("sy"),
            F.sum(F.col("va") * F.col("vb")).cast("double").alias("sxy"),
            F.sum(F.col("va") * F.col("va")).cast("double").alias("sxx"),
            F.sum(F.col("vb") * F.col("vb")).cast("double").alias("syy"),
        )
    )
    n_d = F.col("n").cast("double")
    return paired.select(
        "type_a",
        "type_b",
        F.col("n").alias("n_hours"),
        (
            (n_d * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                (n_d * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (n_d * F.col("syy") - F.col("sy") * F.col("sy"))
            )
        ).alias("pearson"),
    )


@register(
    "events_funnel",
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
    SELECT 'view' AS stage, COUNT(t_view) AS n_users,
           CAST(NULL AS DOUBLE) AS avg_delay_us FROM u
    UNION ALL
    SELECT 'click', COUNT(t_click),
           CAST(SUM(CASE WHEN t_click IS NOT NULL
                         THEN epoch_us(t_click) - epoch_us(t_view) END) AS DOUBLE)
             / NULLIF(COUNT(t_click), 0) FROM u
    UNION ALL
    SELECT 'purchase', COUNT(t_purchase),
           CAST(SUM(CASE WHEN t_purchase IS NOT NULL
                         THEN epoch_us(t_purchase) - epoch_us(t_view) END) AS DOUBLE)
             / NULLIF(COUNT(t_purchase), 0) FROM u
    """,
    "window",
    doc=(
        "Conversion funnel view -> click -> purchase: per user, the "
        "earliest view, the earliest click strictly after it, and the "
        "earliest purchase strictly after that; stage user-counts and "
        "mean time-to-stage. The three cascaded conditional-min windows "
        "share ONE user_id partitioning (one shuffle), then a per-user "
        "agg and a 3-row rollup — no self-joins, so at 100 TB the cost "
        "is a single shuffle of the three event types. Delay arithmetic "
        "is integer micros with one final division (oracle-exact)."
    ),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return funnel_stages(t(spark, sf_dir, "events"))


def funnel_stages(events: DataFrame) -> DataFrame:
    """Funnel rollup over any (user_id, event_type, ts) DataFrame —
    the library core behind the `events_funnel` query (same plan)."""
    w = Window.partitionBy("user_id")
    ev = events.filter(
        F.col("event_type").isin("view", "click", "purchase")
    ).select("user_id", "event_type", "ts")
    s1 = ev.withColumn(
        "t_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    s2 = s1.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
                F.col("ts"),
            )
        ).over(w),
    )
    s3 = s2.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t_click")),
                F.col("ts"),
            )
        ).over(w),
    )
    u = s3.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )

    def delay_sum(tcol: str):
        return F.sum(
            F.when(
                F.col(tcol).isNotNull(),
                F.unix_micros(F.col(tcol)) - F.unix_micros(F.col("t_view")),
            )
        )

    # one aggregation produces every stage measure; explode to 3 rows
    # (vs three u.agg branches, which would re-run the window subtree
    # and scan the events table three times)
    one = u.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_click"),
        F.count("t_purchase").alias("n_purchase"),
        delay_sum("t_click").alias("d_click"),
        delay_sum("t_purchase").alias("d_purchase"),
    )
    stages = F.array(
        F.struct(
            F.lit("view").alias("stage"),
            F.col("n_view").alias("n_users"),
            F.lit(None).cast("double").alias("avg_delay_us"),
        ),
        F.struct(
            F.lit("click").alias("stage"),
            F.col("n_click").alias("n_users"),
            (
                F.col("d_click").cast("double")
                / F.nullif(F.col("n_click"), F.lit(0))
            ).alias("avg_delay_us"),
        ),
        F.struct(
            F.lit("purchase").alias("stage"),
            F.col("n_purchase").alias("n_users"),
            (
                F.col("d_purchase").cast("double")
                / F.nullif(F.col("n_purchase"), F.lit(0))
            ).alias("avg_delay_us"),
        ),
    )
    return one.select(F.explode(stages).alias("s")).select("s.*")


@register(
    "cohort_retention",
    """
    WITH p AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_d
      FROM events WHERE event_type = 'purchase' GROUP BY user_id),
    a AS (
      SELECT e.user_id, p.cohort_d,
             CAST(floor(datediff('day', p.cohort_d, CAST(e.ts AS DATE)) / 7.0)
                  AS BIGINT) AS wk
      FROM events e JOIN p ON e.user_id = p.user_id
      WHERE CAST(e.ts AS DATE) >= p.cohort_d)
    SELECT CAST(cohort_d AS TIMESTAMP) AS cohort_d, wk,
           COUNT(DISTINCT user_id) AS active_users
    FROM a GROUP BY cohort_d, wk
    """,
    "window",
    doc=(
        "Cohort retention: users cohorted by first-purchase date, then "
        "distinct active users per (cohort, week-offset) over all later "
        "activity. All-integer date arithmetic (datediff // 7). Two "
        "shuffles at scale: the first-purchase agg and the activity "
        "join/agg, both keyed on user_id so AQE can reuse the exchange; "
        "the (cohort, week) result is tiny. The cohort key is emitted "
        "as TIMESTAMP on both sides: a DATE column reaches pandas as "
        "Python date objects from Spark but datetime64 from DuckDB, "
        "and the driver's canonicalizer hashes those differently."
    ),
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    p = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.col("ts").cast("date")).alias("cohort_d"))
    )
    a = (
        ev.join(p, "user_id")
        .filter(F.col("d") >= F.col("cohort_d"))
        .select(
            "user_id",
            "cohort_d",
            F.floor(F.datediff(F.col("d"), F.col("cohort_d")) / 7)
            .cast("bigint")
            .alias("wk"),
        )
    )
    return (
        a.groupBy("cohort_d", "wk")
        .agg(F.count_distinct("user_id").alias("active_users"))
        .select(
            F.col("cohort_d").cast("timestamp").alias("cohort_d"),
            "wk",
            "active_users",
        )
    )


@register(
    "window_distribution_funcs",
    """
    SELECT event_id, user_id, value,
           NTILE(4) OVER w AS quartile,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd,
           first_value(event_id) OVER w AS first_event,
           nth_value(event_id, 2) OVER w AS second_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
    """,
    "window",
    doc=(
        "Distribution-family window functions (ntile / percent_rank / "
        "cume_dist / first_value / nth_value) per user over value. The "
        "(value, event_id) order is total, so ntile assignment and the "
        "rank ratios (integer-over-integer single divisions) are "
        "deterministic cross-engine; nth_value uses the ANSI default "
        "running frame in both. One shuffle on user_id."
    ),
)
def window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    return t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.first("event_id").over(w).alias("first_event"),
        F.nth_value("event_id", 2).over(w).alias("second_event"),
    )


_SKEW_TOPK = 3
_SKEW_SALTS = 16


@register(
    "skew_salted_topk",
    f"""
    SELECT event_type, event_id, value, rn FROM (
      SELECT event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id) AS rn
      FROM events) x
    WHERE rn <= {_SKEW_TOPK}
    """,
    "window",
    doc=(
        "Top-k under extreme key skew: event_type has only 5 values, so "
        "a plain ranking window is 5 straggler tasks no matter how many "
        "executors exist. Two-phase salted ranking instead: local top-k "
        "per (key, salt-of-row-hash) across salts*keys parallel groups, "
        "then the global window ranks only k*salts survivors per key. "
        "Semantics-preserving (every global top-k row is top-k in its "
        "salt bucket); the oracle is the plain one-window SQL."
    ),
)
def skew_salted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("event_type", "event_id", "value")
    salted = ev.withColumn(
        "_salt", F.pmod(F.hash("event_id"), F.lit(_SKEW_SALTS))
    )
    w_local = Window.partitionBy("event_type", "_salt").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    survivors = (
        salted.select(
            "event_type",
            "event_id",
            "value",
            F.row_number().over(w_local).alias("_lrn"),
        )
        .filter(F.col("_lrn") <= _SKEW_TOPK)
        .drop("_lrn")
    )
    w_global = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    return survivors.select(
        "event_type", "event_id", "value", F.row_number().over(w_global).alias("rn")
    ).filter(F.col("rn") <= _SKEW_TOPK)


@register(
    "window_range_frame_1h",
    """
    SELECT event_id, user_id, ts_us,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
                  OVER (PARTITION BY user_id ORDER BY ts_us
                        RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS rolling_1h_sum,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts_us
                          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             AS rolling_1h_n
    FROM (SELECT event_id, user_id, value, epoch_us(ts) AS ts_us FROM events) x
    """,
    "window",
    doc=(
        "Time-based RANGE frame: per-user rolling 1-hour sum/count, the "
        "value-based sliding window ROWS frames can't express (rows "
        "enter/leave by timestamp distance, not position). Ordering by "
        "integer micros makes the frame boundary exact in both engines; "
        "the sum is DECIMAL inside the frame fold. Same single "
        "user_id shuffle as any partitioned window."
    ),
)
def window_range_frame_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = t(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", F.unix_micros("ts").alias("ts_us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return base.select(
        "event_id",
        "user_id",
        "ts_us",
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("rolling_1h_sum"),
        F.count(F.lit(1)).over(w).alias("rolling_1h_n"),
    )


@register(
    "rollup_reuse_hourly",
    """
    WITH minute AS (
      SELECT DATE_TRUNC('minute', ts) AS m, event_type,
             COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(18,2))) AS v
      FROM events GROUP BY 1, 2
    )
    SELECT DATE_TRUNC('hour', m) AS window_start,
           event_type,
           CAST(SUM(n) AS BIGINT) AS n,
           COUNT(*) AS n_minutes,
           CAST(SUM(v) AS DOUBLE) AS total_value
    FROM minute GROUP BY 1, 2
    """,
    "window",
    doc=(
        "Continuous-aggregate (hypertable-style) rollup reuse: the hour "
        "level is computed FROM the minute-level partials (integer "
        "counts + exact decimal sums are mergeable), not from raw "
        "events — the pattern that makes multi-resolution dashboards "
        "over 100 TB one raw scan + tiny re-aggregations. Hash-matches "
        "the direct-from-raw oracle, proving partial-merge correctness."
    ),
)
def rollup_reuse_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    minute = (
        t(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("minute", F.col("ts")).alias("m"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("v"),
        )
    )
    return (
        minute.groupBy(
            F.date_trunc("hour", F.col("m")).alias("window_start"),
            F.col("event_type"),
        )
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.count(F.lit(1)).alias("n_minutes"),
            F.sum("v").cast("double").alias("total_value"),
        )
    )


_DEBOUNCE_US = 300_000_000  # 5 minutes


@register(
    "events_debounce",
    f"""
    WITH o AS (
      SELECT event_type, user_id, event_id,
             epoch_us(ts) AS ts_us,
             LAG(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
                                     ORDER BY epoch_us(ts), event_id)
               AS prev_us
      FROM events),
    f AS (
      SELECT event_type,
             CASE WHEN prev_us IS NOT NULL
                       AND ts_us - prev_us < {_DEBOUNCE_US}
                  THEN 1 ELSE 0 END AS drop_flag,
             ts_us - prev_us AS gap_us
      FROM o)
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(drop_flag) AS BIGINT) AS debounced,
           CAST(COUNT(*) - SUM(drop_flag) AS BIGINT) AS kept,
           CAST(SUM(drop_flag) AS DOUBLE) / COUNT(*) AS debounce_share,
           CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
    FROM f GROUP BY event_type ORDER BY event_type
    """,
    "window",
    doc=(
        "Debounce suppression report: an event is dropped when the SAME "
        "(user, type) stream produced an event less than 5 minutes "
        "earlier — the duplicate-click / retry-storm cleaner that runs "
        "before sessionization (debouncing against the previous RAW "
        "event keeps the rule a pure LAG, where debouncing against the "
        "previous KEPT event would chain iteratively). Integer-micro "
        "timestamps make the threshold compare exact cross-engine. One "
        "(user,type) window shuffle + one map-side-combinable rollup — "
        "the same posture as every sessionize/gap operator here; at "
        "100 TB the window key is (user,type), so skew only appears if "
        "one user floods one type, exactly the case the debouncer "
        "exists to flag."
    ),
)
def events_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts_us", "event_id"
    )
    o = ev.withColumn("prev_us", F.lag("ts_us").over(w))
    drop_flag = (
        F.col("prev_us").isNotNull()
        & (F.col("ts_us") - F.col("prev_us") < _DEBOUNCE_US)
    ).cast("long")
    f = o.select(
        "event_type",
        drop_flag.alias("drop_flag"),
        (F.col("ts_us") - F.col("prev_us")).alias("gap_us"),
    )
    return (
        f.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("drop_flag").cast("bigint").alias("debounced"),
            (F.count(F.lit(1)) - F.sum("drop_flag"))
            .cast("bigint")
            .alias("kept"),
            (F.sum("drop_flag").cast("double") / F.count(F.lit(1))).alias(
                "debounce_share"
            ),
            F.min("gap_us").cast("bigint").alias("min_gap_us"),
            F.max("gap_us").cast("bigint").alias("max_gap_us"),
        )
        .orderBy("event_type")
    )


@register(
    "telemetry_sessions_pipeline",
    f"""
    WITH o AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             LAG(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
                                     ORDER BY epoch_us(ts), event_id)
               AS prev_us
      FROM events),
    kept AS (
      SELECT user_id, event_id, ts_us FROM o
      WHERE prev_us IS NULL OR ts_us - prev_us >= {_DEBOUNCE_US}),
    flagged AS (
      SELECT user_id, event_id, ts_us,
             CASE WHEN LAG(ts_us) OVER w IS NULL
                       OR ts_us - LAG(ts_us) OVER w >= 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM kept
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
    numbered AS (
      SELECT user_id, ts_us,
             SUM(new_session) OVER (PARTITION BY user_id
               ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged),
    sessions AS (
      SELECT user_id, sid, COUNT(*) AS n_events,
             MAX(ts_us) - MIN(ts_us) AS dur_us
      FROM numbered GROUP BY user_id, sid)
    SELECT CAST(LEAST(n_events, 10) AS BIGINT) AS size_bucket,
           COUNT(*) AS n_sessions,
           CAST(SUM(n_events) AS BIGINT) AS total_events,
           CAST(SUM(dur_us) AS BIGINT) AS total_dur_us,
           CAST(SUM(dur_us) AS DOUBLE) / COUNT(*) AS avg_dur_us
    FROM sessions GROUP BY 1 ORDER BY size_bucket
    """,
    "pipeline",
    doc=(
        "The composed telemetry pipeline as ONE query: debounce "
        "(drop events <5 min after the previous raw same-(user,type) "
        "event) -> 30-min gap sessionization of the KEPT stream -> "
        "session-size-bucket rollup with exact integer durations. Each "
        "fragment is individually oracle-verified (events_debounce, "
        "events_sessionize); this entry verifies their COMPOSITION — "
        "filters feeding windows feeding islands, the ordering-"
        "sensitive part Catalyst must not break while fusing. ONE "
        "window shuffle (user_id) + one tiny rollup: the debounce lag "
        "runs inside the user partition sorted by (type, ts) with a "
        "type-change guard, so the sessionize window reuses the "
        "exchange (sort-only) — the event stream crosses the network "
        "once at any scale."
    ),
)
def telemetry_sessions_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
    )
    # Debounce inside ONE user_id exchange: within a user partition
    # sorted by (event_type, ts, event_id), same-type rows are
    # contiguous and time-ordered, so lag() is exactly the per-(user,
    # type) predecessor whenever the type did not change — and a type
    # change marks the first row of a group (kept, like a NULL lag).
    # eqNullSafe mirrors partitionBy's null grouping. The sessionize
    # window below then reuses the user_id partitioning (sort-only, no
    # second exchange of the event stream).
    w_d = Window.partitionBy("user_id").orderBy(
        "event_type", "ts_us", "event_id"
    )
    kept = (
        ev.withColumn("prev_us", F.lag("ts_us").over(w_d))
        .withColumn("prev_ty", F.lag("event_type").over(w_d))
        .where(
            ~F.col("prev_ty").eqNullSafe(F.col("event_type"))
            | F.col("prev_us").isNull()
            | (F.col("ts_us") - F.col("prev_us") >= _DEBOUNCE_US)
        )
        .select("user_id", "event_id", "ts_us")
    )
    w_s = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = kept.withColumn(
        "new_session",
        F.when(
            F.lag("ts_us").over(w_s).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w_s) >= 1_800_000_000),
            1,
        ).otherwise(0),
    )
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    numbered = flagged.withColumn("sid", F.sum("new_session").over(w_cum))
    sessions = numbered.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("ts_us") - F.min("ts_us")).alias("dur_us"),
    )
    return (
        sessions.groupBy(
            F.least(F.col("n_events"), F.lit(10))
            .cast("bigint")
            .alias("size_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").cast("bigint").alias("total_events"),
            F.sum("dur_us").cast("bigint").alias("total_dur_us"),
            (F.sum("dur_us").cast("double") / F.count(F.lit(1))).alias(
                "avg_dur_us"
            ),
        )
        .orderBy("size_bucket")
    )


@register(
    "window_forward_fill",
    """
    WITH masked AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             CASE WHEN value >= 100 THEN value END AS v
      FROM events),
    filled AS (
      SELECT user_id, event_id, v,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff
      FROM masked)
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_gaps,
           CAST(SUM(CASE WHEN v IS NULL AND ff IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
           CAST(SUM(CASE WHEN ff IS NOT NULL
                         THEN CAST(floor(ff * 1000) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS fill_checksum
    FROM filled GROUP BY user_id ORDER BY user_id
    """,
    "window",
    doc=(
        "Forward fill (last observation carried forward) per key: "
        "values under 100 are masked to NULL to create gaps, then "
        "last_value(... IGNORE NULLS) over the (ts, event_id)-ordered "
        "per-user frame carries the previous reading forward — the "
        "sensor-gap idiom every telemetry pipeline needs, and the "
        "IGNORE NULLS window corner both engines must agree on (gaps "
        "before the first observation stay NULL). Verified by an "
        "order-sensitive integer checksum of the filled series "
        "(floor(x*1000) of identical doubles). One user_id window "
        "shuffle + one rollup."
    ),
)
def window_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.when(F.col("value") >= 100, F.col("value")).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = ev.withColumn("ff", F.last("v", ignorenulls=True).over(w))
    return (
        filled.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("v").isNull().cast("long"))
            .cast("bigint")
            .alias("n_gaps"),
            F.sum(
                (F.col("v").isNull() & F.col("ff").isNotNull()).cast("long")
            )
            .cast("bigint")
            .alias("n_filled"),
            F.sum(
                F.when(
                    F.col("ff").isNotNull(),
                    F.floor(F.col("ff") * 1000).cast("bigint"),
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("fill_checksum"),
        )
        .orderBy("user_id")
    )


@register(
    "events_hopping_window",
    """
    WITH x AS (
      SELECT event_type, value,
             time_bucket(INTERVAL 15 MINUTE, ts)
               - u.i * INTERVAL 15 MINUTE AS window_start
      FROM events, unnest(range(0, 4)) AS u(i))
    SELECT window_start, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM x GROUP BY 1, 2
    """,
    "window",
    doc=(
        "Hopping (sliding) event-time window: 1h windows advancing "
        "every 15 min via the REAL F.window(ts, '1 hour', '15 "
        "minutes') operator — each event lands in size/slide = 4 "
        "overlapping windows. The oracle expands the same 4 "
        "epoch-aligned offsets per event with unnest(range(0,4)). "
        "Complements events_tumbling_window (slide == size) and the "
        "session_window family. Value sums in exact DECIMAL. Scale: "
        "the expansion factor is size/slide (constant), and the "
        "aggregate is one hash shuffle keyed on (window, type) — "
        "identical posture to the tumbling rollup."
    ),
)
def events_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .groupBy(
            F.window(F.col("ts"), "1 hour", "15 minutes"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "events_twap",
    """
    WITH o AS (
      SELECT user_id, event_type,
             CAST(FLOOR(value * 100) AS BIGINT) AS cents,
             epoch_us(ts) AS ts_us,
             LEAD(epoch_us(ts)) OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts, event_id) AS next_us
      FROM events),
    seg AS (
      SELECT user_id, event_type,
             cents * (next_us - ts_us) AS area,
             next_us - ts_us AS dur_us
      FROM o WHERE next_us IS NOT NULL)
    SELECT user_id, event_type,
           COUNT(*) AS n_segments,
           CAST(SUM(dur_us) AS BIGINT) AS span_us,
           (CAST(SUM(area) AS BIGINT) / CAST(SUM(dur_us) AS BIGINT))
             / 100.0 AS twap
    FROM seg GROUP BY user_id, event_type
    """,
    "window",
    doc=(
        "Time-weighted average value per (user, event type): each "
        "observation holds until the next one (step interpolation), "
        "TWAP = sum(value_i * dur_i) / sum(dur_i) over the observed "
        "span — the standard telemetry/financial rollup that plain "
        "AVG gets wrong under irregular sampling. Determinism: values are "
        "quantized to integer cents (floor(value*100) — the same "
        "double product in both engines), the per-segment area is "
        "cents * integer-microsecond duration (exact int64; bounded "
        "by max_cents * time_range regardless of row count), and the "
        "only doubles are the final two fixed-order divisions. One window shuffle keyed on the "
        "group (LEAD) feeding a same-key aggregate — at scale the agg "
        "reuses the window's partitioning, so it is a single shuffle."
    ),
)
def events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    o = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        F.unix_micros("ts").alias("ts_us"),
        F.lead(F.unix_micros("ts")).over(w).alias("next_us"),
    )
    seg = o.where(F.col("next_us").isNotNull()).select(
        "user_id",
        "event_type",
        (F.col("cents") * (F.col("next_us") - F.col("ts_us"))).alias("area"),
        (F.col("next_us") - F.col("ts_us")).alias("dur_us"),
    )
    return seg.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("dur_us").cast("bigint").alias("span_us"),
        (
            (
                F.sum("area").cast("bigint")
                / F.sum("dur_us").cast("bigint")
            )
            / F.lit(100.0)
        ).alias("twap"),
    )
