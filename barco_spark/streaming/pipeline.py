"""Streaming training-data curation: the batch pipeline, on a stream.

The batch pipeline (operators/pipeline.py) curates a corpus at rest;
this runs the same quality gate continuously over a produced topic and
dedups exactly across micro-batches with TTL-bounded state:

    format("barco") stream -> quality score (same expressions as
    text_metrics, via operators/text.with_quality) -> filter ->
    streaming exact dedup on the content digest (streaming_dedup_ttl)
    -> curated parquet

Near-dup (MinHash) removal stays a periodic batch job over the curated
output — a stream-stream LSH self-join would need unbounded state, and
the reference's own posture (at-least-once + consumer-side dedup,
docs/faq/README.md:14) endorses exactly this split.

Scale notes: quality scoring is per-row map work; the only stateful
stage keys on the md5 digest (uniform, unskewed) with one small state
record per distinct document and TTL eviction; the sink appends
partitioned parquet. Every stage is the same code path the batch
operators use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from barco_spark.operators.text import with_quality
from barco_spark.streaming.stateful import streaming_dedup_ttl

QUALITY_THRESHOLD = 0.6


def curated_stream(
    spark: SparkSession,
    log_root: str,
    topic: str,
    quality_threshold: float = QUALITY_THRESHOLD,
    dedup_ttl_ms: int | None = None,
) -> DataFrame:
    """The curated-documents stream (unstarted; caller picks the sink).

    Requires `spark.dataSource.register(BarcoDataSource)` once per
    session. Payloads are document text; output columns:
    (text_hash, text, n_tokens, quality_score).
    """
    stream = (
        spark.readStream.format("barco")
        .option("path", log_root)
        .option("topic", topic)
        .load()
    )
    scored = with_quality(stream.select(F.col("payload").alias("text")))
    good = scored.filter(F.col("quality_score") >= quality_threshold).select(
        F.md5(F.col("text")).alias("partition_key"),
        F.col("text").alias("payload"),
    )
    deduped = streaming_dedup_ttl(good, ttl_ms=dedup_ttl_ms)
    return with_quality(
        deduped.select(
            F.col("dedup_key").alias("text_hash"),
            F.col("payload").alias("text"),
        )
    ).select("text_hash", "text", "n_tokens", "quality_score")


from barco_spark.registry import register  # noqa: E402


@register(
    "streaming_funnel_snapshot",
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
    SELECT user_id, 'view' AS stage, epoch_us(t_view) AS ts_us
    FROM u WHERE t_view IS NOT NULL
    UNION ALL
    SELECT user_id, 'click', epoch_us(t_click) FROM u WHERE t_click IS NOT NULL
    UNION ALL
    SELECT user_id, 'purchase', epoch_us(t_purchase)
    FROM u WHERE t_purchase IS NOT NULL
    """,
    "pipeline",
    doc=(
        "The custom stateful streaming operator (applyInPandasWithState "
        "funnel) run to completion over the events table with "
        "Trigger.AvailableNow, hash-matched against the batch SQL "
        "cascade — custom streaming state proven equivalent to the "
        "declarative plan, per-user and per-timestamp. The builder "
        "actually runs the streaming engine (file source -> state "
        "store -> sink), not a batch re-expression."
    ),
)
def streaming_funnel_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile

    from barco_spark.streaming.stateful import streaming_funnel
    from barco_spark.tables import t

    tmp = tempfile.mkdtemp(prefix="funnel-snap-")
    src = tmp + "/src"
    out = tmp + "/out"
    # ship ts as integer micros: Spark's JSON timestamp format is
    # millisecond-precision and would silently truncate event times
    t(spark, sf_dir, "events").selectExpr(
        "user_id", "event_type", "unix_micros(ts) AS ts_us"
    ).write.json(src)

    stream = (
        spark.readStream.schema("user_id long, event_type string, ts_us long")
        .json(src)
        .selectExpr("user_id", "event_type", "timestamp_micros(ts_us) AS ts")
    )
    # parquet sink, not foreachBatch+collect: funnel rows flow straight
    # from the state store to executor-side files, so the harness stays
    # distributed end-to-end (nothing per-user ever reaches the driver)
    q = (
        streaming_funnel(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", tmp + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "streaming_funnel_snapshot: query did not drain in 300s"
            )
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    # the returned DataFrame reads `out` lazily; defer cleanup to exit
    shutil.rmtree(src, ignore_errors=True)
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    return spark.read.schema("user_id long, stage string, ts_us long").parquet(out)


@register(
    "streaming_rollup_snapshot",
    """
    SELECT DATE_TRUNC('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    "window",
    doc=(
        "Watermarked 1h tumbling-window aggregation run as a REAL "
        "streaming query (file source -> event-time watermark -> "
        "window state -> parquet sink, Trigger.AvailableNow) and "
        "hash-matched against the batch-from-raw oracle: streaming "
        "state finalization proven equivalent to the declarative "
        "GROUP BY. A far-future watermark sentinel plus the no-data "
        "finalization batch flushes every real window in append mode "
        "(the sentinel's own window can never finalize, so it never "
        "emits)."
    ),
)
def streaming_rollup_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile

    from barco_spark.tables import t

    tmp = tempfile.mkdtemp(prefix="rollup-snap-")
    src = tmp + "/src"
    out = tmp + "/out"
    ev = t(spark, sf_dir, "events").selectExpr(
        "event_type", "unix_micros(ts) AS ts_us", "value"
    )
    # watermark sentinel 2h past the last real event: it advances the
    # event-time watermark beyond every real window so append mode can
    # finalize them all; the row itself never reaches the aggregation
    max_us = ev.agg(F.max("ts_us")).collect()[0][0]
    sentinel = spark.createDataFrame(
        [("__wm__", max_us + 7_200_000_000, 0.0)],
        "event_type string, ts_us long, value double",
    )
    ev.unionByName(sentinel).write.json(src)

    stream = (
        spark.readStream.schema("event_type string, ts_us long, value double")
        .json(src)
        .selectExpr("event_type", "timestamp_micros(ts_us) AS ts", "value")
    )
    agg = (
        stream.withWatermark("ts", "0 seconds")
        # NO pre-aggregation filter: Catalyst pushes deterministic
        # predicates below the EventTimeWatermark node, which would drop
        # the sentinel before it advances event time. The sentinel flows
        # into the aggregation instead; its own window sits 2h past the
        # final watermark, so it can never finalize and never emits —
        # the post-read filter below is belt-and-braces only.
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("v"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            F.col("v").cast("double").alias("total_value"),
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", tmp + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "streaming_rollup_snapshot: query did not drain in 300s"
            )
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    shutil.rmtree(src, ignore_errors=True)
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    return (
        spark.read.schema(
            "window_start timestamp, event_type string, n long, total_value double"
        )
        .parquet(out)
        .filter(F.col("event_type") != "__wm__")
    )


@register(
    "streaming_dedup_snapshot",
    """
    SELECT DISTINCT md5(text) AS fp FROM documents
    """,
    "dedup",
    doc=(
        "Streaming exact dedup run as a REAL streaming query (file "
        "source -> dropDuplicates on the content digest -> parquet "
        "sink, Trigger.AvailableNow) and hash-matched against the "
        "batch DISTINCT oracle: cross-micro-batch dedup state proven "
        "equivalent to the declarative set semantics. Only the digest "
        "column is emitted (which duplicate survives is "
        "arrival-order-dependent; the SET of digests is not). "
        "Production streams bound the state with "
        "dropDuplicatesWithinWatermark / streaming_dedup_ttl "
        "(streaming/stateful.py); the unbounded variant here is what "
        "an exact snapshot check can verify."
    ),
)
def streaming_dedup_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile

    from barco_spark.tables import t

    tmp = tempfile.mkdtemp(prefix="dedup-snap-")
    src = tmp + "/src"
    out = tmp + "/out"
    t(spark, sf_dir, "documents").select(
        F.md5(F.col("text")).alias("fp")
    ).write.json(src)

    stream = spark.readStream.schema("fp string").json(src)
    q = (
        stream.dropDuplicates(["fp"])
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", tmp + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "streaming_dedup_snapshot: query did not drain in 300s"
            )
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    shutil.rmtree(src, ignore_errors=True)
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    return spark.read.schema("fp string").parquet(out)


@register(
    "streaming_sessionize_snapshot",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged)
    SELECT user_id,
           epoch_us(MIN(ts)) AS session_start_us,
           epoch_us(MAX(ts)) AS last_event_us,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, sid
    """,
    "window",
    doc=(
        "Gap-based sessionization run as a REAL streaming query "
        "(file source -> F.session_window(30 min) state -> parquet "
        "sink, Trigger.AvailableNow) and hash-matched against the "
        "batch gaps-and-islands oracle. session_window merges on the "
        "half-open [start, last+gap) rule, so the oracle flags a new "
        "session at gap >= 30 min (events_sessionize's strict-> "
        "variant mirrors its own batch twin; both conventions are "
        "exact, they just must not be mixed). Same watermark-sentinel "
        "finalization trick as streaming_rollup_snapshot; the "
        "sentinel's own session (user_id -1) can never finalize."
    ),
)
def streaming_sessionize_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile

    from barco_spark.tables import t

    tmp = tempfile.mkdtemp(prefix="sess-snap-")
    src = tmp + "/src"
    out = tmp + "/out"
    ev = t(spark, sf_dir, "events").selectExpr(
        "user_id", "unix_micros(ts) AS ts_us"
    )
    max_us = ev.agg(F.max("ts_us")).collect()[0][0]
    sentinel = spark.createDataFrame(
        [(-1, max_us + 7_200_000_000)], "user_id long, ts_us long"
    )
    ev.unionByName(sentinel).write.json(src)

    stream = (
        spark.readStream.schema("user_id long, ts_us long")
        .json(src)
        .selectExpr("user_id", "timestamp_micros(ts_us) AS ts")
    )
    agg = (
        stream.withWatermark("ts", "0 seconds")
        .groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias(
                "session_start_us"
            ),
            # session end = last event + gap (half-open window)
            (
                F.unix_micros(F.col("session_window.end"))
                - F.lit(30 * 60 * 1_000_000)
            ).alias("last_event_us"),
            "n_events",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", tmp + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "streaming_sessionize_snapshot: query did not drain in 300s"
            )
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    shutil.rmtree(src, ignore_errors=True)
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    return (
        spark.read.schema(
            "user_id long, session_start_us long, last_event_us long,"
            " n_events long"
        )
        .parquet(out)
        .filter(F.col("user_id") >= 0)
    )


@register(
    "streaming_debounce_snapshot",
    """
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
                       AND ts_us - prev_us < 300000000
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
        "The stateful debouncer run as a REAL streaming query (file "
        "source -> applyInPandasWithState carrying last-raw-timestamp "
        "per (user,type) -> parquet sink, Trigger.AvailableNow) and "
        "hash-matched against the batch LAG oracle — the fifth "
        "streaming-vs-batch parity snapshot. The stream emits every "
        "event with (gap_us, drop_flag); the final per-type rollup "
        "runs in batch over the snapshot, so the stateful operator is "
        "what's actually under test. State is one long per live "
        "(user,type) key; at 100 TB the state store hash-partitions "
        "those keys and the per-batch work is a vectorized shift."
    ),
)
def streaming_debounce_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile

    from barco_spark.streaming.stateful import streaming_debounce
    from barco_spark.tables import t

    tmp = tempfile.mkdtemp(prefix="debounce-snap-")
    src = tmp + "/src"
    out = tmp + "/out"
    t(spark, sf_dir, "events").selectExpr(
        "user_id", "event_type", "event_id", "unix_micros(ts) AS ts_us"
    ).coalesce(1).write.json(src)

    stream = spark.readStream.schema(
        "user_id long, event_type string, event_id long, ts_us long"
    ).json(src)
    q = (
        streaming_debounce(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", tmp + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "streaming_debounce_snapshot: query did not drain in 300s"
            )
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    shutil.rmtree(src, ignore_errors=True)
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    flags = spark.read.schema(
        "user_id long, event_type string, event_id long, ts_us long,"
        " gap_us long, drop_flag long"
    ).parquet(out)
    return (
        flags.groupBy("event_type")
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


def curated_stream_with_quarantine(
    spark: SparkSession,
    log_root: str,
    topic: str,
    curated_path: str,
    quarantine_path: str,
    checkpoint: str,
    quality_threshold: float = QUALITY_THRESHOLD,
):
    """The curation stream with a DEAD-LETTER side output.

    Production curation never silently drops: every rejected document
    lands in a quarantine table WITH its reject reason, so filters are
    auditable and tunable after the fact (and a loosened threshold can
    re-admit from quarantine instead of re-reading the source log).
    Structured Streaming sinks are single-output, so the split runs in
    foreachBatch — score once per micro-batch, write the accepted rows
    to the curated table and the rejects (reason column attached) to
    quarantine; both writes inherit the stream's exactly-once batch
    semantics from the shared checkpoint. Returns the started query.

    Scale: scoring is the same map-only expression set as
    `text_metrics`; the split adds no shuffle (two filtered writes of
    one scored, persisted batch frame).
    """

    stream = (
        spark.readStream.format("barco")
        .option("path", log_root)
        .option("topic", topic)
        .load()
    )

    def split_batch(batch, batch_id: int) -> None:
        scored = with_quality(
            batch.select(F.col("payload").alias("text"))
        ).persist()
        try:
            good = scored.filter(
                F.col("quality_score") >= quality_threshold
            ).select("text", "n_tokens", "quality_score")
            reason = (
                F.when(F.col("n_tokens") < 5, F.lit("too_short"))
                .when(F.col("stopword_ratio") < 0.05, F.lit("low_stopword"))
                .otherwise(F.lit("low_quality_score"))
            )
            bad = scored.filter(
                F.col("quality_score") < quality_threshold
            ).select(
                "text",
                "n_tokens",
                F.col("quality_score"),
                reason.alias("reject_reason"),
            )
            good.write.mode("append").parquet(curated_path)
            bad.write.mode("append").parquet(quarantine_path)
        finally:
            scored.unpersist()

    return (
        stream.writeStream.foreachBatch(split_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


@register(
    "streaming_join_snapshot",
    """
    SELECT v.user_id,
           v.event_id AS view_id,
           c.event_id AS click_id,
           epoch_us(v.ts) AS view_us,
           epoch_us(c.ts) AS click_us
    FROM events v JOIN events c
      ON v.user_id = c.user_id
     AND v.event_type = 'view' AND c.event_type = 'click'
     AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
    """,
    "pipeline",
    doc=(
        "Stream-stream event-time interval join (click attribution) "
        "run as a REAL streaming query: the events topic split into a "
        "view stream and a click stream, both watermarked, joined on "
        "user_id with the time-range predicate click_ts in [view_ts, "
        "view_ts + 1h], parquet sink, Trigger.AvailableNow — "
        "hash-matched against the batch self-join oracle. Inner "
        "stream-stream joins emit matches eagerly, so no sentinel is "
        "needed; the watermark delay here spans the snapshot's input "
        "(late-drop-free by construction), while a production stream "
        "uses a realistic delay so the range condition bounds both "
        "sides' state and the watermark evicts it. At scale both "
        "sides shuffle-partition on user_id — the state-store key — "
        "so each pairing is executor-local."
    ),
)
def streaming_join_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile

    from barco_spark.tables import t

    tmp = tempfile.mkdtemp(prefix="ssjoin-snap-")
    src = tmp + "/src"
    out = tmp + "/out"
    t(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "click")
    ).selectExpr(
        "event_id", "user_id", "event_type", "unix_micros(ts) AS ts_us"
    ).write.json(src)

    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, ts_us long"
        )
        .json(src)
        .selectExpr(
            "event_id", "user_id", "event_type", "timestamp_micros(ts_us) AS ts"
        )
    )
    # file batches arrive in arbitrary ts order; a delay covering the
    # dataset's time span makes cross-batch late drops impossible for
    # the snapshot (production picks the real lateness bound instead)
    views = (
        stream.where(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "366 days")
    )
    clicks = (
        stream.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "366 days")
    )
    joined = views.join(
        clicks,
        F.expr(
            "v_user = c_user AND click_ts >= view_ts"
            " AND click_ts <= view_ts + INTERVAL 1 HOUR"
        ),
        "inner",
    ).select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "click_id",
        F.unix_micros("view_ts").alias("view_us"),
        F.unix_micros("click_ts").alias("click_us"),
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", tmp + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "streaming_join_snapshot: query did not drain in 300s"
            )
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    shutil.rmtree(src, ignore_errors=True)
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    return spark.read.schema(
        "user_id long, view_id long, click_id long, view_us long, click_us long"
    ).parquet(out)


@register(
    "streaming_enrich_snapshot",
    """
    SELECT c.c_mktsegment AS mktsegment,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    """,
    "pipeline",
    doc=(
        "Stream-static enrichment join run as a REAL streaming query: "
        "the events stream joined (stateless, per-micro-batch) against "
        "the static customer dimension, enriched rows written to the "
        "sink, then rolled up per market segment — hash-matched "
        "against the batch join+GROUP BY oracle. The static side is "
        "broadcast into every micro-batch, the standard dimension- "
        "enrichment shape: no state store, no watermark, and at scale "
        "the dimension refresh is just re-reading the static relation "
        "per batch. Value sums in exact DECIMAL."
    ),
)
def streaming_enrich_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile

    from barco_spark.tables import t

    tmp = tempfile.mkdtemp(prefix="enrich-snap-")
    src = tmp + "/src"
    out = tmp + "/out"
    t(spark, sf_dir, "events").selectExpr("user_id", "value").write.json(src)

    customer = F.broadcast(
        t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    )
    stream = spark.readStream.schema("user_id long, value double").json(src)
    enriched = stream.join(
        customer, stream["user_id"] == customer["c_custkey"], "inner"
    ).select("c_mktsegment", "value")
    q = (
        enriched.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", tmp + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "streaming_enrich_snapshot: query did not drain in 300s"
            )
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    shutil.rmtree(src, ignore_errors=True)
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    return (
        spark.read.schema("c_mktsegment string, value double")
        .parquet(out)
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )
