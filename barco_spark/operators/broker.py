"""Broker-semantics queries: the reference's produce-path expressed
relationally over the `events` table.

The reference routes each record by partition key -> murmur3 token ->
(broker, rangeIndex) bucket, then assigns contiguous per-bucket offsets
(/root/reference/internal/producing/coalescer.go:85-172,
internal/types/token.go:44-66). Here the same semantics are computed
declaratively: a deterministic hash-bucket (md5-based so the DuckDB
oracle reproduces it bit-for-bit) and ROW_NUMBER offsets per bucket.

The byte-exact Cassandra ring (functions/tokens.py) is exercised in
tests/test_tokens.py; queries below use an engine-portable hash so the
oracle can verify the *shape* of the routing (stable bucket, contiguous
0-based offsets, per-key ordering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from barco_spark.config import DEFAULT
from barco_spark.registry import register
from barco_spark.tables import t

_B = DEFAULT.buckets  # 12 = brokers x consumerRanges


@register(
    "events_bucket_offsets",
    f"""
    SELECT event_id, user_id,
           ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % {_B} AS bucket,
           ROW_NUMBER() OVER (
             PARTITION BY ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % {_B}
             ORDER BY ts, event_id) - 1 AS "offset"
    FROM events
    """,
    "broker",
    doc=(
        "Produce path W1/P1-P2: key->bucket routing + contiguous 0-based "
        "per-bucket offsets in arrival order (coalescer.go:85-172)."
    ),
)
def events_bucket_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    bucket = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % _B
    ).alias("bucket")
    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "ts", bucket)
    w = Window.partitionBy("bucket").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "bucket",
        (F.row_number().over(w) - 1).alias("offset"),
    )


@register(
    "topic_stats",
    """
    SELECT event_type AS topic,
           COUNT(*) AS n_events,
           MIN(ts) AS first_ts,
           MAX(ts) AS last_ts,
           COUNT(DISTINCT user_id) AS n_producers,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type
    """,
    "broker",
    doc="Per-topic log stats (topics are implicit values of a column, SURVEY §1.1).",
)
def topic_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.col("event_type").alias("topic"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.count_distinct(F.col("user_id")).alias("n_producers"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )


@register(
    "consumer_poll_batch",
    """
    WITH numbered AS (
      SELECT event_id, user_id, event_type, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS "offset"
      FROM events WHERE event_type = 'click')
    SELECT event_id, user_id, ts, "offset"
    FROM numbered WHERE "offset" >= 5 AND "offset" < 15
    """,
    "broker",
    doc=(
        "Consume path R2/R8: poll the next batch after a committed offset "
        "(committed=5, threshold=10) per key-log, mirroring group_read_queue."
    ),
)
def consumer_poll_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select(
            "event_id",
            "user_id",
            "ts",
            (F.row_number().over(w) - 1).alias("offset"),
        )
        .filter((F.col("offset") >= 5) & (F.col("offset") < 15))
    )


# the bounded slice consumer_lag_report polls-and-commits; shared by
# the query body and its oracle so the two can never desynchronize
_LAG_POLL_BOUND = 10


def _consumer_lag_oracle() -> str:
    # ORACLE-PAIRED since r8: the whole broker flow is re-derived in
    # pure DuckDB SQL. The produce path routes each record with the JVM
    # fast path's pmod(F.hash(key), buckets) — re-derived bit-exactly by
    # spark_hash32_oracle_ctes (Murmur3_x86_32 seed 42, fuzzed against
    # the Python twin in tests/test_tokens.py) — so high_watermark is a
    # per-bucket count; the bounded poll serves min(hw, bound) per
    # bucket and the manual commit acks exactly that, so committed/lag
    # follow arithmetically. Bucket count and poll bound come from the
    # SAME sources the query body uses (EngineConfig.buckets /
    # _LAG_POLL_BOUND), not literals, so a config change cannot
    # desynchronize oracle and driver.
    from barco_spark.config import EngineConfig
    from barco_spark.functions.tokens import spark_hash32_oracle_ctes

    buckets = EngineConfig().buckets
    bound = _LAG_POLL_BOUND
    ctes = spark_hash32_oracle_ctes(
        keys_cte="keys", key_col="pk", num_buckets=buckets
    )
    return f"""
    WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS pk FROM events),
    keys AS (SELECT DISTINCT pk FROM ev),
    {ctes},
    counts AS (
      SELECT bucket, COUNT(*) AS hw
      FROM ev JOIN sb_out USING (pk)
      GROUP BY bucket)
    SELECT 'clicks' AS topic,
           CAST(b.range AS BIGINT) AS bucket,
           CAST(COALESCE(c.hw, 0) AS BIGINT) AS high_watermark,
           CAST(LEAST(COALESCE(c.hw, 0), {bound}) AS BIGINT) AS committed,
           CAST(COALESCE(c.hw, 0) - LEAST(COALESCE(c.hw, 0), {bound}) AS BIGINT)
             AS lag
    FROM range({buckets}) b LEFT JOIN counts c ON c.bucket = b.range
    """


@register(
    "consumer_lag_report",
    _consumer_lag_oracle(),
    "broker",
    doc=(
        "Consumer-lag observability (C9 metrics / R11 high watermark) "
        "driven through the REAL broker machinery: the builder "
        "produces a keyed batch into a temp EventLog, a consumer "
        "group polls-and-commits a bounded slice, and the returned "
        "frame is per-bucket (high_watermark, committed, lag) — the "
        "exact readout the reference's metrics endpoint serves. "
        "Watermarks come from parquet footer stats (no data scan); "
        "the report itself is bucket-count-sized. ORACLE-PAIRED since "
        "r8: the oracle re-derives the keyed routing (Spark Murmur3 "
        "x86_32 in pure DuckDB SQL) + watermark/commit arithmetic, so "
        "the driver hash-compares every bucket's lag bit-for-bit."
    ),
)
def consumer_lag_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile

    from barco_spark.sources.eventlog import EventLog

    tmp = tempfile.mkdtemp(prefix="lag-report-")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    log = EventLog(spark, tmp + "/log")
    ev = t(spark, sf_dir, "events").selectExpr(
        "cast(user_id as string) AS partition_key",
        "props AS payload",
    )
    log.produce("clicks", ev)
    log.register("g", ["clicks"], reset="earliest")
    # consume a bounded slice (served watermark tracked by the
    # commit-previous-on-poll flow), then durably ack it via the
    # manual-commit surface (R12) — the remainder shows as lag
    log.poll("g", "clicks", max_records_per_bucket=_LAG_POLL_BOUND)
    log.commit_served("g", "clicks")
    return log.lag("g", "clicks")
