"""Event-time windowed analytics over streams.

The reference stores timestamps but never interprets them (SURVEY.md
§1.2 "Time": no watermarks, no event-time windows anywhere). These are
the streaming-analytics operators a Spark-native engine adds on top:
watermarked tumbling/sliding/session windows and stateful dedup.

Scale notes: state is keyed (watermark bounds state size); windowed
aggregation is partial-aggregated before the shuffle; dedup state is
dropped once the watermark passes (dropDuplicatesWithinWatermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    window_size: str = "1 hour",
    watermark: str = "1 hour",
    ts_col: str = "timestamp",
    key_col: str | None = "topic",
) -> DataFrame:
    keys = [F.window(F.col(ts_col), window_size).alias("window")]
    if key_col:
        keys.append(F.col(key_col))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *([F.col(key_col)] if key_col else []),
            F.col("n"),
        )
    )


def sliding_counts(
    events: DataFrame,
    window_size: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "1 hour",
    ts_col: str = "timestamp",
) -> DataFrame:
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_size, slide).alias("window"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            F.col("n"),
        )
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "timestamp",
    key_col: str = "partition_key",
) -> DataFrame:
    """Gap-based session windows (F.session_window) per key."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("session"),
            F.col(key_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            F.col(key_col),
            F.col("n_events"),
        )
    )


def stream_dedup(
    events: DataFrame,
    keys: list[str],
    watermark: str = "1 hour",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Stateful exact dedup on a stream.

    Drops duplicate (keys) rows whose event times fall within the
    watermark window; state is evicted as the watermark advances, so
    memory is bounded at any scale.
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "timestamp",
    right_ts: str = "timestamp",
    within: str = "1 hour",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi join with an event-time bound.

    Both sides are watermarked so Spark can bound the join state: a
    right row is retained only until `left_ts` could still fall within
    `[right_ts, right_ts + within]`. This is the streaming analogue of
    the as-of/range join family — state size is O(watermark window),
    not O(stream length), at any scale.
    """
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    # backtick-quote caller-supplied names so columns with spaces/dots
    # or reserved words parse correctly
    cond = (
        (F.col(f"l.`{key}`") == F.col(f"r.`{key}`"))
        & (F.col(f"l.`{left_ts}`") >= F.col(f"r.`{right_ts}`"))
        & (
            F.col(f"l.`{left_ts}`")
            <= F.col(f"r.`{right_ts}`") + F.expr(f"INTERVAL {within}")
        )
    )
    return lw.join(rw, cond, how)
