"""Structured Streaming produce/consume over the EventLog layout.

Mapping (SURVEY.md §3.1/§3.2 -> Spark):

- coalescer micro-batching (W1, internal/producing/coalescer.go:81-172)
  -> micro-batch trigger; each foreachBatch invocation is one
  "coalescer group": it assigns contiguous per-bucket offsets and
  appends zstd parquet, exactly like the batch produce path.
- consumer group + committed offsets (R8,
  internal/consuming/offset_state.go) -> one streaming query per group
  with its own checkpointLocation; Spark's commit log IS the offset
  store, upgraded from at-least-once to exactly-once.
- reset policy (R9) -> start position of the file source: a fresh
  checkpoint reads everything present (earliest); `latest` is
  emulated by recording the current watermark first.
- ConsumerReadThreshold (R2, 2 MiB polls) -> maxFilesPerTrigger /
  maxBytesPerTrigger rate limits.
- end-of-stream detection (R11, MaxProducedOffset) ->
  Trigger.AvailableNow.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from barco_spark.sources.eventlog import EVENT_SCHEMA, EventLog


def stream_produce(
    log: EventLog,
    source: DataFrame,
    topic: str,
    checkpoint: str,
    key_col: str = "partition_key",
    payload_col: str = "payload",
    trigger: dict | None = None,
) -> StreamingQuery:
    """Run a streaming source into the event log (produce path).

    Each micro-batch is one coalescer group (W1): bucket-route, assign
    contiguous offsets continuing from the log's high watermark, append.
    The checkpoint makes the produce exactly-once per source record.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        cols = [F.col(payload_col).cast("string").alias("payload")]
        if key_col in batch_df.columns:
            cols.insert(0, F.col(key_col).cast("string").alias("partition_key"))
        else:
            cols.insert(0, F.lit(None).cast("string").alias("partition_key"))
        if "timestamp" in batch_df.columns:
            cols.append(F.col("timestamp"))
        log.produce(topic, batch_df.select(*cols), return_count=False)

    writer = source.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    trigger = trigger or {"availableNow": True}
    return writer.trigger(**trigger).start()


def stream_consume(
    log: EventLog,
    topic: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Unbounded DataFrame of a topic's records (consume path).

    readStream over the log's parquet files; `topic=` directory
    partition prunes the scan to one topic. Rate-limit with
    maxFilesPerTrigger (the 2 MiB ConsumerReadThreshold analogue).
    """
    reader = log.spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return (
        reader.option("basePath", f"{log.root}/data")
        .parquet(f"{log.root}/data")
        .filter(F.col("topic") == topic)
    )


def consumer_group_query(
    log: EventLog,
    topic: str,
    group: str,
    checkpoint_root: str,
    sink: Callable[[DataFrame, int], None],
    trigger: dict | None = None,
) -> StreamingQuery:
    """One consumer group = one checkpointed streaming query (R8).

    The checkpoint dir (keyed by group name) is the durable committed
    offset; restarting the query resumes after the last committed batch
    — the streaming analogue of offset_state.Get/Set.
    """
    stream = stream_consume(log, topic)
    trigger = trigger or {"availableNow": True}
    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{checkpoint_root}/{group}")
        .trigger(**trigger)
        .start()
    )
