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
