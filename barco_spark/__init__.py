"""barco_spark — a PySpark-native analytics engine with the capabilities of
barcostreams/barco (PolarStreams), re-expressed Spark-first.

The reference (/root/reference) is a Kafka-class event-streaming broker:
topics, partition-key → murmur3 token placement, append-only compressed
segment logs, consumer groups with committed offsets.  This package maps
those semantics onto Spark:

- topic            -> value of a `topic` column / sink directory partition
- token/bucket     -> hash-bucketed repartition (`functions.tokens`)
- segment/chunk    -> zstd Parquet files (`sources.eventlog`)
- consumer group   -> checkpointed reader with committed offsets
- produce/consume  -> batch + Structured Streaming ingest (`streaming`)

On top of the broker surface it adds the full relational operator
inventory (SURVEY.md §2.7) and LLM-data-pipeline operators (dedup,
similarity search, multimodal columns, text analysis), all designed for
100 TB scale: declarative DataFrame plans, broadcast-able dims, partial
aggregation, no driver-side collects in any hot path.
"""

__version__ = "0.1.0"
