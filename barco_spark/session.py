"""SparkSession factory with scale-oriented defaults.

Every knob here is chosen for the 100 TB design point and merely
*tested* on local[N]:

- AQE on (runtime coalescing + skew-join splitting replaces the
  reference's manual range split/join, SURVEY.md C6/C7).
- zstd Parquet (the reference compresses every chunk with zstd,
  /root/reference/internal/producing/coalescer.go:174-198).
- Arrow enabled so any unavoidable Python stage is batch-vectorized.
- Session timezone pinned to UTC so timestamp semantics are stable
  across engines (the oracle runs in DuckDB).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "barco-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Naive parquet timestamps must read as TIMESTAMP (instant), not
        # TIMESTAMP_NTZ: unix_micros()/window() sites and the DuckDB
        # oracle both treat stored micros as UTC epoch micros.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # NOTE: a 64 MB threshold is sized against PARQUET bytes, but
        # the driver must hold the DESERIALIZED relation — array/text
        # payloads (LSH shingle signatures) deserialize ~15x their
        # pruned zstd estimate, so corpus-sized join sides in the
        # dedup/similarity family carry explicit SHUFFLE_HASH hints
        # instead of trusting estimates (measured: graph_kcore at 500k
        # synthetic docs OOM'd the 8g driver on a "fits 64 MB"
        # broadcast before the hints; 212 s after).
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
        # columnar-cache batches: the default 10k rows per batch makes
        # persist() of wide string payloads (the produce buffer) pay
        # ~4x in batch bookkeeping; 100k rows amortizes it (measured
        # 87k -> 330k+ msgs/s on the 1 KiB keyed-produce bench)
        .config("spark.sql.inMemoryColumnarStorage.batchSize", "100000")
        # ContextCleaner frees shuffle files / broadcasts only when the
        # driver JVM actually GCs (weak-ref queue); with a large heap
        # that can take ages, and a long-lived session serving many
        # queries accumulates dead shuffle state that slows later
        # queries (measured ~1.5-2x on query 22+ of a 43-query suite).
        # The default periodic GC is 30min — far longer than a suite.
        .config("spark.cleaner.periodicGC.interval", "5min")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


# --------------------------------------------------------------------------
# Persistent-RDD block hygiene
#
# `spark.catalog.clearCache()` drops DataFrame/table cache entries but NOT
# RDD-level blocks created by `localCheckpoint()` — those live in the block
# manager until the RDD is unpersisted or the session dies.  Iterative
# operators (label propagation, k-means) checkpoint per round; in a
# long-lived session serving many queries the leaked blocks accumulate
# into executor memory pressure that slows every later query.  These
# helpers let an operator free exactly the blocks it created once its
# result no longer depends on them, and let a session owner (the bench,
# a facade) reclaim everything between requests.
# --------------------------------------------------------------------------


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Snapshot the ids of all currently-persisted RDDs (incl. blocks
    pinned by ``localCheckpoint``, which ``catalog.clearCache`` misses)."""
    return set(spark.sparkContext._jsc.getPersistentRDDs().keys())


def unpersist_rdds(
    spark: SparkSession, ids: set[int], blocking: bool = False
) -> int:
    """Unpersist the given RDD ids if still held; returns how many were
    freed.  Safe on ids that were already released."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    freed = 0
    for rid in ids:
        jrdd = jmap.get(rid)
        if jrdd is not None:
            jrdd.unpersist(blocking)
            freed += 1
    return freed


def free_persistent_rdds(spark: SparkSession, blocking: bool = False) -> int:
    """Release EVERY persisted RDD block (checkpoints included).  For
    session owners between independent requests — never inside an
    operator, which must free only the blocks it created."""
    return unpersist_rdds(spark, persistent_rdd_ids(spark), blocking)


def eager_persist(df):
    """persist() + materialize NOW (one count job); returns df.

    A cached relation referenced MORE THAN ONCE inside a single action
    must be materialized before that action runs: Spark 4.1's AQE plans
    one TableCacheQueryStage per reference, and when the cache is not
    yet populated those stages can EACH recompute the full subtree
    instead of sharing one materialization (measured r12: the LSH
    signature pass ran up to 8x inside one action — 21.0 s vs 4.6 s
    cold, and 4 sequential ~1.2 s recomputes even warm).  One count()
    over the freshly persisted frame makes the cache state
    deterministic: compute once, read N times.  The count job itself
    IS the materialization pass — it adds no second computation.
    """
    df.persist()
    df.count()
    return df


def local_rows_df(spark: SparkSession, rows, ddl: str):
    """Driver-local rows -> DataFrame via the pandas/Arrow fast path.

    ``spark.createDataFrame(list, ddl)`` pickles the rows into an RDD
    sliced across defaultParallelism and spins one Python worker per
    partition just to unpickle them — measured r12: 0.58-4.3 s of
    worker setup for a 477-row result (32 near-empty partitions),
    vs 0.13-0.27 s through pandas/Arrow, where the JVM reads the
    Arrow batch directly and no Python worker ever starts.  Only for
    flat numeric/string schemas (DDL "name type, ..."); rows may be
    tuples or Rows.
    """
    import pyarrow as pa

    # A pyarrow Table (not pandas): Spark 4 reads it directly, and —
    # unlike the pandas path, which follows the pandas missing-value
    # convention — a float NaN stays NaN instead of becoming null
    # (r13: mmr degenerate-data arm equality depends on this).
    _pa_types = {
        "long": pa.int64(),
        "bigint": pa.int64(),
        "int": pa.int32(),
        "integer": pa.int32(),
        "double": pa.float64(),
        "float": pa.float32(),
        "string": pa.string(),
        "boolean": pa.bool_(),
    }
    fields = [c.strip().split() for c in ddl.split(",")]
    data = [tuple(r) for r in rows]
    tbl = pa.table(
        {
            name: pa.array([r[i] for r in data], _pa_types[typ.lower()])
            for i, (name, typ) in enumerate(fields)
        }
    )
    return spark.createDataFrame(tbl, schema=ddl)
