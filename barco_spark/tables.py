"""Table loading helpers for the driver-generated parquet testdata."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# schema cache: the metastore role. Inferring a parquet schema re-reads
# footers on every plan build; a warehouse knows its table schemas. The
# first load of a (dir, table) infers and caches; later builds read
# with the explicit schema (no footer I/O at plan time).
_SCHEMA_CACHE: dict[tuple[str, str], object] = {}


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Parquet scan => Catalyst gets pushdown + pruning.

    `events.parquet` stores TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects by default; read nanos as long and convert to a
    micros timestamp (truncation matches DuckDB's nanos->micros read).
    """
    path = f"{sf_dir}/{name}.parquet"
    key = (sf_dir, name)
    # The driver hands us *its* SparkSession, so session.py defaults may
    # not apply: pin the read-side confs here. Naive parquet timestamps
    # must come back as TIMESTAMP (stored micros == UTC epoch micros,
    # matching the DuckDB oracle), never TIMESTAMP_NTZ — Spark >= 3.4
    # infers NTZ by default and unix_micros() rejects it.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        if key in _SCHEMA_CACHE:
            df = spark.read.schema(_SCHEMA_CACHE[key]).parquet(path)
        else:
            df = spark.read.parquet(path)
            _SCHEMA_CACHE[key] = df.schema
        dt = dict(df.dtypes).get("ts")
        if dt == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dt == "timestamp_ntz":
            # Cached-schema or exotic-session fallback; session tz is UTC
            # in get_spark(), so the cast is value-preserving.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    if key in _SCHEMA_CACHE:
        return spark.read.schema(_SCHEMA_CACHE[key]).parquet(path)
    df = spark.read.parquet(path)
    _SCHEMA_CACHE[key] = df.schema
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name in TABLE_NAMES:
        t(spark, sf_dir, name).createOrReplaceTempView(name)
