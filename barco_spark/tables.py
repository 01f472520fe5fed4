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


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Parquet scan => Catalyst gets pushdown + pruning.

    `events.parquet` stores TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects by default; read nanos as long and convert to a
    micros timestamp (truncation matches DuckDB's nanos->micros read).
    """
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name in TABLE_NAMES:
        t(spark, sf_dir, name).createOrReplaceTempView(name)
