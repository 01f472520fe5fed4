"""Bucketed warehouse tables: co-located joins with zero shuffle.

At 100 TB the dominant cost of a fact-fact join is shuffling both
sides. Writing both tables bucketed (and sorted) by the join key means
Spark's scan already satisfies the join's distribution requirement —
the SortMergeJoin runs with NO exchange on either side.

This is the Spark analogue of the reference's ring co-location: records
with the same key live in the same bucket file of both tables
(SURVEY.md §1.1 token ring -> bucketBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 12,
    sort: bool = True,
) -> None:
    """Save as a bucketed (+sorted) managed table."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables; plan contains no Exchange."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, key)
