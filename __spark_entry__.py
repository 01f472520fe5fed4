"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (TPC-H Q1-style pricing summary) on
  /root/testdata/sf0.001.
- ``queries()``: every implemented operator from SURVEY.md §2 /
  BASELINE.json north star, keyed by name.
- ``oracle_sql()``: DuckDB-equivalent SQL per query (None-oracle ops are
  omitted => rows-only check).

The builders live in barco_spark/operators/*; this module only wires
the registry into the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from barco_spark.registry import load_all

_QUERIES = load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _QUERIES["q1_pricing_summary"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.build for name, spec in _QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in _QUERIES.items() if spec.oracle is not None
    }
