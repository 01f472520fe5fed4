"""Query registry: every operator the engine claims, with its oracle.

Each entry pairs a Spark DataFrame builder `(spark, sf_dir) -> DataFrame`
with the equivalent ANSI SQL that DuckDB runs on the same parquet views.
The driver hash-compares the two at sf0.01 (CORRECTNESS gate); the local
mirror of that gate is tests/test_oracle_parity.py.

Float determinism convention: money aggregates are computed in
DECIMAL(18,2) (exact, order-independent) and cast to DOUBLE at the end;
averages are exact-decimal-sum / count in DOUBLE; cumulative/windowed
double sums rely on a total ordering so both engines fold in the same
order. Every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible, rows-only check
    category: str
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None, category: str, doc: str = ""
) -> Callable[[Callable], Callable]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        if name in QUERIES:
            # A duplicate name silently shadows the earlier entry (dict
            # overwrite), turning a complete, oracled query into dead code
            # that no gate can see. Fail loudly at import time instead.
            raise ValueError(
                f"duplicate query registration: {name!r} is already "
                f"registered (category={QUERIES[name].category!r}); "
                "rename one of the two"
            )
        QUERIES[name] = QuerySpec(name, fn, oracle, category, doc)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module so their @register calls run."""
    import barco_spark.operators.relational  # noqa: F401
    import barco_spark.operators.relational2  # noqa: F401
    import barco_spark.operators.relational3  # noqa: F401
    import barco_spark.operators.windows  # noqa: F401
    import barco_spark.operators.broker  # noqa: F401
    import barco_spark.operators.dedup  # noqa: F401
    import barco_spark.operators.similarity  # noqa: F401
    import barco_spark.operators.ann_index  # noqa: F401
    import barco_spark.operators.pq  # noqa: F401
    import barco_spark.operators.kmeans_int8  # noqa: F401
    import barco_spark.operators.text  # noqa: F401
    import barco_spark.operators.quality  # noqa: F401
    import barco_spark.operators.corpus_lm  # noqa: F401
    import barco_spark.operators.dsir  # noqa: F401
    import barco_spark.operators.graph  # noqa: F401
    import barco_spark.functions.udfs  # noqa: F401
    import barco_spark.operators.pipeline  # noqa: F401
    import barco_spark.operators.sampling  # noqa: F401
    import barco_spark.multimodal.audio  # noqa: F401
    import barco_spark.multimodal.media  # noqa: F401
    import barco_spark.streaming.pipeline  # noqa: F401

    return QUERIES
