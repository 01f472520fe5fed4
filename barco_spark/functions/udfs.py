"""UDF / UDAF / UDTF surface (SURVEY.md §2.7 last row — ABSENT in the
reference, required of the engine).

Demonstrated Spark-first, worst-to-best performance order:
- Python UDTF (table function) for row-expanding transforms;
- grouped applyInPandas for per-group model-ish logic;
- scalar pandas UDFs (Arrow-vectorized) for row-wise Python;
- and everywhere possible, no UDF at all (JVM built-ins).

`pandas_token_count` is registered with a DuckDB oracle to prove the
UDF path produces engine-equal results (integer outputs only, so Arrow
transfer cannot perturb them).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import IntegerType

from barco_spark.registry import register
from barco_spark.tables import t


@pandas_udf(IntegerType())
def token_count_pudf(texts: pd.Series) -> pd.Series:
    """Arrow-vectorized whitespace token count."""
    return texts.str.split(" ").map(len).astype("int32")


@register(
    "pandas_udf_token_count",
    """
    SELECT lang,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY lang
    """,
    "udf",
    doc="Scalar pandas UDF (Arrow batches) aggregated per lang; "
    "integer-exact so it hash-matches the oracle.",
)
def pandas_udf_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "documents")
        .select("lang", token_count_pudf(F.col("text")).alias("n_tokens"))
        .groupBy("lang")
        .agg(
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def zscore_per_group(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Grouped-map applyInPandas: z-score values within each group.

    The per-group pandas function is arbitrary Python (model scoring,
    sklearn transforms, ...); Spark shuffles once on the group key and
    streams Arrow batches per group.
    """
    out_schema = f"{group_col} string, {value_col} double, zscore double"

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col]
        std = v.std(ddof=1)
        pdf = pdf.copy()
        pdf["zscore"] = 0.0 if (std != std or std == 0) else (v - v.mean()) / std
        return pdf[[group_col, value_col, "zscore"]]

    return df.groupBy(group_col).applyInPandas(norm, out_schema)


@udtf(returnType="word: string, pos: int")
class SplitWords:
    """Python UDTF: explode a text into (word, position) rows."""

    def eval(self, text: str):  # noqa: D102
        for i, w in enumerate((text or "").split(" ")):
            if w:
                yield (w, i)
