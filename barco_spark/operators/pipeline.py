"""End-to-end training-data curation pipeline.

The north-star use case (BASELINE.json): ingest documents -> quality
filter -> near-duplicate removal -> curated corpus + stats. Composed
entirely from the already-oracle-verified building blocks
(operators/text.py metrics, operators/dedup.py MinHash LSH), so the
whole pipeline is itself oracle-checkable end-to-end.

Dedup strategy is keep-first: for every verified near-dup pair
(doc_a < doc_b, jaccard >= 0.4) the higher id is dropped — an anti
join, no connected-components pass. At 100 TB: metrics are narrow
map work, the LSH band join is the only wide stage, and the final
anti join broadcasts the (small) drop list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from barco_spark.operators.dedup import dedup_minhash_lsh
from barco_spark.operators.text import text_metrics
from barco_spark.registry import QUERIES, register

QUALITY_THRESHOLD = 0.6

# compose the oracle from the registered fragments so both engines run
# literally the same logic (nested CTEs are legal in DuckDB)
def _curated_sql() -> str:
    metrics_sql = QUERIES["text_metrics"].oracle
    pairs_sql = QUERIES["dedup_minhash_lsh"].oracle
    return f"""
    WITH metrics AS ({metrics_sql}),
    pairs AS ({pairs_sql})
    SELECT doc_id, lang, n_tokens, quality_score
    FROM metrics
    WHERE quality_score >= {QUALITY_THRESHOLD}
      AND doc_id NOT IN (SELECT doc_b FROM pairs)
    """


def _stats_sql() -> str:
    return f"""
    WITH metrics AS ({QUERIES["text_metrics"].oracle}),
    pairs AS ({QUERIES["dedup_minhash_lsh"].oracle}),
    flagged AS (
      SELECT m.*,
             (quality_score < {QUALITY_THRESHOLD}) AS low_quality,
             doc_id IN (SELECT doc_b FROM pairs) AS near_dup
      FROM metrics m)
    SELECT lang,
           COUNT(*) AS n_input,
           SUM(CASE WHEN low_quality THEN 1 ELSE 0 END) AS dropped_quality,
           SUM(CASE WHEN NOT low_quality AND near_dup THEN 1 ELSE 0 END) AS dropped_dup,
           SUM(CASE WHEN NOT low_quality AND NOT near_dup THEN 1 ELSE 0 END) AS n_kept,
           SUM(CASE WHEN NOT low_quality AND NOT near_dup THEN n_tokens ELSE 0 END) AS tokens_kept
    FROM flagged
    GROUP BY lang
    """


def curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curated corpus: quality-filtered, near-dup-free document set."""
    metrics = text_metrics(spark, sf_dir)
    drop = dedup_minhash_lsh(spark, sf_dir).select(
        F.col("doc_b").alias("doc_id")
    ).distinct()
    return (
        metrics.filter(F.col("quality_score") >= QUALITY_THRESHOLD)
        .join(F.broadcast(drop), "doc_id", "left_anti")
        .select("doc_id", "lang", "n_tokens", "quality_score")
    )


@register(
    "curation_pipeline",
    _curated_sql(),
    "pipeline",
    doc="End-to-end curation: quality filter + MinHash near-dup removal "
    "(keep-first), composed from oracle-verified fragments.",
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curate(spark, sf_dir)


@register(
    "curation_stats",
    _stats_sql(),
    "pipeline",
    doc="Per-language curation funnel: input / dropped-by-quality / "
    "dropped-as-dup / kept / tokens kept.",
)
def curation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    metrics = text_metrics(spark, sf_dir)
    dup_ids = dedup_minhash_lsh(spark, sf_dir).select(
        F.col("doc_b").alias("doc_id")
    ).distinct().withColumn("near_dup", F.lit(True))
    flagged = (
        metrics.join(F.broadcast(dup_ids), "doc_id", "left")
        .withColumn("near_dup", F.coalesce(F.col("near_dup"), F.lit(False)))
        .withColumn("low_quality", F.col("quality_score") < QUALITY_THRESHOLD)
    )
    keep = ~F.col("low_quality") & ~F.col("near_dup")
    return flagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_input"),
        F.sum(F.when(F.col("low_quality"), 1).otherwise(0)).alias("dropped_quality"),
        F.sum(F.when(~F.col("low_quality") & F.col("near_dup"), 1).otherwise(0)).alias(
            "dropped_dup"
        ),
        F.sum(F.when(keep, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(keep, F.col("n_tokens")).otherwise(0)).alias("tokens_kept"),
    )
