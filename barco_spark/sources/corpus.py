"""Corpus ingestion: raw files -> the `documents` table shape.

The analytical operators all consume the canonical documents schema
(doc_id, text, lang, source, n_chars — TESTDATA.md). Real corpora
arrive as directories of text files or JSONL dumps; these loaders land
both in that shape with Spark's built-in sources, so every registered
operator (dedup, quality, decontamination, packing, ...) runs on them
unchanged.

Scale posture: both paths are pure built-in sources (distributed
listing / size-based splits / schema projection), a per-row map for
ids, and no driver-side iteration. `wholetext` keeps one file = one
document (a 100 GB shard directory becomes one task per file);
JSONL splits by lines within files, so huge dumps parallelize finer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

# JSONL field layout accepted by corpus_from_jsonl (missing fields
# default: lang NULL, source from the file's directory name)
_JSONL_READ_SCHEMA = StructType(
    [
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
    ]
)


def _finish(df: DataFrame, id_col, source_col) -> DataFrame:
    return df.select(
        id_col.alias("doc_id"),
        F.col("text"),
        F.col("lang").cast("string").alias("lang"),
        source_col.alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )


def corpus_from_text_files(
    spark: SparkSession, path: str, glob: str = "*.txt", lang: str | None = None
) -> DataFrame:
    """One document per file via the built-in `text` source (wholetext).

    doc_id = 64-bit hash of the file path (stable across runs);
    source = the file's parent directory name.
    """
    df = (
        spark.read.option("wholetext", "true")
        .option("pathGlobFilter", glob)
        .text(path)
        .select(
            F.col("value").alias("text"),
            F.input_file_name().alias("_path"),
            F.lit(lang).cast("string").alias("lang"),
        )
    )
    return _finish(
        df,
        F.xxhash64(F.col("_path")),
        F.element_at(F.split(F.col("_path"), "/"), -2),
    )


def corpus_from_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Documents from JSONL dumps ({"text": ..., "lang"?, "source"?}).

    An explicit read schema keeps the scan single-pass (no inference
    job) and projection-pruned. doc_id = hash of (file, text) so
    re-sharding the dump does not renumber unchanged documents.
    """
    df = (
        spark.read.schema(_JSONL_READ_SCHEMA)
        .json(path)
        .filter(F.col("text").isNotNull())
        .select(
            "text",
            "lang",
            F.coalesce(
                F.col("source"),
                F.element_at(F.split(F.input_file_name(), "/"), -2),
            ).alias("_src"),
            F.input_file_name().alias("_path"),
        )
    )
    return _finish(
        df,
        F.xxhash64(F.col("_path"), F.col("text")),
        F.col("_src"),
    )
