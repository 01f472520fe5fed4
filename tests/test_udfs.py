"""UDF surface tests: scalar pandas UDF, applyInPandas, UDTF, vector UDFs."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from barco_spark.functions.udfs import SplitWords, token_count_pudf, zscore_per_group
from barco_spark.functions.vectors import cosine_udf
from barco_spark.tables import t


def test_pandas_udf_matches_builtin(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select(
        token_count_pudf(F.col("text")).alias("pudf"),
        F.size(F.split(F.col("text"), " ")).alias("builtin"),
    )
    assert d.filter(F.col("pudf") != F.col("builtin")).count() == 0


def test_apply_in_pandas_zscore(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0), ("b", 10.0)],
        ["grp", "val"],
    )
    out = {
        (r["grp"], r["val"]): r["zscore"]
        for r in zscore_per_group(df, "grp", "val").collect()
    }
    assert abs(out[("a", 2.0)]) < 1e-12  # mean of group a
    assert abs(out[("a", 3.0)] - 1.0) < 1e-12  # std=1 -> one sigma
    assert out[("b", 10.0)] == 0.0  # zero-variance group guarded


def test_udtf_split_words(spark):
    spark.udtf.register("split_words", SplitWords)
    rows = spark.sql(
        "SELECT w.word, w.pos FROM LATERAL split_words('hello brave new world') AS w"
    ).collect()
    assert [(r["word"], r["pos"]) for r in rows] == [
        ("hello", 0),
        ("brave", 1),
        ("new", 2),
        ("world", 3),
    ]


def test_cosine_udf_agrees_with_jvm_fold(spark, sf_dir):
    from barco_spark.operators.similarity import dot, norm2

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    a = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("ia"), F.col("v").alias("va")
    )
    b = e.filter((F.col("vec_id") >= 3) & (F.col("vec_id") < 6)).select(
        F.col("vec_id").alias("ib"), F.col("v").alias("vb")
    )
    pairs = a.crossJoin(b)
    rows = pairs.select(
        (dot("va", "vb") / F.sqrt(norm2("va") * norm2("vb"))).alias("jvm"),
        cosine_udf()(F.col("va"), F.col("vb")).alias("pudf"),
    ).collect()
    assert rows
    for r in rows:
        assert math.isclose(r["jvm"], r["pudf"], rel_tol=1e-9)
