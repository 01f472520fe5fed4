"""Salting transforms must be invisible to results."""

from __future__ import annotations

from pyspark.sql import functions as F

from barco_spark.functions.skew import key_histogram, salted_agg, salted_join
from barco_spark.tables import t


def _skewed_df(spark):
    # one hot key carrying 90% of rows
    hot = spark.range(900).select(
        F.lit("hot").alias("k"), (F.col("id") % 7).cast("double").alias("v")
    )
    cold = spark.range(100).select(
        F.concat(F.lit("cold"), F.col("id") % 10).alias("k"),
        (F.col("id") % 5).cast("double").alias("v"),
    )
    return hot.unionByName(cold)


def test_salted_agg_equals_plain(spark):
    df = _skewed_df(spark)
    plain = {
        (r["k"],): (r["n"], r["total"], r["mx"])
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("total"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r["k"],): (r["n"], r["total"], r["mx"])
        for r in salted_agg(
            df, ["k"], {"n": "count(*)", "total": "sum(v)", "mx": "max(v)"}
        ).collect()
    }
    assert plain == salted


def test_salted_join_equals_plain(spark):
    facts = _skewed_df(spark)
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"cold{i}", f"C{i}") for i in range(10)], ["k", "label"]
    )
    plain = sorted(
        (r["k"], r["v"], r["label"]) for r in facts.join(dim, "k").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["label"])
        for r in salted_join(facts, dim, "k").collect()
    )
    assert plain == salted


def test_key_histogram_finds_hot_key(spark):
    df = _skewed_df(spark)
    top = key_histogram(df, "k", top=1).collect()
    assert top[0]["key"] == "hot"
    assert top[0]["n"] == 900


def test_key_histogram_on_events(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    rows = key_histogram(ev, "user_id", top=5).collect()
    assert len(rows) == 5
    assert rows[0]["n"] >= rows[-1]["n"]
