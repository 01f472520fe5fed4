"""Incremental IVF index append: no rebuild, touched cells only."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from barco_spark.operators.ann_index import (
    ivf_index_append,
    ivf_index_search,
    ivf_index_write,
)
from barco_spark.operators.similarity import N_QUERY
from barco_spark.tables import t


def test_ivf_append_is_searchable_and_rebuild_free(spark, sf_dir, tmp_path):
    index_path = str(tmp_path / "ivf")
    n0 = ivf_index_write(spark, sf_dir, index_path)

    corpus_dir = f"{index_path}/corpus"
    files_before = {
        os.path.join(r, f)
        for r, _, fs in os.walk(corpus_dir)
        for f in fs
        if f.endswith(".parquet")
    }

    # append an exact copy of query 0's vector under a fresh id: after
    # the append it MUST be query 0's rank-1 neighbor (cosine == 1.0)
    q0 = (
        t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select(
            F.lit(999_999).alias("cand_id"),
            F.col("embedding").cast("array<double>").alias("cv"),
        )
    )
    appended = ivf_index_append(spark, index_path, q0)
    assert appended == 1

    # append-only: every pre-existing file still present (no rewrite)
    files_after = {
        os.path.join(r, f)
        for r, _, fs in os.walk(corpus_dir)
        for f in fs
        if f.endswith(".parquet")
    }
    assert files_before <= files_after
    assert len(files_after) == len(files_before) + 1  # one touched cell

    # row accounting
    total = spark.read.parquet(corpus_dir).count()
    assert total == n0 + 1

    queries = (
        t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < N_QUERY)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("qv"),
        )
    )
    hits = ivf_index_search(spark, index_path, queries).collect()
    top0 = [r for r in hits if r["query_id"] == 0 and r["rank"] == 1][0]
    assert top0["cand_id"] == 999_999
    assert abs(top0["cosine_sim"] - 1.0) < 1e-12
