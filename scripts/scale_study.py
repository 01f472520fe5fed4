"""Synthetic-corpus scale study harness (the rounds-3..7 recipe,
now committed instead of ad-hoc): zipf-ish 1000-word vocab, ~90-word
docs, 5% planted shifted duplicates; optional isotropic gaussian
embeddings with 2% planted near-dups. Runs named registry queries over
5k/50k/500k-doc corpora on local[32] with a noop sink, best of two
(single run at 500k), cold cache per run — identical methodology to
every committed SCALING.md table.

Usage:
    python scripts/scale_study.py pagerank_similarity_graph [more...] \
        [--sizes 5000,50000,500000] [--embeddings]
Prints one JSON line per (query, size).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(spark, out_dir: str, n_docs: int, embeddings: bool) -> None:
    from pyspark.sql import functions as F

    words = 90
    vocab = 1000
    # zipf-ish: rank ~ (uniform^2 * vocab) skews mass to low ranks
    doc = (
        spark.range(n_docs)
        .withColumn(
            "text",
            F.concat_ws(
                " ",
                *[
                    F.concat(
                        F.lit("w"),
                        (
                            F.pow(
                                F.pmod(F.hash(F.col("id") * 1000 + i), 10_000)
                                / 10_000.0,
                                2.0,
                            )
                            * vocab
                        ).cast("int").cast("string"),
                    )
                    for i in range(words)
                ],
            ),
        )
        .withColumn("lang", F.lit("en"))
        .withColumn("source", F.concat(F.lit("s"), (F.col("id") % 7).cast("string")))
    )
    # 5% planted near-duplicates: copy of doc i with the first word
    # shifted (same shape the LSH banding must catch)
    dups = (
        doc.filter(F.col("id") % 20 == 0)
        .withColumn("id", F.col("id") + n_docs)
        .withColumn("text", F.concat(F.lit("wshift "), F.expr("substring(text, 8)")))
    )
    out = doc.unionByName(dups).select(
        F.col("id").alias("doc_id"),
        "text",
        "lang",
        "source",
        F.length("text").cast("long").alias("n_chars"),
    )
    out.write.mode("overwrite").parquet(out_dir + "/documents.parquet")
    if embeddings:
        dim = 64
        emb = spark.range(n_docs).select(
            F.col("id").alias("vec_id"),
            F.array(
                *[
                    (F.pmod(F.hash(F.col("id") * 131 + d), 2000) / 1000.0 - 1.0)
                    for d in range(dim)
                ]
            ).alias("embedding"),
            (F.col("id") % 10).cast("string").alias("label"),
        )
        near = (
            emb.filter(F.col("vec_id") % 50 == 0)
            .withColumn("vec_id", F.col("vec_id") + n_docs)
            .withColumn(
                "embedding",
                F.transform("embedding", lambda x: x + F.lit(0.01)),
            )
        )
        emb.unionByName(near).write.mode("overwrite").parquet(
            out_dir + "/embeddings.parquet"
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sizes", default="5000,50000,500000")
    ap.add_argument("--embeddings", action="store_true")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    from barco_spark.registry import load_all
    from barco_spark.session import free_persistent_rdds, get_spark, persistent_rdd_ids

    specs = load_all()
    spark = get_spark(app_name="scale-study")
    spark.sparkContext.setLogLevel("ERROR")

    def run_once(name: str, sf_dir: str) -> float:
        spark.catalog.clearCache()
        free_persistent_rdds(spark)
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.3)
        t0 = time.perf_counter()
        specs[name].build(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    for n in sizes:
        with tempfile.TemporaryDirectory(prefix=f"scale-{n}-") as d:
            build_corpus(spark, d, n, args.embeddings)
            for name in args.queries:
                reps = 1 if n >= 500_000 else 2
                t = min(run_once(name, d) for _ in range(reps))
                leaked = len(persistent_rdd_ids(spark))
                free_persistent_rdds(spark)
                print(
                    json.dumps(
                        {
                            "query": name,
                            "docs": n,
                            "sec": round(t, 1),
                            "persisted_rdds_after": leaked,
                        }
                    ),
                    flush=True,
                )
    spark.stop()


if __name__ == "__main__":
    main()
