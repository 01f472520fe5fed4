"""Synthetic-corpus scale study harness (the rounds-3..7 recipe,
now committed instead of ad-hoc): zipf-ish 1000-word vocab, ~90-word
docs, 5% planted shifted duplicates; optional isotropic gaussian
embeddings with 2% planted near-dups. Runs named registry queries over
5k/50k/500k-doc corpora on local[32] with a noop sink, best of two
(single run at 500k), cold cache per run — identical methodology to
every committed SCALING.md table.

Usage:
    python scripts/scale_study.py pagerank_similarity_graph [more...] \
        [--sizes 5000,50000,500000] [--embeddings] [--events]
Prints one JSON line per (query, size).

``--events`` builds an events table INSTEAD of documents (sizes are
event counts): the warehouse shape (event_id, ts, user_id, event_type,
value, props) with 6 zipf-weighted event types and ~n/10 distinct
users — the input geometry of the KMV sketches and the broker-path
aggregates.
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


def build_events(spark, out_dir: str, n_events: int) -> None:
    """Warehouse-shaped events table at n_events rows: 6 zipf-weighted
    event types (view 45%, click 25%, add_to_cart 12%, purchase 8%,
    search 6%, share 4% — the sf0.1 mix), ~n/10 distinct users."""
    from pyspark.sql import functions as F

    n_users = max(1, n_events // 10)
    bucket = F.pmod(F.hash((F.col("id") * 2654435761) % 1_000_003), 100)
    etype = (
        F.when(bucket < 45, "view")
        .when(bucket < 70, "click")
        .when(bucket < 82, "add_to_cart")
        .when(bucket < 90, "purchase")
        .when(bucket < 96, "search")
        .otherwise("share")
    )
    ev = spark.range(n_events).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000) + F.col("id") * 1_000
        ).alias("ts"),
        F.pmod(F.hash(F.col("id") * 131), n_users).alias("user_id"),
        etype.alias("event_type"),
        (F.pmod(F.hash(F.col("id") * 17), 10_000) / 100.0).alias("value"),
        F.lit('{"k":1}').alias("props"),
    )
    ev.write.mode("overwrite").parquet(out_dir + "/events.parquet")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sizes", default="5000,50000,500000")
    ap.add_argument("--embeddings", action="store_true")
    ap.add_argument("--events", action="store_true")
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
            if args.events:
                build_events(spark, d, n)
            else:
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
