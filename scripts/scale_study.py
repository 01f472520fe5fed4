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


def build_media(spark, out_dir: str, n_media: int) -> None:
    """MEDIA_SCHEMA-shaped image table at n_media rows, built
    DISTRIBUTEDLY (spark.range -> sha256 blob expression; no driver
    loop, unlike the 120-row demo table) and written to parquet so
    reads come from storage with size-based splits — the
    media_from_files geometry. Same seed scheme as
    multimodal.media.synthetic_media (blob = sha256('media-<i>') x 8,
    width/height cycling 64..288) plus 25% planted duplicates
    (media_id + 1e9, identical pixels), so the phash groupBy has real
    collisions to collapse at every size."""
    from pyspark.sql import functions as F

    digest = F.to_binary(
        F.sha2(F.concat(F.lit("media-"), F.col("id").cast("string")), 256),
        F.lit("hex"),
    )
    base = spark.range(n_media).select(
        F.col("id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.concat(*([digest] * 8)).alias("blob"),
        F.struct(
            F.lit("fake/image").alias("format"),
            (64 + F.pmod(F.col("id"), 8) * 32).cast("int").alias("width"),
            (64 + F.pmod(F.col("id"), 5) * 32).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
    dups = base.filter(F.col("media_id") % 4 == 0).withColumn(
        "media_id", F.col("media_id") + 1_000_000_000
    )
    base.unionByName(dups).write.mode("overwrite").parquet(
        out_dir + "/media.parquet"
    )


def build_audio(spark, out_dir: str, n_media: int) -> None:
    """MEDIA_SCHEMA audio table at n_media rows: REAL RIFF/WAVE blobs
    (synth_wav, 100..1000 ms square waves) synthesized DISTRIBUTEDLY in
    a mapInPandas stage (32-way parallel, no driver loop) and written
    to parquet."""
    import pandas as pd
    from pyspark.sql import functions as F

    from barco_spark.multimodal.audio import synth_wav
    from barco_spark.multimodal.media import MEDIA_SCHEMA

    def synth(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                dur = 100 * (1 + int(i) % 10)
                rows.append(
                    {
                        "media_id": int(i),
                        "kind": "audio",
                        "blob": synth_wav(int(i), dur),
                        "meta": {
                            "format": "audio/wav",
                            "width": None,
                            "height": None,
                            "duration_ms": dur,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    spark.range(n_media).repartition(32).mapInPandas(
        synth, MEDIA_SCHEMA
    ).write.mode("overwrite").parquet(out_dir + "/media.parquet")


def audio_pipeline(spark, sf_dir: str):
    """audio_feature_extract's code path (decode_audio -> duration
    rollup) over the parquet-backed audio table."""
    from pyspark.sql import functions as F

    from barco_spark.multimodal.audio import decode_audio

    audio = spark.read.parquet(sf_dir + "/media.parquet")
    feats = decode_audio(audio)
    return (
        feats.groupBy(F.col("duration_ms").alias("duration_bucket_ms"))
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_frames").cast("bigint").alias("total_frames"),
            F.min("rms").alias("min_rms"),
            F.max("rms").alias("max_rms"),
            F.sum((F.col("peak") >= 32767).cast("long"))
            .cast("bigint")
            .alias("clipped_files"),
        )
        .orderBy("duration_bucket_ms")
    )


def media_pipeline(spark, sf_dir: str):
    """The exact phash_image_dedup pipeline (decode_media ->
    perceptual_hash -> hash-groupBy keep-min) over the parquet-backed
    media table — the registered query's code path at study scale."""
    from pyspark.sql import functions as F

    from barco_spark.multimodal.media import decode_media, perceptual_hash

    media = spark.read.parquet(sf_dir + "/media.parquet")
    return (
        perceptual_hash(decode_media(media))
        .groupBy("phash")
        .agg(
            F.min("media_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_copies") >= 2)
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
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sizes", default="5000,50000,500000")
    ap.add_argument("--embeddings", action="store_true")
    ap.add_argument("--events", action="store_true")
    ap.add_argument("--media", action="store_true")
    ap.add_argument("--audio", action="store_true")
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
            if args.media or args.audio:
                build = build_audio if args.audio else build_media
                pipe = audio_pipeline if args.audio else media_pipeline
                label = "audio_pipeline" if args.audio else "phash_pipeline"
                build(spark, d, n)

                def run_media() -> float:
                    spark.catalog.clearCache()
                    t0 = time.perf_counter()
                    pipe(spark, d).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    return time.perf_counter() - t0

                reps = 1 if n >= 500_000 else 2
                t = min(run_media() for _ in range(reps))
                plan = pipe(spark, d)._jdf.queryExecution().executedPlan().toString()
                print(
                    json.dumps(
                        {
                            "query": label,
                            "media_rows": n,
                            "sec": round(t, 1),
                            "exchanges_in_plan": plan.count("Exchange"),
                        }
                    ),
                    flush=True,
                )
                continue
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
