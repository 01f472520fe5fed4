"""Multimodal plumbing tests: schema, Arrow batch shape, stub decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from barco_spark.multimodal import (
    decode_media,
    extract_features,
    frame_sample,
    resize_images,
    synthetic_media,
)
from barco_spark.multimodal.media import _HAS_PIL


def test_media_schema_roundtrip(spark, tmp_path):
    df = synthetic_media(spark, 30)
    path = str(tmp_path / "media")
    df.write.option("compression", "zstd").parquet(path)
    back = spark.read.parquet(path)
    assert back.count() == 30
    assert dict(back.dtypes)["blob"] == "binary"
    assert "struct" in dict(back.dtypes)["meta"]


def test_decode_deterministic(spark):
    df = synthetic_media(spark, 12)
    d1 = {r["media_id"]: bytes(r["decoded"]) for r in decode_media(df).collect()}
    d2 = {r["media_id"]: bytes(r["decoded"]) for r in decode_media(df).collect()}
    assert d1 == d2
    assert all(len(v) > 0 for v in d1.values())


def test_decode_strict_raises_without_codec(spark):
    if _HAS_PIL:
        pytest.skip("real codec installed")
    df = synthetic_media(spark, 3)
    with pytest.raises(Exception) as ei:
        decode_media(df, strict=True).collect()
    assert "NotImplementedError" in str(ei.value) or "real media decode" in str(
        ei.value
    )


def test_feature_extraction_shape(spark):
    feats = extract_features(decode_media(synthetic_media(spark, 9)), dim=16)
    rows = feats.collect()
    assert len(rows) == 9
    assert all(len(r["features"]) == 16 for r in rows)
    # unit-normalized
    assert all(abs(sum(x * x for x in r["features"]) - 1.0) < 1e-5 for r in rows)


def test_resize(spark):
    out = resize_images(decode_media(synthetic_media(spark, 6)), 8, 4).collect()
    assert all(len(bytes(r["decoded"])) == 32 for r in out)
    assert all(r["width"] == 8 and r["height"] == 4 for r in out)


def test_frame_sample_only_videos(spark):
    df = synthetic_media(spark, 30)
    frames = frame_sample(df, every_ms=1000)
    rows = frames.collect()
    video_ids = {r["media_id"] for r in df.filter(F.col("kind") == "video").collect()}
    assert {r["media_id"] for r in rows} <= video_ids
    assert len(rows) > 0
    assert all(r["frame_ts_ms"] % 1000 == 0 for r in rows)
