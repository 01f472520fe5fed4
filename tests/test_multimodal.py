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
    # a blob that declares a REAL format (jpeg) with no codec available
    # must raise under strict; self-declared "fake/*" blobs never do
    # (they route to the deterministic stub on every host — the oracle
    # contract for phash_image_dedup / multimodal_profile)
    if _HAS_PIL:
        pytest.skip("real codec installed")
    df = synthetic_media(spark, 3).withColumn(
        "meta",
        F.struct(
            F.lit("jpeg").alias("format"),
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
        ),
    )
    with pytest.raises(Exception) as ei:
        decode_media(df, strict=True).collect()
    assert "NotImplementedError" in str(ei.value) or "real media decode" in str(
        ei.value
    )


def test_decode_fake_format_always_uses_stub(spark):
    # fake/* blobs must decode to EXACTLY the deterministic stub bytes on
    # every host, PIL or not (ADVICE r11 portability fix): any real-codec
    # attempt on the synthetic sha256 blobs would either raise or produce
    # different bytes, breaking the oracle pairing of phash_image_dedup /
    # multimodal_profile
    from barco_spark.multimodal.media import _fake_pixels

    df = synthetic_media(spark, 6)
    expect = {}
    for r in df.collect():
        w = r["meta"]["width"] or 32
        h = r["meta"]["height"] or 32
        expect[r["media_id"]] = _fake_pixels(bytes(r["blob"]), w, h)
    got = {r["media_id"]: bytes(r["decoded"]) for r in decode_media(df).collect()}
    assert got == expect


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


def test_png_codec_roundtrip_all_channel_counts():
    """Real codec: encode known pixels -> PNG bytes -> decode -> same
    pixels, for greyscale/RGB/RGBA."""
    import random

    from barco_spark.multimodal.png import decode_png, encode_png

    rng = random.Random(7)
    for channels in (1, 3, 4):
        w, h = 13, 9
        pixels = bytes(rng.randrange(256) for _ in range(w * h * channels))
        blob = encode_png(pixels, w, h, channels)
        assert blob[:8] == b"\x89PNG\r\n\x1a\n"
        dw, dh, dch, out = decode_png(blob)
        assert (dw, dh, dch) == (w, h, channels)
        assert out == pixels


def test_png_decoder_undoes_all_filter_types():
    """Decode a PNG whose scanlines use Sub/Up/Average/Paeth, built with
    an independent forward-filter implementation in the test."""
    import random
    import struct
    import zlib

    from barco_spark.multimodal.png import decode_png

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    rng = random.Random(11)
    w, h, ch = 8, 5, 3
    stride = w * ch
    pixels = bytes(rng.randrange(256) for _ in range(stride * h))
    lines = [pixels[y * stride : (y + 1) * stride] for y in range(h)]
    raw = b""
    prev = bytes(stride)
    for y, line in enumerate(lines):
        ftype = y % 5
        filt = bytearray(stride)
        for i in range(stride):
            left = line[i - ch] if i >= ch else 0
            up = prev[i]
            ul = prev[i - ch] if i >= ch else 0
            if ftype == 0:
                filt[i] = line[i]
            elif ftype == 1:
                filt[i] = (line[i] - left) & 0xFF
            elif ftype == 2:
                filt[i] = (line[i] - up) & 0xFF
            elif ftype == 3:
                filt[i] = (line[i] - ((left + up) >> 1)) & 0xFF
            else:
                filt[i] = (line[i] - paeth(left, up, ul)) & 0xFF
        raw += bytes([ftype]) + bytes(filt)
        prev = line

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    dw, dh, dch, out = decode_png(blob)
    assert (dw, dh, dch) == (w, h, ch)
    assert out == pixels


def test_decode_media_real_png_roundtrip_strict(spark):
    """decode_media with strict=True is a REAL decode for PNG blobs:
    pixels survive the full Spark mapInPandas path bit-exactly, no PIL
    required."""
    from barco_spark.multimodal.media import MEDIA_SCHEMA, decode_media
    from barco_spark.multimodal.png import encode_png

    rows = []
    expected = {}
    for i, (w, h) in enumerate([(16, 8), (7, 5), (32, 32)]):
        pixels = bytes(((i + 1) * 37 + j) % 256 for j in range(w * h * 3))
        rows.append(
            (i, "image", bytearray(encode_png(pixels, w, h, 3)),
             ("image/png", w, h, None))
        )
        expected[i] = (w, h, pixels)
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r["media_id"]: (r["width"], r["height"], bytes(r["decoded"]))
        for r in decode_media(df, strict=True).collect()
    }
    assert got == expected


def test_media_from_files_binaryfile_ingest_and_real_decode(spark, tmp_path):
    """Files on disk -> binaryFile source -> strict decode -> features:
    the full multimodal ingest loop with a real codec, no driver-side
    file iteration."""
    from barco_spark.multimodal.media import (
        decode_media,
        extract_features,
        media_from_files,
    )
    from barco_spark.multimodal.png import encode_png

    expected = {}
    for i, (w, h) in enumerate([(8, 4), (5, 5), (12, 3)]):
        pixels = bytes((11 * i + j) % 256 for j in range(w * h * 3))
        (tmp_path / f"img{i}.png").write_bytes(encode_png(pixels, w, h, 3))
        expected[f"img{i}.png"] = (w, h, pixels)
    (tmp_path / "notes.txt").write_text("not an image")

    media = media_from_files(spark, str(tmp_path), glob="*.png")
    rows = media.collect()
    assert len(rows) == 3
    assert all(r["meta"]["format"] == "png" for r in rows)
    assert len({r["media_id"] for r in rows}) == 3

    decoded = decode_media(media, strict=True)
    got = {(r["width"], r["height"], bytes(r["decoded"])) for r in decoded.collect()}
    assert got == {v for v in expected.values()}

    feats = extract_features(decoded, dim=8).collect()
    assert len(feats) == 3
    assert all(len(r["features"]) == 8 for r in feats)


def test_phash_dedup_finds_planted_duplicates(spark):
    """Every planted duplicate (media_id+1000 re-produce) must collapse
    into a group with its original as keeper; no spurious groups with
    copies beyond the planted pair structure."""
    from pyspark.sql import functions as F

    from barco_spark.registry import load_all

    rows = load_all()["phash_image_dedup"].build(spark, "ignored").collect()
    assert rows, "no duplicate groups found"
    for r in rows:
        assert r["n_copies"] >= 2
        # keeper is always the original (min id < 1000 planted range)
        assert r["keeper_id"] < 1_000


def test_perceptual_hash_deterministic_and_content_keyed(spark):
    """Identical pixels -> identical hash across calls; distinct blobs
    produce more than one distinct hash (content actually drives it)."""
    from barco_spark.multimodal.media import (
        decode_media,
        perceptual_hash,
        synthetic_media,
    )

    media = synthetic_media(spark, n=40)
    a = sorted(tuple(r) for r in perceptual_hash(decode_media(media)).collect())
    b = sorted(tuple(r) for r in perceptual_hash(decode_media(media)).collect())
    assert a == b
    assert len({h for _, h in a}) > 1


def test_wav_decode_matches_synthesis_closed_form(spark):
    """The stdlib WAV round trip is exact: a square wave of amplitude A
    has peak == A and integer RMS == A; frame counts and duration come
    straight from the synthesis parameters."""
    from barco_spark.multimodal.audio import (
        RATE,
        decode_audio,
        synthetic_audio,
    )

    feats = {
        r["media_id"]: r for r in decode_audio(synthetic_audio(spark, 12)).collect()
    }
    assert len(feats) == 12
    for i, r in feats.items():
        amp = 8000 + (i % 8) * 1000
        dur = 100 * (1 + i % 10)
        assert r["sample_rate"] == RATE
        assert r["duration_ms"] == dur
        assert r["n_frames"] == RATE * dur // 1000
        assert r["peak"] == amp
        assert r["rms"] == amp  # |s| == A everywhere -> RMS == A exactly


def test_wav_frame_energy_is_constant_per_file(spark):
    """Every 100ms frame of a constant-amplitude square wave carries the
    same exact RMS (== amplitude); frame counts equal duration/100ms."""
    from barco_spark.multimodal.audio import audio_frame_energy, synthetic_audio

    rows = audio_frame_energy(synthetic_audio(spark, 6), frame_ms=100).collect()
    by_media: dict = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    for i, frames in by_media.items():
        amp = 8000 + (i % 8) * 1000
        dur = 100 * (1 + i % 10)
        assert len(frames) == dur // 100
        assert {f["frame_rms"] for f in frames} == {amp}


def test_audio_feature_extract_registry_shape(spark, sf_dir):
    from barco_spark.registry import load_all

    rows = load_all()["audio_feature_extract"].build(spark, sf_dir).collect()
    assert len(rows) == 10  # duration buckets 100..1000 ms
    assert all(r["min_rms"] >= 8000 and r["max_rms"] <= 15000 for r in rows)
    assert all(r["clipped_files"] == 0 for r in rows)


def test_wav_files_binaryfile_ingest_and_decode(spark, tmp_path):
    """The storage loop for audio: real WAV files on disk -> binaryFile
    distributed ingest (media_from_files) -> real stdlib decode. Proves
    the same decode stage serves blobs from storage, not just the
    synthesized in-memory table."""
    from barco_spark.multimodal.audio import RATE, decode_audio, synth_wav
    from barco_spark.multimodal.media import media_from_files

    d = tmp_path / "wavs"
    d.mkdir()
    for i in range(4):
        (d / f"clip{i}.wav").write_bytes(synth_wav(i, 100 * (i + 1)))

    media = media_from_files(spark, str(d), kind="audio", glob="*.wav")
    assert media.count() == 4
    fmts = {r["meta"]["format"] for r in media.select("meta").collect()}
    assert fmts == {"wav"}

    feats = decode_audio(media).collect()
    assert len(feats) == 4
    assert {r["sample_rate"] for r in feats} == {RATE}
    assert sorted(r["duration_ms"] for r in feats) == [100, 200, 300, 400]
    # amplitude for seed i is 8000 + (i % 8) * 1000; square wave -> rms == amp
    assert sorted(r["rms"] for r in feats) == [8000, 9000, 10000, 11000]
