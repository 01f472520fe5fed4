"""Audio modality: REAL RIFF/WAVE codec via the Python stdlib.

The image path (png.py) proved the posture: multimodal columns are
opaque binary blobs + typed metadata, and the decode stage is a
mapInPandas Arrow-batch pass — here the codec is the stdlib `wave`
module (RFC-less but the canonical RIFF/WAVE PCM container), so unlike
the stubbed PIL path there is NO fake decode anywhere: synthesis
writes real WAV files, decoding parses their headers and PCM frames.

Reference parity note: the reference broker treats payloads as opaque
bytes (SURVEY.md §1.2); audio decode/feature-extract is north-star
LLM-pipeline surface, not broker parity.

Scale posture: synthesis and decode are per-row map work over Arrow
batches (no shuffle); frame-energy explodes to (media_id, frame) rows
whose count is duration/frame_ms — bounded fan-out, and the only
shuffle in the demo operators is the final per-media or per-frame
aggregate. At 100 TB the blobs arrive via binaryFile (distributed
listing, size-based splits, media_from_files) and the same stages
apply unchanged.
"""

from __future__ import annotations

import io
import struct
import wave
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RATE = 8000  # Hz, 16-bit mono PCM throughout


def synth_wav(seed: int, duration_ms: int, rate: int = RATE) -> bytes:
    """A real WAV file: integer square wave, amplitude and period from
    the seed. Pure-integer samples (+A/-A), so downstream features
    (peak, RMS) have closed-form exact values the tests assert."""
    amp = 8000 + (seed % 8) * 1000  # 8000..15000
    period = 20 + (seed % 30)  # samples per half-wave
    n = rate * duration_ms // 1000
    frames = bytearray()
    for i in range(n):
        s = amp if (i // period) % 2 == 0 else -amp
        frames += struct.pack("<h", s)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(bytes(frames))
    return buf.getvalue()


def synthetic_audio(spark: SparkSession, n: int = 60) -> DataFrame:
    """Deterministic audio table in the media shape (real WAV blobs)."""
    rows = []
    for i in range(n):
        dur = 100 * (1 + i % 10)  # 100..1000 ms
        rows.append(
            (
                i,
                "audio",
                bytearray(synth_wav(i, dur)),
                ("audio/wav", None, None, dur),
            )
        )
    from barco_spark.multimodal.media import media_rows_df

    # pyarrow local-table path (r13): no Python-worker unpickle fan-out
    return media_rows_df(spark, rows, n)


def _parse_wav(blob: bytes) -> tuple[int, int, int, int, int]:
    """(rate, n_frames, duration_ms, peak, rms) from real WAV bytes.

    RMS is the floor integer square root of the mean square — all
    integer arithmetic, so the value is exact and engine-independent.
    """
    with wave.open(io.BytesIO(blob), "rb") as w:
        rate = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
    samples = struct.unpack(f"<{n}h", raw)
    peak = max((abs(s) for s in samples), default=0)
    if n:
        ms = sum(s * s for s in samples) // n
        rms = int(ms**0.5)
        # float sqrt can be off-by-one at integer boundaries; fix up
        while (rms + 1) * (rms + 1) <= ms:
            rms += 1
        while rms * rms > ms:
            rms -= 1
    else:
        rms = 0
    return rate, n, n * 1000 // rate if rate else 0, peak, rms


def decode_audio(df: DataFrame) -> DataFrame:
    """mapInPandas decode: real WAV header + PCM parse per blob."""
    schema = (
        "media_id long, sample_rate int, n_frames long, duration_ms int,"
        " peak int, rms int"
    )

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                rate, n, dur, peak, rms = _parse_wav(bytes(blob))
                out.append((mid, rate, n, dur, peak, rms))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "sample_rate",
                    "n_frames",
                    "duration_ms",
                    "peak",
                    "rms",
                ],
            )

    return df.select("media_id", "blob").mapInPandas(do, schema)


def audio_frame_energy(df: DataFrame, frame_ms: int = 100) -> DataFrame:
    """Frame-sampled energy: per fixed window, the exact integer RMS.

    The audio analogue of video frame_sample — one row per
    (media_id, frame); fan-out is duration/frame_ms per blob."""
    schema = "media_id long, frame_idx int, frame_rms int"

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                with wave.open(io.BytesIO(bytes(blob)), "rb") as w:
                    rate = w.getframerate()
                    n = w.getnframes()
                    raw = w.readframes(n)
                samples = struct.unpack(f"<{n}h", raw)
                step = max(1, rate * frame_ms // 1000)
                for fi in range(0, n, step):
                    chunk = samples[fi : fi + step]
                    ms = sum(s * s for s in chunk) // len(chunk)
                    r = int(ms**0.5)
                    while (r + 1) * (r + 1) <= ms:
                        r += 1
                    while r * r > ms:
                        r -= 1
                    out.append((mid, fi // step, r))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "frame_rms"]
            )

    return df.select("media_id", "blob").mapInPandas(do, schema)


from barco_spark.registry import register  # noqa: E402


@register(
    "audio_feature_extract",
    """
    WITH files AS (
      SELECT i,
             CAST(100*(1+i%10) AS INTEGER) AS duration_bucket_ms,
             8000+(i%8)*1000 AS amp,
             8 * (100*(1+i%10)) AS n_frames
      FROM generate_series(0,59) t(i))
    SELECT duration_bucket_ms,
           COUNT(*) AS n_files,
           CAST(SUM(n_frames) AS BIGINT) AS total_frames,
           CAST(MIN(amp) AS INTEGER) AS min_rms,
           CAST(MAX(amp) AS INTEGER) AS max_rms,
           CAST(SUM(CASE WHEN amp >= 32767 THEN 1 ELSE 0 END) AS BIGINT)
             AS clipped_files
    FROM files GROUP BY duration_bucket_ms ORDER BY duration_bucket_ms
    """,
    "udf",
    doc=(
        "Audio feature extraction over REAL RIFF/WAVE blobs (stdlib "
        "wave codec, not a stub): synthesize a deterministic corpus of "
        "16-bit PCM square waves, decode header + frames per blob in "
        "one mapInPandas pass, and report per duration bucket: file "
        "count, total frames, exact integer RMS extrema and the clip "
        "rate (peak at full scale). Square-wave synthesis gives "
        "closed-form expected features (RMS == amplitude exactly), so "
        "the tests pin decode correctness without any audio library. "
        "ORACLE-PAIRED (r11): the SQL recomputes the same aggregates "
        "from the synthesis parameters directly (all integers) — the "
        "Spark side goes through the REAL RIFF/WAVE encode->decode "
        "roundtrip, so a hash mismatch means the codec broke. "
        "Map-only decode; the lone shuffle is the final tiny rollup."
    ),
)
def audio_feature_extract(spark, sf_dir):
    audio = synthetic_audio(spark, n=60)
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
