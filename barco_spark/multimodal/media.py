"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The engine treats media exactly like the reference treats payloads —
opaque bytes it never interprets (SURVEY.md §1.2) — until an explicit
decode/feature stage. The Spark-side plumbing (schema, partitioning,
Arrow batch shape, mapInPandas signatures) is real and tested, and so
is one real codec: PNG blobs decode through the built-in pure-stdlib
codec (multimodal/png.py, zlib + scanline filters from the public
spec), bit-exact-roundtrip-tested in CI. Other formats:

- if PIL/librosa/etc. import succeeds, the real decoder runs;
- otherwise a clearly-marked deterministic fake produces stable
  outputs so pipelines remain testable end-to-end (and raise
  NotImplementedError when `strict=True`).

Scale notes: media rows are processed with mapInPandas (Arrow batches,
no per-row Python overhead); batch size is governed by
spark.sql.execution.arrow.maxRecordsPerBatch; decode is a narrow map —
no shuffle; feature vectors come back as array<float> columns ready
for the similarity operators.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("blob", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("format", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                ]
            ),
        ),
    ]
)

try:  # pragma: no cover - not present in this environment
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def media_rows_df(spark: SparkSession, rows, n: int) -> DataFrame:
    """Driver-local MEDIA_SCHEMA rows -> DataFrame via pyarrow.

    ``spark.createDataFrame(rows, MEDIA_SCHEMA)`` pickles the rows into
    an RDD and starts one Python worker per slice just to unpickle them
    — measured r13: the decode stages behind phash_image_dedup burned
    ~1.4 s/task of worker+unpickle setup on ~9-row partitions (the same
    pathology session.local_rows_df fixed in r12, unconverted here
    because of the binary+struct columns).  A pyarrow Table is read by
    the JVM directly; rows and schema are bit-identical (verified
    against the old path before the swap).  coalesce keeps the old
    ~16-rows-per-task geometry so downstream Python stages pay a
    bounded number of worker setups; real media tables come from
    storage with size-based splits (media_from_files)."""
    import pyarrow as pa

    meta_t = pa.struct(
        [
            ("format", pa.string()),
            ("width", pa.int32()),
            ("height", pa.int32()),
            ("duration_ms", pa.int32()),
        ]
    )
    tbl = pa.table(
        {
            "media_id": pa.array([r[0] for r in rows], pa.int64()),
            "kind": pa.array([r[1] for r in rows], pa.string()),
            "blob": pa.array([bytes(r[2]) for r in rows], pa.binary()),
            "meta": pa.array(
                [
                    {
                        "format": r[3][0],
                        "width": r[3][1],
                        "height": r[3][2],
                        "duration_ms": r[3][3],
                    }
                    for r in rows
                ],
                meta_t,
            ),
        }
    )
    return spark.createDataFrame(tbl, schema=MEDIA_SCHEMA).coalesce(
        max(1, n // 16)
    )


def synthetic_media(spark: SparkSession, n: int = 100) -> DataFrame:
    """Deterministic fake media table for tests (seeded by media_id)."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        blob = hashlib.sha256(f"media-{i}".encode()).digest() * 8  # 256 B
        meta = (
            "fake/" + kind,
            64 + (i % 8) * 32 if kind != "audio" else None,
            64 + (i % 5) * 32 if kind != "audio" else None,
            1000 * (1 + i % 30) if kind != "image" else None,
        )
        rows.append((i, kind, blob, meta))
    return media_rows_df(spark, rows, n)


def media_from_files(
    spark: SparkSession, path: str, kind: str = "image", glob: str | None = None
) -> DataFrame:
    """Ingest a directory of media files into the MEDIA_SCHEMA shape.

    Uses Spark's built-in ``binaryFile`` source — the idiomatic way to
    land opaque blobs at scale (distributed listing, size-based splits,
    pushdown on path/length; no driver-side file loop). ``media_id`` is
    the 64-bit hash of the file path (stable across runs), ``format``
    is the lowercased file extension; width/height/duration stay NULL
    until a decode stage fills them (decode_media reads the real
    dimensions from the bytes, not the metadata).
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    return df.select(
        F.xxhash64(F.col("path")).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col("content").alias("blob"),
        F.struct(
            F.lower(F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1)).alias(
                "format"
            ),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_pixels(blob: bytes, w: int, h: int) -> bytes:
    """STUB decode: deterministic pseudo-pixels from the blob digest.

    Stands in for a real codec (PIL.Image.open) which is unavailable
    here; same input -> same "pixels", so downstream stages are
    testable.  Seeded from the blob's lowercase-hex digest (not the raw
    bytes) so SQL oracles can rebuild the stub: DuckDB's sha256() takes
    VARCHAR only, and ``sha256(lower(hex(blob)))`` there equals
    ``sha256(blob.hex())`` here byte-for-byte.
    """
    out = hashlib.sha256(blob.hex().encode()).digest()
    need = w * h
    return (out * (need // len(out) + 1))[:need]


def decode_media(df: DataFrame, strict: bool = False) -> DataFrame:
    """blob -> decoded payload (pixels/samples) via mapInPandas.

    Real codec coverage: PNG blobs (magic-sniffed) are decoded by the
    built-in pure-stdlib codec (multimodal/png.py) — a genuine decode
    that CI exercises end-to-end; other formats use PIL when installed.
    `strict=True` raises NotImplementedError instead of falling back to
    the deterministic fake when no real codec can handle a blob.
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("kind", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("decoded", BinaryType()),
        ]
    )

    def meta_int(m, field: str, default: int) -> int:
        v = m.get(field) if isinstance(m, dict) else getattr(m, field)
        if v is None or v != v:  # None or NaN (Arrow structs use NaN)
            return default
        return int(v)

    def meta_format(m) -> str:
        v = m.get("format") if isinstance(m, dict) else getattr(m, "format", None)
        return v if isinstance(v, str) else ""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from barco_spark.multimodal.png import PNG_MAGIC, decode_png

        for pdf in batches:
            ids, kinds, widths, heights, decoded = [], [], [], [], []
            for mid, kind, blob, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["blob"], pdf["meta"]
            ):
                blob = bytes(blob)
                if blob[:8] == PNG_MAGIC:
                    w, h, _ch, pixels = decode_png(blob)
                elif meta_format(meta).startswith("fake/"):
                    # synthetic blobs declare themselves: route straight to
                    # the deterministic stub so the oracle-paired queries
                    # (phash_image_dedup, multimodal_profile) hash the same
                    # on hosts with and without PIL installed
                    w = meta_int(meta, "width", 32)
                    h = meta_int(meta, "height", 32)
                    pixels = _fake_pixels(blob, w, h)
                elif _HAS_PIL:
                    import io

                    img = Image.open(io.BytesIO(blob))
                    w, h = img.size
                    pixels = img.tobytes()
                elif strict:
                    raise NotImplementedError(
                        "real decode for non-PNG media requires PIL/librosa; "
                        "not installed"
                    )
                else:
                    w = meta_int(meta, "width", 32)
                    h = meta_int(meta, "height", 32)
                    pixels = _fake_pixels(blob, w, h)
                ids.append(mid)
                kinds.append(kind)
                widths.append(w)
                heights.append(h)
                decoded.append(pixels)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": kinds,
                    "width": pd.array(widths, dtype="int32"),
                    "height": pd.array(heights, dtype="int32"),
                    "decoded": decoded,
                }
            )

    return df.mapInPandas(decode_batches, out_schema)


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """decoded payload -> float feature vector (array<float>).

    STUB featurizer: byte-histogram projection (deterministic). A real
    model would run here (ONNX/torch) with the identical mapInPandas
    plumbing and batch shape.
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for b in pdf["decoded"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype("float32")
                norm = float(np.linalg.norm(hist)) or 1.0
                feats.append((hist / norm).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return df.mapInPandas(featurize, out_schema)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize decoded images (STUB: re-derive fake pixels at new size)."""
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("decoded", BinaryType()),
        ]
    )

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "decoded": [
                        _fake_pixels(bytes(b), width, height) for b in pdf["decoded"]
                    ],
                }
            )

    return df.mapInPandas(do, out_schema)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Sample frame timestamps from videos (1 row per sampled frame)."""
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_ts_ms", IntegerType()),
        ]
    )

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ts = [], []
            for mid, kind, meta in zip(pdf["media_id"], pdf["kind"], pdf["meta"]):
                if kind != "video":
                    continue
                dur = meta.get("duration_ms") if isinstance(meta, dict) else meta.duration_ms
                dur = 0 if dur is None or dur != dur else int(dur)
                for t in range(0, dur, every_ms):
                    ids.append(mid)
                    ts.append(t)
            yield pd.DataFrame({"media_id": ids, "frame_ts_ms": ts})

    return df.filter(F.col("kind") == "video").mapInPandas(do, out_schema)


# --------------------------------------------------------------------------
# Registry query: the full multimodal pipeline as a driver-visible op
# --------------------------------------------------------------------------
from barco_spark.registry import register  # noqa: E402


@register(
    "multimodal_profile",
    """
    WITH m AS (
      SELECT i,
             CASE i%3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                      ELSE 'video' END AS kind,
             CASE WHEN i%3 = 1 THEN 1024  -- audio: stub decode default 32x32
                  ELSE (64+(i%8)*32) * (64+(i%5)*32) END AS decoded_len
      FROM generate_series(0,119) t(i))
    SELECT kind, COUNT(*) AS n_items,
           AVG(decoded_len) AS avg_decoded_bytes,
           CAST(16 AS INTEGER) AS feature_dim
    FROM m GROUP BY kind ORDER BY kind
    """,
    "pipeline",
    doc=(
        "End-to-end multimodal pipeline over the deterministic synthetic "
        "media table: binary blobs + typed metadata -> mapInPandas "
        "decode (codec stubbed, Arrow batch shape real) -> feature "
        "extraction -> per-kind profile (counts, mean decoded bytes, "
        "feature dim). Exercises the exact schema/partitioning/UDF "
        "plumbing a real codec would use at 100 TB. ORACLE-PAIRED "
        "(r11): decoded lengths are closed-form in the synthesis "
        "parameters (w*h from the planted metadata; the audio default "
        "32x32), so the SQL recomputes the profile from first "
        "principles — a mismatch means the decode/feature plumbing "
        "changed shape, which is exactly what the row should catch."
    ),
)
def multimodal_profile(spark, sf_dir):
    from pyspark.sql import functions as F

    media = synthetic_media(spark, n=120)
    # persist: the join references decoded on both sides (directly and
    # through the featurizer); without it the decode mapInPandas runs
    # twice
    from barco_spark.session import eager_persist

    decoded = eager_persist(decode_media(media))
    feats = extract_features(decoded, dim=16)
    joined = decoded.join(feats, "media_id")  # decoded keeps kind
    return (
        joined.groupBy(F.col("kind"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.avg(F.length("decoded")).alias("avg_decoded_bytes"),
            F.max(F.size("features")).alias("feature_dim"),
        )
        .orderBy("kind")
    )


def perceptual_hash(decoded: DataFrame, grid: int = 8) -> DataFrame:
    """Decoded pixels -> 64-bit average-hash (aHash): mean-pool the
    payload onto a ``grid x grid`` raster, threshold each cell by the
    global mean, pack the bits. Identical pixels -> identical hash;
    the standard cheap perceptual key for image near-dup blocking
    (pHash/dHash swap in with the same mapInPandas plumbing).

    Exact-integer thresholding: with equal cell sizes, ``cell_mean >=
    global_mean`` is algebraically ``cells * cell_sum >= total_sum`` —
    computed on int64 sums so the bit pattern is engine-independent
    (no float-rounding flips on near-ties) and a SQL oracle reproduces
    the hash bit-for-bit.
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("phash", LongType()),
        ]
    )

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        cells = grid * grid
        for pdf in batches:
            hashes = []
            for b in pdf["decoded"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                if len(arr) == 0:
                    hashes.append(0)
                    continue
                # mean-pool into `cells` buckets (pad the tail bucket)
                pad = (-len(arr)) % cells
                sums = (
                    np.pad(arr, (0, pad), mode="edge")
                    .reshape(cells, -1)
                    .sum(axis=1, dtype=np.int64)
                )
                bits = (cells * sums >= sums.sum()).astype(np.uint64)
                h = np.uint64(0)
                for bit in bits:
                    h = (h << np.uint64(1)) | bit
                # store as signed int64 (Spark LongType)
                hashes.append(int(h.astype(np.int64)))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "phash": hashes}
            )

    return decoded.mapInPandas(do, out_schema)


@register(
    "phash_image_dedup",
    """
    WITH ids AS (SELECT i FROM generate_series(0,119) t(i) WHERE i%3=0),
    all_media AS (
      SELECT i AS media_id, i AS seed FROM ids
      UNION ALL
      SELECT i+1000 AS media_id, i AS seed FROM ids WHERE i%4=0),
    blobs AS (
      SELECT media_id,
             repeat(sha256('media-' || seed), 8) AS blob_hex,
             (64+(seed%8)*32) * (64+(seed%5)*32) AS len
      FROM all_media),
    pix AS (
      SELECT media_id, len, (len // 64) AS bs,
             substr(repeat(sha256(blob_hex), len // 32 + 1), 1, len * 2)
               AS pixhex
      FROM blobs),
    bytes_ AS (
      SELECT media_id, bs, p // bs AS cell,
             ('0x' || substr(pixhex, 2*p + 1, 2))::BIGINT AS v
      FROM pix, unnest(generate_series(0, len - 1)) u(p)),
    cells AS (
      SELECT media_id, cell, SUM(v) AS s
      FROM bytes_ GROUP BY media_id, cell),
    tot AS (SELECT media_id, SUM(s) AS total FROM cells GROUP BY media_id),
    bits AS (
      SELECT c.media_id, c.cell,
             CASE WHEN 64 * c.s >= t.total THEN 1 ELSE 0 END AS bit
      FROM cells c JOIN tot t USING (media_id)),
    hashes AS (
      SELECT media_id,
             CAST(SUM(CASE WHEN bit = 1 THEN
                   CASE WHEN cell = 0 THEN -9223372036854775808
                        ELSE (CAST(1 AS BIGINT)
                              << (63 - CAST(cell AS INTEGER))) END
                 ELSE 0 END) AS BIGINT) AS phash
      FROM bits GROUP BY media_id)
    SELECT phash, MIN(media_id) AS keeper_id, COUNT(*) AS n_copies
    FROM hashes GROUP BY phash HAVING COUNT(*) >= 2
    """,
    "dedup",
    doc=(
        "Image dedup by perceptual hash: binary blobs -> mapInPandas "
        "decode -> 64-bit average-hash -> hash-groupBy keep-min "
        "(exact-dedup shuffle shape on an 8-byte key). The builder "
        "plants known duplicates (every 4th item re-produced under a "
        "new media_id), so the returned groups prove end-to-end that "
        "identical pixels collapse to one keeper. ORACLE-PAIRED (r11, "
        "closing the window's one rows-only row): the synthetic corpus, "
        "the hex-seeded stub decode, and the exact-integer aHash "
        "thresholding (64*cell_sum >= total, two's-complement packing) "
        "are all rebuilt in pure SQL, so DuckDB reproduces every hash "
        "bit — including the degenerate all-ones hash the repeating "
        "fake pixels produce — and the driver hash-checks the groups. "
        "At 100 TB the decode+hash pass is map-only Arrow batches and "
        "the shuffle carries (phash, media_id) pairs only."
    ),
)
def phash_image_dedup(spark, sf_dir):
    from pyspark.sql import functions as F

    media = synthetic_media(spark, n=120).filter(F.col("kind") == "image")
    dup = media.filter(F.col("media_id") % 4 == 0).withColumn(
        "media_id", F.col("media_id") + 1_000
    )
    both = media.unionByName(dup)
    hashed = perceptual_hash(decode_media(both))
    return (
        hashed.groupBy("phash")
        .agg(
            F.min("media_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_copies") >= 2)
    )
