"""Wire-format codecs: the reference's binary protocol on Spark (S3/O1).

The reference speaks two binary formats (all big-endian,
docs/developer/NETWORK_FORMATS.md, docs/developer/FILE_FORMATS.md):

- **Producer framed request** (S3, internal/producing/binary_messages.go:43-51,
  internal/producing/binary_server.go:208-257): header
  `{version u8, flags u8, streamId u16, opcode u8, bodyLength u32, crc u32}`
  where crc = CRC32-IEEE of the first 9 header bytes
  (binary_messages.go:107-118), flags bit0 = withTimestamp
  (binary_messages.go:31-35); body =
  `[timestamp_us i64?][keyLen u8][key][topicLen u8][topic]` then
  repeated `[msgLen u32][msg]`.
- **Consumer poll response item** (O1, internal/consuming/models.go:106-134):
  `{token i64, rangeIndex u8, genVersion u32, topicLen u8, topic,
  startOffset i64, payloadLen i32, payload}` where payload is a
  zstd-compressed run of records, each
  `{timestamp_us i64, length u32, body}` (the on-disk chunk record
  layout, docs/developer/FILE_FORMATS.md "Chunk").

Spark mapping: frame PARSING is a `mapInPandas` over a binary column —
an ingestion adapter that turns captured/proxied producer traffic into
`events` rows in one distributed pass; response MARSHALLING is an
`applyInPandas` per (topic, bucket) group producing bit-accurate poll
items (token/rangeIndex derived from the same ring math as the
reference via functions/tokens.py). Encoders are plain-Python twins
used by tests and by any driver-side facade.

Scale notes: both directions are per-row/per-group narrow work behind
Arrow batches; no shuffle beyond the (topic, bucket) grouping that the
response format itself requires. zstd via pyarrow's bundled codec.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterable, Iterator

import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from barco_spark.functions.tokens import range_bounds

MESSAGE_VERSION = 1
# fixed opcodes, mirroring internal/producing/binary_messages.go:20-29
STARTUP_OP = 1
READY_OP = 2
ERROR_OP = 3
PRODUCE_OP = 4
PRODUCE_RESPONSE_OP = 5
HEARTBEAT_OP = 6
# error codes (binary_messages.go:38-41)
SERVER_ERROR = 0
FLAG_WITH_TIMESTAMP = 0b00000001
_HEADER = struct.Struct(">BBHBII")  # version, flags, streamId, op, bodyLen, crc
HEADER_SIZE = _HEADER.size


def _crc32(data: bytes) -> int:
    return zlib.crc32(data) & 0xFFFFFFFF


def encode_frame(
    op: int, stream_id: int = 0, body: bytes = b"", flags: int = 0
) -> bytes:
    """One protocol frame: CRC'd header + body. Responses use the same
    header layout as requests (binary_messages.go:106-118 writeHeader)."""
    head9 = struct.pack(">BBHBI", MESSAGE_VERSION, flags, stream_id, op, len(body))
    return head9 + struct.pack(">I", _crc32(head9)) + body


def encode_error_frame(stream_id: int, message: str, code: int = SERVER_ERROR) -> bytes:
    """errorResponse: body = {code u8, message} (binary_messages.go:86-104)."""
    return encode_frame(
        ERROR_OP, stream_id, struct.pack(">B", code) + message.encode()
    )


def parse_header(buf: bytes, pos: int = 0) -> tuple[int, int, int, int, int]:
    """Validate and decode one header; returns (flags, stream_id, op,
    body_len) after the version/CRC checks the broker performs
    (binary_server.go:76-118)."""
    version, flags, stream_id, op, body_len, crc = _HEADER.unpack_from(buf, pos)
    if version != MESSAGE_VERSION:
        raise ValueError(f"unsupported protocol version {version}")
    if crc != _crc32(buf[pos : pos + 9]):
        raise ValueError("header crc mismatch")
    return flags, stream_id, op, body_len


def parse_produce_body(flags: int, stream_id: int, body: bytes) -> Iterator[dict]:
    """Decode one produce-frame body; yields one dict per message
    (binary_server.go:208-257 layout)."""
    b = 0
    ts = None
    if flags & FLAG_WITH_TIMESTAMP:
        (ts,) = struct.unpack_from(">q", body, b)
        b += 8
    key_len = body[b]
    b += 1
    key = body[b : b + key_len].decode()
    b += key_len
    topic_len = body[b]
    b += 1
    topic = body[b : b + topic_len].decode()
    b += topic_len
    while b < len(body):
        (mlen,) = struct.unpack_from(">I", body, b)
        b += 4
        yield {
            "stream_id": stream_id,
            "timestamp_us": ts,
            "partition_key": key or None,
            "topic": topic,
            # opaque bytes, exactly as the broker stores them (the
            # reference never parses bodies, producing/models.go);
            # cast to string at the EventLog boundary for text/JSON
            "payload": bytes(body[b : b + mlen]),
        }
        b += mlen


# The reference's inter-broker produce-routing content type: the body
# is the produce frame's PAYLOAD REGION as-is — a sequence of
# {uint32 length}{bytes} records (types/models.go:14; the gossiper
# forwards exactly that region, producing/binary_server.go:236-247,
# and the leader unpacks it in marshalFramedRecords, models.go:89-110)
MIME_PRODUCER_FRAMES = "application/vnd.polar.producer.frames"


def encode_framed_payloads(payloads: list[bytes]) -> bytes:
    """Pack payloads into the producer.frames wire body."""
    return b"".join(struct.pack(">I", len(p)) + p for p in payloads)


def parse_framed_payloads(body: bytes) -> list[bytes]:
    """Unpack a producer.frames body into its payloads
    (models.go:89-110 marshalFramedRecords, minus the copy loops)."""
    out: list[bytes] = []
    b = 0
    while b < len(body):
        if b + 4 > len(body):
            raise ValueError("truncated framed payload length")
        (mlen,) = struct.unpack_from(">I", body, b)
        b += 4
        if b + mlen > len(body):
            raise ValueError("truncated framed payload body")
        out.append(bytes(body[b : b + mlen]))
        b += mlen
    return out


# --------------------------------------------------------------------------
# Producer framed request (S3)
# --------------------------------------------------------------------------
def encode_produce_frame(
    topic: str,
    payloads: list[bytes | str],
    partition_key: str = "",
    timestamp_us: int | None = None,
    stream_id: int = 0,
) -> bytes:
    """Build one producer frame exactly as the reference client would."""
    body = b""
    flags = 0
    if timestamp_us is not None:
        flags |= FLAG_WITH_TIMESTAMP
        body += struct.pack(">q", timestamp_us)
    key_b = partition_key.encode()
    topic_b = topic.encode()
    body += struct.pack(">B", len(key_b)) + key_b
    body += struct.pack(">B", len(topic_b)) + topic_b
    for p in payloads:
        pb = p.encode() if isinstance(p, str) else p
        body += struct.pack(">I", len(pb)) + pb
    head9 = struct.pack(
        ">BBHBI", MESSAGE_VERSION, flags, stream_id, PRODUCE_OP, len(body)
    )
    return head9 + struct.pack(">I", _crc32(head9)) + body


def parse_produce_frames_py(blob: bytes) -> Iterator[dict]:
    """Decode a run of producer frames; yields one dict per message.

    Validates version, opcode and the header CRC the way the broker
    does (binary_server.go:76-118) — a corrupt header raises.
    """
    pos = 0
    while pos < len(blob):
        if len(blob) - pos < _HEADER.size:
            raise ValueError("truncated frame header")
        flags, stream_id, op, body_len = parse_header(blob, pos)
        pos += _HEADER.size
        body = blob[pos : pos + body_len]
        if len(body) != body_len:
            raise ValueError("truncated frame body")
        pos += body_len
        if op != PRODUCE_OP:
            continue  # startup/heartbeat frames carry no records
        yield from parse_produce_body(flags, stream_id, body)


FRAME_ROWS_SCHEMA = StructType(
    [
        StructField("stream_id", IntegerType()),
        StructField("timestamp_us", LongType()),
        StructField("partition_key", StringType()),
        StructField("topic", StringType()),
        StructField("payload", BinaryType()),
    ]
)


def parse_produce_frames(frames: DataFrame, col: str = "frames") -> DataFrame:
    """Binary frame blobs -> one row per produced message (distributed).

    Input: a DataFrame with a binary column `col`, each value holding
    one or more concatenated producer frames (e.g. captured TCP
    payloads landed in object storage). Output payloads are OPAQUE
    BYTES (the broker never parses bodies); to feed `EventLog.produce`
    cast to the engine's string convention first — UTF-8 text/JSON:
    `payload.cast('string')`, arbitrary binary: `base64(payload)`.
    produce() rejects binary columns loudly rather than corrupting.
    """

    def parse(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                rec for blob in pdf[col] for rec in parse_produce_frames_py(bytes(blob))
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "stream_id",
                    "timestamp_us",
                    "partition_key",
                    "topic",
                    "payload",
                ],
            )

    return frames.mapInPandas(parse, FRAME_ROWS_SCHEMA)


# --------------------------------------------------------------------------
# Consumer poll response (O1)
# --------------------------------------------------------------------------
POLL_ITEM_SCHEMA = StructType(
    [
        StructField("topic", StringType()),
        StructField("bucket", IntegerType()),
        StructField("item", BinaryType()),
    ]
)


def _zstd() -> pa.Codec:
    return pa.Codec("zstd")


def _zstd_content_size(buf: bytes) -> int | None:
    """Frame-Content-Size from a zstd frame header (RFC 8878 §3.1.1).

    pyarrow's Codec.decompress requires the decompressed size; the
    reference streams zstd so its wire format never carries one. Our
    single-shot compressor embeds it in the frame header — read it back.
    """
    if buf[:4] != b"\x28\xb5\x2f\xfd":
        return None
    fhd = buf[4]
    fcs_flag = fhd >> 6
    single_segment = (fhd >> 5) & 1
    dict_id_flag = fhd & 0b11
    pos = 5
    if not single_segment:
        pos += 1  # window descriptor
    pos += (0, 1, 2, 4)[dict_id_flag]
    n = (1 if single_segment else 0, 2, 4, 8)[fcs_flag]
    if n == 0:
        return None
    val = int.from_bytes(buf[pos : pos + n], "little")
    if fcs_flag == 1:
        val += 256
    return val


def _zstd_decompress(buf: bytes) -> bytes:
    size = _zstd_content_size(buf)
    if size is not None:
        return bytes(_zstd().decompress(buf, size))
    guess = max(64, 4 * len(buf))
    while guess <= 1 << 31:
        try:
            return bytes(_zstd().decompress(buf, guess))
        except Exception:
            guess *= 4
    raise ValueError("cannot determine decompressed size")


def encode_poll_items(
    batch: DataFrame,
    brokers: int = 3,
    consumer_ranges: int = 4,
    gen_version: int = 1,
) -> DataFrame:
    """Poll batch -> one binary response item per (topic, bucket) (O1).

    Item layout per consumerResponseItem.Marshal
    (internal/consuming/models.go:106-134); token and rangeIndex are
    recovered from the bucket id with the same ring arithmetic the
    reference uses (bucket = brokerOrdinal * ranges + rangeIndex).
    Records inside the zstd payload use the on-disk chunk record
    layout, ordered by offset.
    """

    def marshal(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("offset")
        topic = pdf["topic"].iloc[0]
        bucket = int(pdf["bucket"].iloc[0])
        broker, r = divmod(bucket, consumer_ranges)
        token, _hi = range_bounds(broker, r, brokers, consumer_ranges)
        records = b""
        for ts, payload in zip(pdf["timestamp"], pdf["payload"]):
            ts_us = int(pd.Timestamp(ts).value // 1000)
            body = payload.encode()
            records += struct.pack(">qI", ts_us, len(body)) + body
        compressed = bytes(_zstd().compress(records))
        topic_b = topic.encode()
        item = struct.pack(">qBI", token, r, gen_version)
        item += struct.pack(">B", len(topic_b)) + topic_b
        item += struct.pack(">q", int(pdf["offset"].iloc[0]))
        item += struct.pack(">i", len(compressed)) + compressed
        return pd.DataFrame(
            {"topic": [topic], "bucket": [bucket], "item": [item]}
        )

    return batch.groupBy("topic", "bucket").applyInPandas(
        marshal, POLL_ITEM_SCHEMA
    )


def encode_poll_items_py(
    items: list[dict],
    brokers: int = 3,
    consumer_ranges: int = 4,
    gen_version: int = 1,
) -> bytes:
    """Spark-free twin of ``encode_poll_items``: the FULL binary poll
    response body (O1) for the facade's ms-latency consumer path.

    Layout per docs/developer/NETWORK_FORMATS.md "Consumer poll
    response": uint16 item count, then one ``consumerResponseItem``
    per (topic, bucket) exactly as ``Marshal`` writes it
    (internal/consuming/models.go:106-134); record payloads use the
    on-disk chunk record layout (timestamp us + length + body) inside
    one zstd frame. ``items`` is ``EventLog.poll_dicts(...,
    with_record_meta=True)`` output: each dict carries ``topic``,
    ``bucket``, ``startOffset``, ``values`` and parallel
    ``timestamps_us``.
    """
    out = [struct.pack(">H", len(items))]
    for it in items:
        bucket = int(it["bucket"])
        broker, r = divmod(bucket, consumer_ranges)
        token, _hi = range_bounds(broker, r, brokers, consumer_ranges)
        records = b""
        for ts_us, payload in zip(it["timestamps_us"], it["values"]):
            body = payload.encode()
            records += struct.pack(">qI", int(ts_us), len(body)) + body
        compressed = bytes(_zstd().compress(records))
        topic_b = it["topic"].encode()
        item = struct.pack(">qBI", token, r, gen_version)
        item += struct.pack(">B", len(topic_b)) + topic_b
        item += struct.pack(">q", int(it["startOffset"]))
        item += struct.pack(">i", len(compressed)) + compressed
        out.append(item)
    return b"".join(out)


def decode_poll_response(data: bytes) -> list[dict]:
    """Parse a full binary poll response (uint16 count + items) —
    the test/client twin of ``encode_poll_items_py``."""
    (count,) = struct.unpack_from(">H", data, 0)
    pos = 2
    items = []
    for _ in range(count):
        item, pos = _decode_poll_item_at(data, pos)
        items.append(item)
    if pos != len(data):
        raise ValueError(f"trailing bytes in poll response: {len(data) - pos}")
    return items


def decode_poll_item(item: bytes) -> dict:
    """Decode one response item back to records (test/client twin)."""
    out, _pos = _decode_poll_item_at(item, 0)
    return out


def _decode_poll_item_at(item: bytes, pos: int) -> tuple[dict, int]:
    token, range_index, gen_version = struct.unpack_from(">qBI", item, pos)
    pos += 13
    tlen = item[pos]
    pos += 1
    topic = item[pos : pos + tlen].decode()
    pos += tlen
    (start_offset,) = struct.unpack_from(">q", item, pos)
    pos += 8
    (plen,) = struct.unpack_from(">i", item, pos)
    pos += 4
    raw = _zstd_decompress(item[pos : pos + plen])
    pos += plen
    records = []
    b = 0
    while b < len(raw):
        ts_us, mlen = struct.unpack_from(">qI", raw, b)
        b += 12
        records.append(
            {"timestamp_us": ts_us, "payload": raw[b : b + mlen].decode()}
        )
        b += mlen
    return {
        "token": token,
        "range_index": range_index,
        "gen_version": gen_version,
        "topic": topic,
        "start_offset": start_offset,
        "records": records,
    }, pos
