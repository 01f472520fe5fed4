"""Partition-key -> token -> bucket routing (reference operators P1/P2).

The reference hashes the partition key with the Cassandra-compatible
Murmur3 x64_128 (h1 only) into a signed 64-bit token
(/root/reference/internal/types/murmur.go:37-148, token.go:44-46), then
maps the token onto a ring of `3*2^n` broker tokens subdivided into
`consumerRanges` slices (token.go:49-72); total partitions =
brokers x ranges (docs/features/partitioning/README.md:8-11).

This module provides:

- ``murmur3_token_py``       exact Cassandra Murmur3H1 (pure Python),
                             independently written from the published
                             algorithm (Austin Appleby's MurmurHash3 +
                             Cassandra's signed-tail-byte variant).
- ``murmur3_token_udf``      Arrow-batched pandas UDF of the above.
- ``token_to_bucket_py``     ring lookup: token -> global bucket id.
- ``bucket_for_key_udf``     key -> bucket in one pandas UDF (hot path).
- ``fast_bucket_expr``       pure-JVM bucketing via pmod(hash(key), P)
                             for when bit-compat with Cassandra rings
                             does not matter (100 TB hot path: stays in
                             whole-stage codegen, no Python).

Scale note: exact-compat hashing is only needed when interoperating
with an existing reference deployment's ring; for everything else use
``fast_bucket_expr`` which never leaves the JVM.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType, LongType

_MASK = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F
_FMIX1 = 0xFF51AFD7ED558CCD
_FMIX2 = 0xC4CEB9FE1A85EC53

# Ring constants (reference token.go:30-33): ring capacity 3*2^12,
# chunk unit = floor((2^64-1) / 12288), start token = MinInt64.
MAX_RING_SIZE = 12288
CHUNK_SIZE_UNIT = ((1 << 64) - 1) // MAX_RING_SIZE
START_TOKEN = -(1 << 63)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _fmix(n: int) -> int:
    n ^= n >> 33
    n = (n * _FMIX1) & _MASK
    n ^= n >> 33
    n = (n * _FMIX2) & _MASK
    n ^= n >> 33
    return n


def _signed_byte(b: int) -> int:
    # Cassandra's variant sign-extends each tail byte (int8) before use.
    return b if b < 0x80 else b | 0xFFFFFFFFFFFFFF00


def murmur3_token_py(data: bytes) -> int:
    """Cassandra Murmur3 x64_128, first 64-bit half, as signed int64."""
    length = len(data)
    h1 = 0
    h2 = 0
    n_blocks = length // 16
    for i in range(n_blocks):
        off = i * 16
        k1 = int.from_bytes(data[off : off + 8], "little")
        k2 = int.from_bytes(data[off + 8 : off + 16], "little")

        k1 = (k1 * _C1) & _MASK
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _MASK
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _MASK
        h1 = (h1 * 5 + 0x52DCE729) & _MASK

        k2 = (k2 * _C2) & _MASK
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _MASK
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _MASK
        h2 = (h2 * 5 + 0x38495AB5) & _MASK

    tail = data[n_blocks * 16 :]
    k1 = 0
    k2 = 0
    t = length & 15
    if t >= 9:
        for i in range(t - 1, 8 - 1, -1):
            k2 ^= (_signed_byte(tail[i]) << ((i - 8) * 8)) & _MASK
        k2 = (k2 * _C2) & _MASK
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _MASK
        h2 ^= k2
    if t >= 1:
        for i in range(min(t, 8) - 1, -1, -1):
            k1 ^= (_signed_byte(tail[i]) << (i * 8)) & _MASK
        k1 = (k1 * _C1) & _MASK
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _MASK
        h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _MASK

    # unsigned -> signed int64
    return h1 - (1 << 64) if h1 >= (1 << 63) else h1


def _ring_factor(cluster_size: int) -> int:
    return MAX_RING_SIZE // cluster_size


def token_at_index(cluster_size: int, index: int) -> int:
    """Start token owned by broker ordinal `index` (token.go:68-72)."""
    index = index % cluster_size
    return START_TOKEN + CHUNK_SIZE_UNIT * _ring_factor(cluster_size) * index


def token_to_bucket_py(token: int, brokers: int = 3, ranges: int = 4) -> int:
    """Token -> global bucket id = brokerIndex * ranges + rangeIndex.

    Mirrors GetPrimaryTokenIndex (token.go:49-66): binary-search the ring
    for the owning broker, then split its chunk into `ranges` slices; a
    token falling into the oversized final slice wraps to rangeIndex 0.
    """
    # broker index: largest i with token_at_index(i) <= token
    step = CHUNK_SIZE_UNIT * _ring_factor(brokers)
    idx = (token - START_TOKEN) // step
    if idx >= brokers:
        idx = brokers - 1
    range_size = step // ranges
    token_diff = abs(token - token_at_index(brokers, int(idx)))
    range_index = token_diff // range_size
    if range_index >= ranges:
        range_index = 0
    return int(idx) * ranges + int(range_index)


def range_bounds(
    broker_index: int, range_index: int, cluster_size: int, ranges: int = 4
) -> tuple[int, int]:
    """[start, end) token bounds of one (broker, rangeIndex) slice.

    Mirrors RangeByTokenAndClusterSize (token.go:87-116): the broker's
    chunk is `ranges` equal slices; the final slice absorbs the
    remainder up to the next broker token (or MaxInt64 for the last
    broker).
    """
    step = CHUNK_SIZE_UNIT * _ring_factor(cluster_size)
    start = token_at_index(cluster_size, broker_index)
    range_size = step // ranges
    lo = start + range_size * range_index
    if range_index == ranges - 1:
        hi = (
            token_at_index(cluster_size, broker_index + 1)
            if broker_index < cluster_size - 1
            else (1 << 63) - 1
        )
    else:
        hi = start + range_size * (range_index + 1)
    return lo, hi


def project_bucket(bucket: int, from_brokers: int, to_brokers: int, ranges: int = 4) -> list[int]:
    """Project a bucket across a cluster resize (P5/R10 analogue).

    Doubling the cluster splits each broker's range in two: bucket b
    maps to [2b, 2b+1]-style descendants; halving joins two source
    buckets into one. Mirrors ProjectRangeByClusterSize
    (token.go:133-163) / offsetSplit-offsetJoin
    (offset_state.go:616-774). Our engine fixes the bucket count so
    this is only needed when interoperating with a resizing reference
    deployment.
    """
    if to_brokers == from_brokers:
        return [bucket]
    if to_brokers not in (from_brokers * 2, from_brokers // 2):
        raise ValueError("cluster sizes must differ by a factor of 2")
    broker, r = divmod(bucket, ranges)
    lo, hi = range_bounds(broker, r, from_brokers, ranges)
    out = []
    for nb in range(to_brokers):
        for nr in range(ranges):
            nlo, nhi = range_bounds(nb, nr, to_brokers, ranges)
            if nlo < hi and lo < nhi:  # token intervals intersect
                out.append(nb * ranges + nr)
    return out


def murmur3_token_udf() -> Column:
    """pandas UDF factory: string key -> signed int64 Cassandra token."""

    @pandas_udf(LongType())
    def _tok(keys: pd.Series) -> pd.Series:
        return keys.map(
            lambda k: None if k is None else murmur3_token_py(str(k).encode("utf-8"))
        ).astype("Int64")

    return _tok


def bucket_for_key_udf(brokers: int = 3, ranges: int = 4) -> Column:
    """pandas UDF factory: key -> reference-exact bucket id (P1+P2)."""

    @pandas_udf(IntegerType())
    def _bucket(keys: pd.Series) -> pd.Series:
        def one(k):
            if k is None or k == "":
                return None  # keyless: round-robin placement handled upstream
            return token_to_bucket_py(
                murmur3_token_py(str(k).encode("utf-8")), brokers, ranges
            )

        return keys.map(one).astype("Int32")

    return _bucket


def fast_bucket_expr(key: Column | str, num_buckets: int) -> Column:
    """JVM-only bucketing: pmod(murmur3_32(key), P).

    Not bit-compatible with the Cassandra ring but fully codegen'd —
    this is the default hot path at scale. Null/empty keys get a
    round-robin bucket (reference keyless behavior,
    discoverer.go:370-411) via a per-partition monotonic id.

    Caveat: the monotonic-id round-robin is position-based and thus NOT
    stable across re-executions of a nondeterministic lineage; pipelines
    that evaluate the frame more than once (e.g. EventLog.produce) must
    use content-hash spreading instead (see eventlog.py).
    """
    key_col = F.col(key) if isinstance(key, str) else key
    keyed = F.pmod(F.hash(key_col), F.lit(num_buckets))
    round_robin = F.pmod(F.monotonically_increasing_id(), F.lit(num_buckets))
    return (
        F.when(key_col.isNull() | (key_col == F.lit("")), round_robin)
        .otherwise(keyed)
        .cast(IntegerType())
    )


# -- Spark-compatible Murmur3 x86_32 (the JVM fast path's hash) --------
_M32 = 0xFFFFFFFF
_C1_32 = 0xCC9E2D51
_C2_32 = 0x1B873593


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _mix_k1_32(k1: int) -> int:
    k1 = (k1 * _C1_32) & _M32
    k1 = _rotl32(k1, 15)
    return (k1 * _C2_32) & _M32


def _mix_h1_32(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M32


def spark_hash32_py(data: bytes, seed: int = 42) -> int:
    """Bit-exact Python twin of Spark's ``F.hash`` on a string column
    (``Murmur3_x86_32.hashUnsafeBytes`` over the UTF-8 bytes, seed 42):
    4-byte little-endian blocks, then each TAIL byte sign-extended and
    mixed as a full round (Spark's variant differs from canonical
    murmur3 here). Returns the signed int32 Spark returns.

    Exists so the Spark-free arrow produce path routes a key to the
    SAME bucket as the JVM ``fast_bucket_expr`` — per-key ordering must
    hold across both write paths. Verified against ``F.hash`` on
    randomized keys in tests/test_tokens.py.
    """
    h1 = seed & _M32
    n = len(data)
    aligned = n - n % 4
    for i in range(0, aligned, 4):
        half = int.from_bytes(data[i : i + 4], "little")
        h1 = _mix_h1_32(h1, _mix_k1_32(half))
    for i in range(aligned, n):
        b = data[i]
        half = b if b < 0x80 else b | 0xFFFFFF00  # signed byte, as uint32
        h1 = _mix_h1_32(h1, _mix_k1_32(half))
    h1 ^= n
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def spark_bucket_py(key: str, num_buckets: int) -> int:
    """pmod(spark_hash32_py(utf8(key)), num_buckets) — the Python twin
    of ``fast_bucket_expr``'s keyed branch."""
    h = spark_hash32_py(key.encode("utf-8"))
    r = h % num_buckets if num_buckets > 0 else 0
    return r if r >= 0 else r + num_buckets
