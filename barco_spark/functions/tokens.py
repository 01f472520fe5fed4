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


def murmur3_tail_oracle_ctes(
    keys_cte: str = "keys",
    key_col: str = "pk",
    brokers: int = 3,
    ranges: int = 4,
) -> str:
    """DuckDB-SQL Cassandra Murmur3 (P1) + ring bucket (P2) as chained
    CTEs — the oracle half of ``events_exact_tokens``.

    Pure-SQL re-derivation of ``murmur3_token_py`` for keys of <= 15
    ASCII bytes (the tail-only path: no 16-byte blocks, and ``ord`` of
    a single-byte char IS the byte).  Every 64-bit wrapping operation
    is staged through HUGEINT (int128):

    - wrapping multiply a*c (a < 2^64): 64x64 products overflow even
      int128, so split a into 32-bit halves — a*c mod 2^64 =
      ((a%2^32)*c + ((a>>32)*(c%2^32) mod 2^32)<<32) mod 2^64; both
      partial products stay under 2^96.
    - rotl(a,r) = ((a<<r) | (a>>64-r)) mod 2^64 (a<<r < 2^97, fits).
    - xor/>> are native HUGEINT ops.

    Each mul/rotl input must be a bare column (the expression expands
    it 3x), so the pipeline is one CTE per step.  The final CTE,
    ``mm_out``, yields (pk, token BIGINT, bucket INT) with the exact
    GetPrimaryTokenIndex ring arithmetic (token.go:49-66).

    Differential-fuzzed against murmur3_token_py in
    tests/test_tokens.py; the pandas UDF remains the general path for
    arbitrary-length / non-ASCII keys.
    """
    M = 1 << 64
    C1 = 0x87C37B91114253D5
    C2 = 0x4CF5AD432745937F
    F1 = 0xFF51AFD7ED558CCD
    F2 = 0xC4CEB9FE1A85EC53

    def mul(a: str, c: int) -> str:
        lo = f"(({a} % 4294967296) * {c}::HUGEINT) % {M}"
        hi = f"((({a} // 4294967296) * {c % (1 << 32)}::HUGEINT) % 4294967296) * 4294967296"
        return f"(({lo}) + ({hi})) % {M}"

    def rotl(a: str, r: int) -> str:
        return f"((({a}) << {r}) | (({a}) >> {64 - r})) % {M}"

    def sbyte(i: int) -> str:
        # i is 0-based; ord of the single-byte char, sign-extended to
        # the 64-bit two's-complement value Cassandra uses (int8 cast)
        o = f"ord(substr({key_col}, {i + 1}, 1))::HUGEINT"
        return (
            f"(CASE WHEN length({key_col}) <= {i} THEN 0::HUGEINT "
            f"WHEN {o} >= 128 THEN {o} + {M - 256} ELSE {o} END)"
        )

    def xor_chain(terms: list[str]) -> str:
        out = terms[0]
        for t in terms[1:]:
            out = f"xor({out}, {t})"
        return out

    k1_terms = [f"(({sbyte(i)} << {8 * i}) % {M})" for i in range(8)]
    k2_terms = [f"(({sbyte(i)} << {8 * (i - 8)}) % {M})" for i in range(8, 15)]

    step = CHUNK_SIZE_UNIT * _ring_factor(brokers)
    rsize = step // ranges

    return f"""
    mm0 AS (
      SELECT {key_col}, length({key_col})::HUGEINT AS len,
             {xor_chain(k1_terms)} AS k1r,
             {xor_chain(k2_terms)} AS k2r
      FROM {keys_cte}),
    mm1 AS (SELECT *, {mul('k1r', C1)} AS k1a, {mul('k2r', C2)} AS k2a FROM mm0),
    mm2 AS (SELECT *, {rotl('k1a', 31)} AS k1b, {rotl('k2a', 33)} AS k2b FROM mm1),
    mm3 AS (SELECT *, {mul('k1b', C2)} AS k1c, {mul('k2b', C1)} AS k2c FROM mm2),
    mm4 AS (SELECT *, xor(k1c, len) AS h1x, xor(k2c, len) AS h2x FROM mm3),
    mm5 AS (SELECT *, (h1x + h2x) % {M} AS h1s FROM mm4),
    mm6 AS (SELECT *, (h2x + h1s) % {M} AS h2s FROM mm5),
    mm7 AS (SELECT *, xor(h1s, h1s >> 33) AS f1a, xor(h2s, h2s >> 33) AS f2a FROM mm6),
    mm8 AS (SELECT *, {mul('f1a', F1)} AS f1b, {mul('f2a', F1)} AS f2b FROM mm7),
    mm9 AS (SELECT *, xor(f1b, f1b >> 33) AS f1c, xor(f2b, f2b >> 33) AS f2c FROM mm8),
    mm10 AS (SELECT *, {mul('f1c', F2)} AS f1d, {mul('f2c', F2)} AS f2d FROM mm9),
    mm11 AS (SELECT *, xor(f1d, f1d >> 33) AS h1f, xor(f2d, f2d >> 33) AS h2f FROM mm10),
    mm12 AS (SELECT *, (h1f + h2f) % {M} AS h1o FROM mm11),
    mm13 AS (
      SELECT {key_col},
             CAST(CASE WHEN h1o >= {1 << 63} THEN h1o - {M}::HUGEINT
                       ELSE h1o END AS BIGINT) AS token,
             -- ring offset = token - START_TOKEN (START = -2^63): in
             -- unsigned form that is the sign bit flipped
             (h1o + {1 << 63}::HUGEINT) % {M} AS u
      FROM mm12),
    mm14 AS (
      SELECT {key_col}, token,
             CASE WHEN u // {step} >= {brokers} THEN {brokers - 1}
                  ELSE u // {step} END AS idx, u
      FROM mm13),
    mm_out AS (
      SELECT {key_col}, token,
             CAST(idx * {ranges} +
                  CASE WHEN (u - idx * {step}::HUGEINT) // {rsize} >= {ranges}
                       THEN 0
                       ELSE (u - idx * {step}::HUGEINT) // {rsize} END
                  AS INTEGER) AS bucket
      FROM mm14)"""


def spark_hash32_oracle_ctes(
    keys_cte: str = "keys",
    key_col: str = "pk",
    num_buckets: int = 12,
    max_len: int = 15,
) -> str:
    """DuckDB-SQL twin of Spark's ``F.hash`` on a string column
    (Murmur3_x86_32 over UTF-8 bytes, seed 42) + the keyed-bucket pmod
    — the oracle half of ``consumer_lag_report`` (and any query that
    needs the JVM fast path's ``pmod(hash(key), buckets)`` routing,
    ``fast_bucket_expr``'s keyed branch, re-derived outside Spark).

    Valid for ASCII keys of <= ``max_len`` bytes (integer-string ids at
    every SF): ASCII bytes are < 0x80, so Spark's sign-extended tail
    rounds reduce to the plain byte value. The hash is iterative —
    ``len//4`` little-endian 4-byte block rounds, then one round PER
    tail byte (Spark's variant; canonical murmur3 folds the tail
    differently) — so the SQL unrolls ``ceil(max_len/4)+3`` rounds and
    gates each on the key's length. All 32-bit wrapping arithmetic is
    staged through HUGEINT (products < 2^64 overflow signed BIGINT).

    Emits chained CTEs ending in ``sb_out(key_col, hash32, bucket)``.
    Differential-fuzzed against ``spark_hash32_py`` / ``spark_bucket_py``
    (themselves verified against ``F.hash``) in tests/test_tokens.py.
    """
    M = 1 << 32
    C1, C2 = 0xCC9E2D51, 0x1B873593

    def mul(a: str, c: int) -> str:
        return f"(({a}) * {c}::HUGEINT) % {M}"

    def rotl(a: str, r: int) -> str:
        return f"((({a}) << {r}) | (({a}) >> {32 - r})) % {M}"

    def byte(pos: str | int) -> str:
        # 1-based substr; ASCII => ord IS the byte, no sign extension
        # (position cast to BIGINT: len-derived offsets are HUGEINT)
        return (
            f"ord(substr({key_col}, CAST(({pos}) + 1 AS BIGINT), 1))::HUGEINT"
        )

    n_block_rounds = max_len // 4
    n_rounds = n_block_rounds + 3  # at most 3 tail bytes
    ctes = [
        f"sb0 AS (SELECT {key_col}, length({key_col})::HUGEINT AS len, "
        f"42::HUGEINT AS h0 FROM {keys_cte})"
    ]
    for j in range(n_rounds):
        h, hn = f"h{j}", f"h{j + 1}"
        # round j consumes: a 4-byte LE block when j < len//4, the
        # (j - len//4)-th tail byte when j < len//4 + len%4, else nothing
        block_word = " + ".join(
            f"({byte(4 * j + b)} << {8 * b})" for b in range(4)
        )
        tail_pos = f"(3 * (len // 4) + {j})"  # = 4*(len//4) + (j - len//4)
        ctes.append(
            f"sb{j}w AS (SELECT *, CASE "
            f"WHEN len // 4 > {j} THEN ({block_word}) % {M} "
            f"WHEN (len // 4) + (len % 4) > {j} THEN {byte(tail_pos)} "
            f"ELSE NULL END AS w{j} FROM sb{j})"
        )
        ctes.append(f"sb{j}a AS (SELECT *, {mul(f'w{j}', C1)} AS ka{j} FROM sb{j}w)")
        ctes.append(f"sb{j}b AS (SELECT *, {rotl(f'ka{j}', 15)} AS kb{j} FROM sb{j}a)")
        ctes.append(f"sb{j}c AS (SELECT *, {mul(f'kb{j}', C2)} AS kc{j} FROM sb{j}b)")
        ctes.append(
            f"sb{j}d AS (SELECT *, xor({h}, kc{j}) AS hx{j} FROM sb{j}c)"
        )
        ctes.append(
            f"sb{j}e AS (SELECT *, ({rotl(f'hx{j}', 13)} * 5 + 3864292196) % {M} "
            f"AS hm{j} FROM sb{j}d)"
        )
        ctes.append(
            f"sb{j + 1} AS (SELECT *, CASE WHEN w{j} IS NULL THEN {h} "
            f"ELSE hm{j} END AS {hn} FROM sb{j}e)"
        )
    hf = f"h{n_rounds}"
    ctes.append(f"sbf0 AS (SELECT *, xor({hf}, len) AS g0 FROM sb{n_rounds})")
    ctes.append("sbf1 AS (SELECT *, xor(g0, g0 >> 16) AS g1 FROM sbf0)")
    ctes.append(f"sbf2 AS (SELECT *, {mul('g1', 0x85EBCA6B)} AS g2 FROM sbf1)")
    ctes.append("sbf3 AS (SELECT *, xor(g2, g2 >> 13) AS g3 FROM sbf2)")
    ctes.append(f"sbf4 AS (SELECT *, {mul('g3', 0xC2B2AE35)} AS g4 FROM sbf3)")
    ctes.append("sbf5 AS (SELECT *, xor(g4, g4 >> 16) AS g5 FROM sbf4)")
    ctes.append(
        f"sb_out AS (SELECT {key_col}, "
        f"CAST(CASE WHEN g5 >= {1 << 31} THEN g5 - {M} ELSE g5 END AS INTEGER)"
        f" AS hash32, "
        # pmod on the unsigned form: g5 % B == pmod(signed, B) because
        # signed = g5 - 2^32 and 2^32 % B folds in ... only when B
        # divides 2^32; do the explicit double-mod on the SIGNED value
        f"CAST((((CAST(CASE WHEN g5 >= {1 << 31} THEN g5 - {M} ELSE g5 END"
        f" AS BIGINT) % {num_buckets}) + {num_buckets}) % {num_buckets})"
        f" AS INTEGER) AS bucket "
        f"FROM sbf5)"
    )
    return ",\n    ".join(ctes)
