"""Murmur3/token-ring parity with the reference's published vectors.

Vectors from internal/types/murmur_test.go (gocql/Cassandra test data)
and the integration fixtures (roundtrip_test.go:29-34).
"""

from __future__ import annotations

from barco_spark.functions.tokens import (
    CHUNK_SIZE_UNIT,
    murmur3_token_py,
    token_at_index,
    token_to_bucket_py,
)


def test_cassandra_sign_vector():
    key = bytes.fromhex("00104327529fb645dd00b883ec39ae448bb800000400066a6b00")
    assert murmur3_token_py(key) == -9223371632693506265


def test_all_tail_lengths():
    # every tail branch 0..15 must run and be stable
    base = b"0123456789abcdefXYZ"
    seen = {murmur3_token_py(base[:n]) for n in range(17)}
    assert len(seen) == 17  # distinct hashes, no crashes


def test_empty_key_token():
    assert murmur3_token_py(b"") == 0


def test_reference_fixture_brokers():
    # roundtrip_test.go:29-34: keys pinned to broker ordinals on a
    # 3-broker ring: "123"->T0, "567"->T1, "234"->T2
    for key, broker in [("123", 0), ("567", 1), ("234", 2)]:
        bucket = token_to_bucket_py(murmur3_token_py(key.encode()), 3, 4)
        assert bucket // 4 == broker, key


def test_ring_tokens_monotonic():
    toks = [token_at_index(3, i) for i in range(3)]
    assert toks[0] == -(1 << 63)
    assert toks == sorted(toks)
    assert toks[1] - toks[0] == CHUNK_SIZE_UNIT * 4096


def test_bucket_range():
    for key in [b"a", b"b", b"xyz", b"123456", b"\x00\x01"]:
        b = token_to_bucket_py(murmur3_token_py(key), 3, 4)
        assert 0 <= b < 12
