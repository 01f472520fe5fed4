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


def test_range_bounds_partition_ring():
    from barco_spark.functions.tokens import range_bounds

    # the 12 slices of a 3-broker/4-range ring tile [MinInt64, MaxInt64)
    prev_hi = None
    for b in range(12):
        lo, hi = range_bounds(b // 4, b % 4, 3, 4)
        assert lo < hi
        if prev_hi is not None:
            assert lo == prev_hi
        prev_hi = hi
    assert range_bounds(0, 0, 3, 4)[0] == -(1 << 63)
    assert range_bounds(2, 3, 3, 4)[1] == (1 << 63) - 1


def test_project_bucket_split_and_join():
    from barco_spark.functions.tokens import project_bucket, range_bounds

    # scale-up 3->6: every bucket maps to >=1 descendant; descendants
    # cover the source token interval exactly
    for b in range(12):
        kids = project_bucket(b, 3, 6)
        assert kids
        lo, hi = range_bounds(b // 4, b % 4, 3, 4)
        klo = min(range_bounds(k // 4, k % 4, 6, 4)[0] for k in kids)
        khi = max(range_bounds(k // 4, k % 4, 6, 4)[1] for k in kids)
        assert klo <= lo and khi >= hi
    # scale-down 6->3 is the inverse relation
    for b in range(24):
        parents = project_bucket(b, 6, 3)
        assert parents
        for p in parents:
            assert b in project_bucket(p, 3, 6)


def test_project_bucket_identity_and_error():
    import pytest
    from barco_spark.functions.tokens import project_bucket

    assert project_bucket(5, 3, 3) == [5]
    with pytest.raises(ValueError):
        project_bucket(0, 3, 9)


def test_spark_hash32_matches_f_hash(spark):
    """spark_hash32_py must be bit-exact with F.hash on strings —
    per-key ordering across the Spark and arrow produce paths depends
    on both routing a key to the same bucket."""
    import random

    from pyspark.sql import functions as F

    from barco_spark.functions.tokens import spark_bucket_py, spark_hash32_py

    rng = random.Random(7)
    keys = ["", "a", "ab", "abc", "abcd", "abcde", "héllo", "ключ", "字キー",
            "123", "-", " ", "\n", "\x00x"]
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789-_ éß中"
    keys += ["".join(rng.choice(alpha) for _ in range(rng.randrange(0, 40)))
             for _ in range(300)]
    df = spark.createDataFrame([(k,) for k in keys], ["k"]).select(
        "k",
        F.hash(F.col("k")).alias("h"),
        F.pmod(F.hash(F.col("k")), F.lit(12)).cast("int").alias("b"),
    )
    for row in df.collect():
        assert spark_hash32_py(row["k"].encode("utf-8")) == row["h"], row["k"]
        assert spark_bucket_py(row["k"], 12) == row["b"], row["k"]


def test_murmur3_sql_oracle_matches_python_fuzz():
    """The pure-DuckDB Murmur3 oracle (murmur3_tail_oracle_ctes) must
    be bit-exact vs the Python twin for ANY ASCII key of 1..15 bytes —
    token AND ring bucket. Hypothesis drives printable-ASCII keys
    through every tail length, including the k2 path (len >= 9) and
    high-ordinal bytes just under 0x80."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from barco_spark.functions.tokens import (
        murmur3_tail_oracle_ctes,
        murmur3_token_py,
        token_to_bucket_py,
    )

    sql_tpl = (
        "WITH keys AS (SELECT ? AS pk), "
        + murmur3_tail_oracle_ctes()
        + " SELECT token, bucket FROM mm_out"
    )
    con = duckdb.connect()

    @settings(max_examples=200, deadline=None)
    @given(
        st.text(
            alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
            min_size=1,
            max_size=15,
        )
    )
    def check(key):
        tok, bucket = con.execute(sql_tpl, [key]).fetchone()
        exp_tok = murmur3_token_py(key.encode("ascii"))
        assert tok == exp_tok, (key, tok, exp_tok)
        assert bucket == token_to_bucket_py(exp_tok), key

    try:
        check()
    finally:
        con.close()


def test_spark_hash32_sql_oracle_matches_python_fuzz():
    """The pure-DuckDB Spark-hash oracle (spark_hash32_oracle_ctes)
    must be bit-exact vs the Python twin (itself verified against
    F.hash) for ANY ASCII key of 0..15 bytes — hash AND pmod bucket.
    Hypothesis covers every block/tail-round combination (0-3 blocks x
    0-3 tail bytes) including the empty key."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from barco_spark.functions.tokens import (
        spark_bucket_py,
        spark_hash32_oracle_ctes,
        spark_hash32_py,
    )

    sql_tpl = (
        "WITH keys AS (SELECT ? AS pk), "
        + spark_hash32_oracle_ctes()
        + " SELECT hash32, bucket FROM sb_out"
    )
    con = duckdb.connect()

    @settings(max_examples=200, deadline=None)
    @given(
        st.text(
            alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
            min_size=0,
            max_size=15,
        )
    )
    def check(key):
        h, bucket = con.execute(sql_tpl, [key]).fetchone()
        assert h == spark_hash32_py(key.encode("ascii")), (key, h)
        assert bucket == spark_bucket_py(key, 12), key

    try:
        check()
    finally:
        con.close()
