"""Live binary TCP producer server e2e: handshake, pipelined produce
frames coalesced into one write group, acks per stream, error paths.
Mirrors the reference's binary server behavior
(internal/producing/binary_server.go:76-118)."""

from __future__ import annotations

import socket

import pytest

from barco_spark.sources.wire import (
    ERROR_OP,
    HEADER_SIZE,
    HEARTBEAT_OP,
    PRODUCE_RESPONSE_OP,
    READY_OP,
    STARTUP_OP,
    encode_frame,
    encode_produce_frame,
    parse_header,
)


@pytest.fixture()
def served_log(spark, tmp_path):
    from barco_spark.sources.eventlog import EventLog
    from barco_spark.sources.tcp_server import BinaryProducerServer

    log = EventLog(spark, str(tmp_path / "log"))
    srv = BinaryProducerServer(log)
    srv.start()
    yield srv, log
    srv.stop()


def _recv_frame(sock):
    head = b""
    while len(head) < HEADER_SIZE:
        chunk = sock.recv(HEADER_SIZE - len(head))
        assert chunk, "server closed mid-header"
        head += chunk
    flags, stream_id, op, body_len = parse_header(head)
    body = b""
    while len(body) < body_len:
        body += sock.recv(body_len - len(body))
    return stream_id, op, body


def test_binary_roundtrip_startup_produce_poll(served_log):
    srv, log = served_log
    with socket.create_connection(("127.0.0.1", srv.port)) as sock:
        sock.sendall(encode_frame(STARTUP_OP, stream_id=7))
        sid, op, _ = _recv_frame(sock)
        assert (sid, op) == (7, READY_OP)

        # pipeline three produce frames (two topics) in one burst: the
        # server coalesces them into one write group per topic
        burst = (
            encode_produce_frame("ta", ["m1", "m2"], partition_key="k", stream_id=1)
            + encode_produce_frame("ta", ["m3"], stream_id=2,
                                   timestamp_us=1_700_000_000_000_000)
            + encode_produce_frame("tb", ["x1"], partition_key="k2", stream_id=3)
        )
        sock.sendall(burst)
        acks = sorted(_recv_frame(sock)[:2] for _ in range(3))
        assert acks == [
            (1, PRODUCE_RESPONSE_OP),
            (2, PRODUCE_RESPONSE_OP),
            (3, PRODUCE_RESPONSE_OP),
        ]

        # heartbeat keeps the connection alive
        sock.sendall(encode_frame(HEARTBEAT_OP, stream_id=9))
        assert _recv_frame(sock)[:2] == (9, READY_OP)

    log.register("g", ["ta", "tb"], reset="earliest")
    got_a = sorted(
        r["payload"] for r in log.poll("g", "ta", max_records_per_bucket=100).collect()
    )
    got_b = [r["payload"] for r in log.poll("g", "tb", max_records_per_bucket=100).collect()]
    assert got_a == ["m1", "m2", "m3"]
    assert got_b == ["x1"]


def test_binary_rejects_non_startup_first_frame(served_log):
    srv, _log = served_log
    with socket.create_connection(("127.0.0.1", srv.port)) as sock:
        sock.sendall(encode_produce_frame("t", ["m"], stream_id=5))
        sid, op, body = _recv_frame(sock)
        assert (sid, op) == (5, ERROR_OP)
        assert body[0] == 0  # serverError code
        assert b"Invalid first message" in body[1:]


def test_binary_rejects_corrupt_header(served_log):
    srv, _log = served_log
    with socket.create_connection(("127.0.0.1", srv.port)) as sock:
        frame = bytearray(encode_frame(STARTUP_OP, stream_id=1))
        frame[12] ^= 0xFF  # flip a CRC byte
        sock.sendall(bytes(frame))
        _sid, op, body = _recv_frame(sock)
        assert op == ERROR_OP
        assert b"crc mismatch" in body[1:]
        # connection is closed after the error
        assert sock.recv(1) == b""


def test_binary_fragmented_pipeline_not_torn(served_log):
    """A frame whose header arrives before its body must not be torn by
    the coalescing drain (the nonblocking peek covers only byte 1)."""
    import time

    srv, log = served_log
    f1 = encode_produce_frame("tf", ["a"], stream_id=1)
    f2 = encode_produce_frame("tf", ["b"], stream_id=2)
    with socket.create_connection(("127.0.0.1", srv.port)) as sock:
        sock.sendall(encode_frame(STARTUP_OP))
        _recv_frame(sock)
        sock.sendall(f1 + f2[: HEADER_SIZE + 3])  # frame 2 torn mid-body
        time.sleep(0.05)
        sock.sendall(f2[HEADER_SIZE + 3 :])
        acks = sorted(_recv_frame(sock)[:2] for _ in range(2))
        assert acks == [(1, PRODUCE_RESPONSE_OP), (2, PRODUCE_RESPONSE_OP)]
    log.register("g", ["tf"], reset="earliest")
    assert sorted(
        r["payload"] for r in log.poll("g", "tf", max_records_per_bucket=10).collect()
    ) == ["a", "b"]


def test_binary_produce_preserves_microsecond_timestamp(served_log):
    """The wire carries integer epoch micros; the stored timestamp must
    round-trip exactly (float division would lose sub-us precision)."""
    ts_us = 1_700_000_000_123_457  # odd microsecond on purpose
    srv, log = served_log
    with socket.create_connection(("127.0.0.1", srv.port)) as sock:
        sock.sendall(encode_frame(STARTUP_OP))
        _recv_frame(sock)
        sock.sendall(
            encode_produce_frame("tts", ["x"], stream_id=1, timestamp_us=ts_us)
        )
        assert _recv_frame(sock)[:2] == (1, PRODUCE_RESPONSE_OP)
    log.register("g", ["tts"], reset="earliest")
    row = log.poll("g", "tts", max_records_per_bucket=10).collect()[0]
    import datetime as dt

    got = row["timestamp"]
    expect = dt.datetime.fromtimestamp(ts_us // 1_000_000) + dt.timedelta(
        microseconds=ts_us % 1_000_000
    )
    assert got.replace(tzinfo=None) == expect.replace(tzinfo=None) or (
        got.microsecond == expect.microsecond
    )
