"""The Python client library (barco_spark/client.py) e2e against the
live facade: discovery, leader-following produce, binary-default polls
decoded field-for-field, JSON mode, commit/goodbye lifecycle."""

from __future__ import annotations

import pytest

from barco_spark.client import BarcoConsumer, BarcoProducer, discover


@pytest.fixture()
def server(spark, tmp_path):
    from barco_spark.sources.eventlog import EventLog
    from barco_spark.sources.http_server import BrokerHttpServer

    s = BrokerHttpServer(EventLog(spark, str(tmp_path / "log")))
    s.start()
    try:
        yield s
    finally:
        s.stop()


def _base(server) -> str:
    return f"http://127.0.0.1:{server.port}"


def test_discovery_and_produce_consume_roundtrip(server):
    topo = discover(_base(server))
    assert topo["length"] >= 1
    prod = BarcoProducer(_base(server))
    for i in range(10):
        out = prod.produce("t", f"m{i}", key=f"k{i % 3}")
        assert out["produced"] == 1
    with BarcoConsumer(_base(server), "c1", "g1", "t") as cons:
        got: list[str] = []
        for _ in range(5):
            got.extend(cons.payloads())
            if len(got) >= 10:
                break
        assert sorted(got) == sorted(f"m{i}" for i in range(10))
        committed = cons.commit()
        assert "committed" in committed
    # after goodbye, a NEW consumer in the same group resumes past the
    # committed records: nothing is redelivered
    with BarcoConsumer(_base(server), "c2", "g1", "t") as c2:
        assert c2.payloads() == []


def test_json_mode_matches_binary(server):
    prod = BarcoProducer(_base(server))
    for i in range(6):
        prod.produce("t2", f"x{i}", key="k")
    with BarcoConsumer(_base(server), "cb", "gb", "t2") as cb:
        bin_payloads = sorted(cb.payloads())
    with BarcoConsumer(
        _base(server), "cj", "gj", "t2", json_mode=True
    ) as cj:
        json_payloads = sorted(cj.payloads())
    assert bin_payloads == json_payloads == sorted(f"x{i}" for i in range(6))


def test_producer_follows_topic_leader_across_facades(spark, tmp_path):
    from barco_spark.sources.eventlog import EventLog
    from barco_spark.sources.http_server import BrokerHttpServer

    root = str(tmp_path / "log")
    fa = BrokerHttpServer(EventLog(spark, root))
    fb = BrokerHttpServer(EventLog(spark, root))
    fa.start(), fb.start()
    try:
        leader_id = fa.registry.leader_for("lt")[0]
        follower = fb if leader_id == fa.registry.facade_id else fa
        # aim the producer at the NON-leader: the client must follow the
        # 307 and land the write on the leader
        prod = BarcoProducer(f"http://127.0.0.1:{follower.port}")
        assert prod.produce("lt", "hello", key="k")["produced"] == 1
        assert prod._leader["lt"] != f"http://127.0.0.1:{follower.port}"
        # cached leader: second send goes direct (no 307 hop)
        assert prod.produce("lt", "again", key="k")["produced"] == 1
        rows = spark.read.parquet(root + "/data").collect()
        assert sorted(r["payload"] for r in rows) == ["again", "hello"]
    finally:
        fa.stop(), fb.stop()


def test_evicted_consumer_transparently_reregisters(spark, tmp_path):
    """R13 eviction from the CLIENT's view: a consumer idle past the
    read timeout is dropped server-side; its next poll re-registers
    transparently and resumes from the group's committed offsets (no
    redelivery of committed records, no skips of new ones)."""
    import time as _t

    from barco_spark.sources.eventlog import EventLog
    from barco_spark.sources.http_server import BrokerHttpServer

    s = BrokerHttpServer(
        EventLog(spark, str(tmp_path / "log")), consumer_read_timeout_s=0.4
    )
    s.start()
    try:
        base = f"http://127.0.0.1:{s.port}"
        prod = BarcoProducer(base)
        for i in range(4):
            prod.produce("t", f"a{i}", key="k")
        cons = BarcoConsumer(base, "ce", "ge", "t")
        got = []
        for _ in range(5):
            got.extend(cons.payloads())
            if len(got) >= 4:
                break
        assert sorted(got) == [f"a{i}" for i in range(4)]
        cons.commit()
        _t.sleep(0.6)  # idle past the timeout; next sweep evicts
        # a second consumer's poll triggers the sweep that evicts ce
        other = BarcoConsumer(base, "cx", "gx", "t")
        other.poll()
        for i in range(2):
            prod.produce("t", f"b{i}", key="k")
        got2 = []
        for _ in range(5):
            got2.extend(cons.payloads())  # transparently re-registers
            if len(got2) >= 2:
                break
        assert sorted(got2) == ["b0", "b1"]  # resumed, not redelivered
    finally:
        s.stop()


def test_bound_consumer_client_roundtrip_and_disconnect(spark, tmp_path):
    """BarcoBoundConsumer speaks the reference's connection-bound
    protocol end-to-end: JSON ConsumerInfo register on a keep-alive
    connection, consumerId-less binary polls, and close() re-deals the
    buckets to survivors immediately."""
    import time as _t

    from barco_spark.client import BarcoBoundConsumer, BarcoProducer
    from barco_spark.sources.eventlog import EventLog
    from barco_spark.sources.http_server import BrokerHttpServer

    srv = BrokerHttpServer(EventLog(spark, str(tmp_path / "log")))
    srv.start()
    try:
        p = BarcoProducer(f"http://127.0.0.1:{srv.port}")
        for i in range(6):
            assert p.produce("t", f"m{i}", key=f"k{i}")["produced"] == 1
        with BarcoBoundConsumer(
            "127.0.0.1", srv.port, "bc1", "g", "t"
        ) as c:
            got: list[str] = []
            deadline = _t.monotonic() + 30
            while len(got) < 6 and _t.monotonic() < deadline:
                got.extend(c.payloads())
            assert sorted(got) == [f"m{i}" for i in range(6)]
            assert "bc1" in srv._consumers
        # context exit closed the socket -> immediate unregister
        deadline = _t.monotonic() + 5
        while "bc1" in srv._consumers and _t.monotonic() < deadline:
            _t.sleep(0.05)
        assert "bc1" not in srv._consumers
    finally:
        srv.stop()
