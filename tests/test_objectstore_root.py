"""Object-store (scheme://) log roots, exercised over file:// — the
scheme-generic pyarrow.fs code path shared with s3://, gs://, hdfs://.

Round-4 verdict item 5: the maintenance surfaces (compact,
compact_offsets, retention_cleanup, membership) must work on roots
with no atomic rename. compact() swaps visibility through a per-topic
epoch manifest (single small-object PUT); compact_offsets relies on
the offsets log's latest-wins idempotence; retention is delete-only.
"""

from __future__ import annotations

import os

import pytest

from barco_spark.sources.eventlog import EventLog


@pytest.fixture()
def fs_log(spark, tmp_path):
    return EventLog(spark, f"file://{tmp_path}/log")


def _payloads(log, topic):
    return sorted(r["payload"] for r in log.read(topic).collect())


def test_produce_read_poll_roundtrip_on_scheme_root(fs_log):
    log = fs_log
    n = log.produce("t", [("k1", "a"), ("k2", "b"), (None, "c")])
    assert n == 3
    assert _payloads(log, "t") == ["a", "b", "c"]
    log.register("g", ["t"], reset="earliest")
    got = sorted(r["payload"] for r in log.poll("g", "t").collect())
    assert got == ["a", "b", "c"]
    # watermarks + topics discovery work scheme-generically
    assert sum(log.high_watermarks("t").values()) == 3
    assert log.topics() == ["t"]


def test_compact_swaps_via_epoch_manifest(fs_log, tmp_path):
    from barco_spark.sources import objectstore as obs

    log = fs_log
    for batch in range(3):
        log.produce("t", [(f"k{i}", f"b{batch}-m{i}") for i in range(8)])
    before = sorted(
        (r["bucket"], r["offset"], r["payload"]) for r in log.read("t").collect()
    )

    log.compact("t")
    # rows and offsets byte-identical through the swap
    after = sorted(
        (r["bucket"], r["offset"], r["payload"]) for r in log.read("t").collect()
    )
    assert after == before
    # manifest points at epoch 1; the old default-prefix files are gone
    m = obs.read_json(log._manifest_uri("t"))
    assert m == {"prefix": "data-e1", "epoch": 1}
    assert obs.list_files(f"{log.root}/data/topic=t", ".parquet") == []
    assert obs.list_files(f"{log.root}/data-e1/topic=t", ".parquet")

    # post-compaction produce appends into the CURRENT epoch prefix and
    # offsets continue the sequence
    wm_before = log.high_watermarks("t")
    log.produce("t", [("k1", "late-1")])
    wm_after = log.high_watermarks("t")
    assert sum(wm_after.values()) == sum(wm_before.values()) + 1
    assert "late-1" in _payloads(log, "t")
    assert obs.list_files(f"{log.root}/data/topic=t", ".parquet") == []

    # a second compaction bumps the epoch and clears e1
    log.compact("t")
    m2 = obs.read_json(log._manifest_uri("t"))
    assert m2 == {"prefix": "data-e2", "epoch": 2}
    assert obs.list_files(f"{log.root}/data-e1/topic=t", ".parquet") == []
    assert sorted(r["payload"] for r in log.read("t").collect()) == sorted(
        [f"b{b}-m{i}" for b in range(3) for i in range(8)] + ["late-1"]
    )
    # topics discovery still finds the manifest-only topic
    assert log.topics() == ["t"]


def test_compact_offsets_on_scheme_root(fs_log):
    from barco_spark.sources import objectstore as obs

    log = fs_log
    log.produce("t", [f"m{i}" for i in range(12)])
    log.register("g", ["t"], reset="earliest")
    for i in range(1, 6):
        log.commit("g", "t", {0: i, 1: i})
    files_before = obs.list_files(log._offsets_path, ".parquet")
    assert len(files_before) > 1
    kept = log.compact_offsets()
    assert kept > 0
    files_after = obs.list_files(log._offsets_path, ".parquet")
    assert len(files_after) < len(files_before)
    # positions resolve identically after the rewrite
    assert log.committed("g", "t")[0] == 5
    assert log.committed("g", "t")[1] == 5
    # later commits still win
    log.commit("g", "t", {0: 9})
    assert log.committed("g", "t")[0] == 9


def test_retention_cleanup_on_scheme_root(fs_log, tmp_path):
    from barco_spark.sources import objectstore as obs

    log = fs_log
    log.produce("t", [f"m{i}" for i in range(6)])
    files = obs.list_files(f"{log.root}/data", ".parquet")
    assert files
    # age half the files past the window (file:// lets the test reach
    # the real mtimes the sweep reads)
    old = files[: len(files) // 2 or 1]
    for uri, _m, _s in old:
        local = uri[len("file://"):]
        os.utime(local, (1_000_000, 1_000_000))
    deleted = log.retention_cleanup(max_age_hours=1)
    assert deleted == len(old)
    remaining = obs.list_files(f"{log.root}/data", ".parquet")
    assert len(remaining) == len(files) - len(old)
    # young files survive a second sweep
    assert log.retention_cleanup(max_age_hours=1) == 0


def test_fs_membership_store_roundtrip(tmp_path):
    from barco_spark.sources.membership import FsMembershipStore

    store = FsMembershipStore(f"file://{tmp_path}/log")
    v0 = store.version()
    store.put("g", "c1", ["t1", "t2"])
    store.put("g2", "c 2", ["t3"])  # space: URL-quoted object names
    assert store.version() != v0
    assert store.consumers() == {
        "c1": ("g", ["t1", "t2"]),
        "c 2": ("g2", ["t3"]),
    }
    assert store.members() == {"g": {"c1"}, "g2": {"c 2"}}

    act0 = store.last_active()
    assert set(act0) == {"c1", "c 2"} and act0["c 2"][0] == "g2"
    import time

    time.sleep(0.02)
    store.touch("g", "c1")
    assert store.last_active()["c1"][1] > act0["c1"][1]

    store.remove("g", "c1")
    assert "c1" not in store.consumers()
    # touch of a removed consumer is a no-op, not a resurrection
    store.touch("g", "c1")
    assert "c1" not in store.consumers()


def test_facade_on_scheme_root_with_durable_membership(spark, tmp_path):
    """The facade over a scheme:// root now keeps durable membership
    (FsMembershipStore) — registrations survive a facade restart, the
    guarantee object-store deployments previously lost."""
    import json
    import urllib.request

    from barco_spark.sources.http_server import BrokerHttpServer
    from barco_spark.sources.membership import FsMembershipStore

    def req(port, method, path, body=None):
        r = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=body.encode() if body is not None else None,
            method=method,
        )
        r.add_header("Accept", "application/json")  # poll default is binary
        if body is not None:
            r.add_header("Content-Type", "text/plain")
        with urllib.request.urlopen(r) as resp:
            return resp.status, resp.read().decode()

    root = f"file://{tmp_path}/log"
    srv = BrokerHttpServer(EventLog(spark, root))
    srv.start()
    try:
        assert isinstance(srv.store, FsMembershipStore)
        code, body = req(srv.port, "POST", "/v1/topic/t/messages", body="m0")
        assert code == 200 and json.loads(body)["produced"] == 1
        code, _ = req(
            srv.port, "PUT",
            "/v1/consumer/register?consumerId=c1&group=g&topic=t&onNewGroup=earliest",
            body=" ",
        )
        assert code == 200
        code, body = req(srv.port, "POST", "/v1/consumer/poll?consumerId=c1", body=" ")
        assert code == 200
        assert [v for it in json.loads(body) for v in it["values"]] == ["m0"]
    finally:
        srv.stop()

    # restart: the registration is recovered from the store
    srv2 = BrokerHttpServer(EventLog(spark, root))
    srv2.start()
    try:
        assert "c1" in srv2._consumers
        code, _ = req(srv2.port, "POST", "/v1/consumer/poll?consumerId=c1", body=" ")
        assert code in (200, 204)
    finally:
        srv2.stop()


def test_fs_store_touch_keeps_version_stable(tmp_path):
    """Per-poll activity must not churn registration version(): peers
    would otherwise full-rescan the store on EVERY poll (O(C^2) fleet
    work). touch() writes a separate heartbeat object excluded from
    the version stamp; only join/leave moves the version."""
    import time

    from barco_spark.sources.membership import FsMembershipStore

    store = FsMembershipStore(f"file://{tmp_path}/log")
    store.put("g", "c1", ["t"])
    v1 = store.version()
    t0 = store.last_active()["c1"][1]
    time.sleep(0.02)
    store.touch("g", "c1")
    store.touch("g", "c1")
    assert store.version() == v1, "touch must not bump version"
    assert store.last_active()["c1"][1] > t0, "touch must bump activity"
    # remove cleans the heartbeat object too: no orphan resurrection
    store.remove("g", "c1")
    assert store.version() != v1
    assert "c1" not in store.last_active()
    assert not list((tmp_path / "log" / "_membership").rglob("*.hb"))


def test_produce_fence_on_scheme_root(tmp_path):
    """Object-store write fence (single-writer-per-topic under clock
    skew): a facade whose heartbeat went stale in the STORE's clock
    frame refuses produce; a facade whose heartbeat predates a peer's
    topic lease refuses; current leadership proceeds and bumps the
    lease epoch."""
    import json as _json
    import os
    import time

    import pytest as _pytest

    from barco_spark.sources.membership import (
        FacadeRegistry,
        ProduceFencedError,
    )

    root = f"file://{tmp_path}/log"
    a = FacadeRegistry(root, "fa", "127.0.0.1", 1, ttl_s=15.0)
    b = FacadeRegistry(root, "fb", "127.0.0.1", 2, ttl_s=15.0)
    a.announce()
    b.announce()

    # healthy leader passes and writes the epoch lease
    a.produce_fence("t")
    lease_path = tmp_path / "log" / "_facades" / "_leases" / "t.lease"
    assert _json.loads(lease_path.read_text()) == {"facade_id": "fa", "epoch": 1}
    a.produce_fence("t")
    assert _json.loads(lease_path.read_text())["epoch"] == 2

    # lease files must never pollute the facade live set
    assert set(a.live()) == {"fa", "fb"}

    # stale-heartbeat fence: age fa's stamp past ttl relative to fb's
    fa_obj = tmp_path / "log" / "_facades" / "fa.json"
    old = time.time() - 60
    os.utime(fa_obj, (old, old))
    with _pytest.raises(ProduceFencedError, match="stale"):
        a.produce_fence("t")
    # the refusal re-announced: a retry now passes
    a.produce_fence("t")

    # lease fence (handoff contest): fb's heartbeat predates fa's lease
    # write, so fb must first refuse + re-announce, then the retry's
    # fresh stamp out-dates the idle lease and fb claims it
    with _pytest.raises(ProduceFencedError, match="leadership moved"):
        b.produce_fence("t")
    b.produce_fence("t")
    assert _json.loads(lease_path.read_text())["facade_id"] == "fb"
    # and symmetrically back: fa's stamp now predates fb's lease
    with _pytest.raises(ProduceFencedError, match="leadership moved"):
        a.produce_fence("t")
    a.produce_fence("t")
    assert _json.loads(lease_path.read_text())["facade_id"] == "fa"
