"""Model-based randomized broker check, mirroring the reference's
largest test surface (offset_state_test.go, consumer semantics): a
random interleaving of produce / poll / goodbye across topics and
groups must deliver, per (group, topic, key), exactly the produced
payload sequence in produce order once fully drained — no loss, no
duplication (no crashes here; crash redelivery is covered in
test_eventlog.py::test_at_least_once_redelivery_on_crash).
"""

from __future__ import annotations

import random

import pytest

from barco_spark.sources.eventlog import EventLog

TOPICS = ["alpha", "beta"]
GROUPS = ["g1", "g2"]
KEYS = ["k1", "k2", "k3"]


@pytest.fixture
def log(spark, tmp_path):
    return EventLog(spark, str(tmp_path / "log"))


def _drain(log, group, topic, delivered):
    """Poll until two consecutive empty batches (commits stragglers)."""
    empties = 0
    while empties < 2:
        rows = (
            log.poll(group, topic, max_records_per_bucket=1000)
            .select("partition_key", "payload", "bucket", "offset")
            .collect()
        )
        if not rows:
            empties += 1
            continue
        empties = 0
        # per-bucket offset order IS delivery order within the batch
        for r in sorted(rows, key=lambda r: (r.bucket, r.offset)):
            delivered.setdefault((group, topic, r.partition_key), []).append(
                r.payload
            )
    log.goodbye(group, topic)


def test_random_interleaving_delivers_everything_once(log):
    rng = random.Random(20260813)
    produced: dict[tuple[str, str], list[str]] = {}
    delivered: dict[tuple[str, str, str], list[str]] = {}
    n_payload = 0

    for step in range(14):
        op = rng.choice(["produce", "produce", "poll"])
        topic = rng.choice(TOPICS)
        if op == "produce":
            batch = []
            for _ in range(rng.randint(1, 12)):
                key = rng.choice(KEYS)
                batch.append((key, f"m{n_payload}"))
                produced.setdefault((topic, key), []).append(f"m{n_payload}")
                n_payload += 1
            log.produce(topic, batch)
        else:
            group = rng.choice(GROUPS)
            rows = (
                log.poll(group, topic, max_records_per_bucket=rng.randint(1, 5))
                .select("partition_key", "payload", "bucket", "offset")
                .collect()
            )
            for r in sorted(rows, key=lambda r: (r.bucket, r.offset)):
                delivered.setdefault((group, topic, r.partition_key), []).append(
                    r.payload
                )

    for group in GROUPS:
        for topic in TOPICS:
            _drain(log, group, topic, delivered)

    # every group sees, per (topic, key), exactly the produced sequence
    for group in GROUPS:
        for (topic, key), want in produced.items():
            got = delivered.get((group, topic, key), [])
            assert got == want, (group, topic, key, got, want)


def test_membership_rebalance_matches_deal_out_on_join_and_leave():
    """Ownership after join/leave must equal the reference's pure
    deal-out of the new member list (consumer_state.go:308-350), with
    churn inside the debounce window coalesced into one rebalance
    (consumer_state.go:181-272)."""
    from barco_spark.sources.eventlog import assign_buckets
    from barco_spark.sources.membership import GroupMembership

    clock = [0.0]
    m = GroupMembership(buckets=12, debounce_s=5.0, clock=lambda: clock[0])

    m.join("g", "c1")  # first membership applies immediately
    assert m.assignment("g") == assign_buckets(["c1"], 12)
    assert m.buckets_for("g", "c1") == list(range(12))

    # a joining consumer does not steal ownership inside the window
    m.join("g", "c2")
    assert m.rebalance_pending("g")
    assert m.buckets_for("g", "c2") == []
    assert m.buckets_for("g", "c1") == list(range(12))

    # more churn extends the window instead of rebalancing twice
    clock[0] = 3.0
    m.join("g", "c3")
    clock[0] = 7.0  # past the first deadline, inside the extended one
    assert m.buckets_for("g", "c2") == []

    clock[0] = 8.1  # past the extended deadline -> ONE rebalance to 3 members
    assert m.assignment("g") == assign_buckets(["c1", "c2", "c3"], 12)
    assert m.buckets_for("g", "c1") == [0, 1, 2, 3]
    assert m.buckets_for("g", "c2") == [4, 5, 6, 7]
    assert m.buckets_for("g", "c3") == [8, 9, 10, 11]

    # leave: the departed consumer's buckets move exactly as a fresh
    # deal-out of the remaining members says
    m.leave("g", "c2")
    clock[0] = 14.0
    assert m.assignment("g") == assign_buckets(["c1", "c3"], 12)
    assert m.buckets_for("g", "c1") == [0, 1, 2, 3, 4, 5]
    assert m.buckets_for("g", "c3") == [6, 7, 8, 9, 10, 11]

    # idempotent re-join of an existing member is not churn
    m.join("g", "c1")
    assert not m.rebalance_pending("g")
