"""Produce->consume roundtrips, mirroring the reference's own
integration suite (internal/test/integration/roundtrip_test.go).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from barco_spark.sources.eventlog import EventLog, assign_buckets


@pytest.fixture()
def log(spark, tmp_path):
    return EventLog(spark, str(tmp_path / "log"))


def test_roundtrip_smoke(log):
    # roundtrip_test.go:80-117: produce one JSON message, poll returns it
    # exactly once, next poll is empty
    log.register("g1", ["abc"], reset="earliest")
    n = log.produce("abc", ['{"hello": "world"}'], partition_key="123")
    assert n == 1
    batch = log.poll("g1", "abc").collect()
    assert len(batch) == 1
    assert batch[0]["payload"] == '{"hello": "world"}'
    assert batch[0]["offset"] == 0
    assert log.poll("g1", "abc").count() == 0


def test_ndjson_produce(log):
    # roundtrip_test.go:258: NDJSON body becomes N records
    log.register("g1", ["t"], reset="earliest")
    body = "\n".join(json.dumps({"i": i}) for i in range(5))
    assert log.produce("t", [body], ndjson=True) == 5
    assert log.poll("g1", "t").count() == 5


def test_per_key_ordering(log):
    # same partition key => same bucket => contiguous offsets in produce
    # order (docs/rest_api/README.md:69-72)
    log.register("g", ["t"], reset="earliest")
    msgs = [json.dumps({"seq": i}) for i in range(20)]
    log.produce("t", msgs, partition_key="k1")
    rows = (
        log.poll("g", "t")
        .filter(F.col("partition_key") == "k1")
        .orderBy("offset")
        .collect()
    )
    assert len(rows) == 20
    assert len({r["bucket"] for r in rows}) == 1  # one bucket per key
    assert [r["offset"] for r in rows] == list(range(20))
    assert [json.loads(r["payload"])["seq"] for r in rows] == list(range(20))


def test_offsets_continue_across_batches(log):
    log.register("g", ["t"], reset="earliest")
    log.produce("t", ["a", "b"], partition_key="k")
    log.produce("t", ["c", "d"], partition_key="k")
    rows = log.poll("g", "t").orderBy("offset").collect()
    assert [r["offset"] for r in rows] == [0, 1, 2, 3]
    assert [r["payload"] for r in rows] == ["a", "b", "c", "d"]


def test_consumer_groups_independent(log):
    log.register("g1", ["t"], reset="earliest")
    log.register("g2", ["t"], reset="earliest")
    log.produce("t", ["x"], partition_key="k")
    assert log.poll("g1", "t").count() == 1
    assert log.poll("g1", "t").count() == 0
    # g2 has its own offsets: still sees the record
    assert log.poll("g2", "t").count() == 1


def test_reset_latest_skips_history(log):
    log.produce("t", ["old1", "old2"], partition_key="k")
    log.register("g", ["t"], reset="latest")  # default policy R9
    assert log.poll("g", "t").count() == 0
    log.produce("t", ["new"], partition_key="k")
    rows = log.poll("g", "t").collect()
    assert [r["payload"] for r in rows] == ["new"]


def test_keyless_round_robin_spreads(log):
    # empty key => round-robin placement (discoverer.go:370-411)
    log.register("g", ["t"], reset="earliest")
    log.produce("t", [f"m{i}" for i in range(48)])
    buckets = {r["bucket"] for r in log.poll("g", "t").collect()}
    assert len(buckets) > 1


def test_assignment_deterministic():
    # R3: pure function of (consumer list, bucket count); order-free
    a = assign_buckets(["c2", "c1", "c3"], 12)
    b = assign_buckets(["c1", "c3", "c2"], 12)
    assert a == b
    assert sorted(x for lst in a.values() for x in lst) == list(range(12))
    # single consumer owns everything
    assert assign_buckets(["solo"], 12) == {"solo": list(range(12))}


def test_partitioned_poll_covers_all(log):
    log.register("g", ["t"], reset="earliest")
    log.produce("t", [(f"key{i}", f"m{i}") for i in range(40)])
    assignment = assign_buckets(["c1", "c2"], log.buckets)
    n1 = log.poll("g", "t", buckets=assignment["c1"]).count()
    n2 = log.poll("g", "t", buckets=assignment["c2"]).count()
    assert n1 + n2 == 40
    assert log.poll("g", "t").count() == 0  # everything committed


def test_manual_commit(log):
    log.register("g", ["t"], reset="earliest")
    log.produce("t", ["a", "b", "c"], partition_key="k")
    batch = log.poll("g", "t", auto_commit=False)
    assert batch.count() == 3
    # without commit, the same data is re-served (at-least-once)
    assert log.poll("g", "t", auto_commit=False).count() == 3
    rows = batch.groupBy("bucket").agg((F.max("offset") + 1).alias("nxt")).collect()
    log.commit("g", "t", {r["bucket"]: r["nxt"] for r in rows})
    assert log.poll("g", "t").count() == 0


def test_topics_isolated(log):
    log.register("g", ["t1", "t2"], reset="earliest")
    log.produce("t1", ["a"], partition_key="k")
    log.produce("t2", ["b", "c"], partition_key="k")
    assert log.poll("g", "t1").count() == 1
    assert log.poll("g", "t2").count() == 2


def test_retention_cleanup(log):
    log.produce("t", ["a"], partition_key="k")
    # age 0 => everything is older than the cutoff
    deleted = log.retention_cleanup(max_age_hours=0)
    assert deleted >= 1


def test_poll_json_response_shape(log):
    import json as _json

    log.register("g", ["t"], reset="earliest")
    log.produce("t", ["a", "b", "c"], partition_key="k")
    rows = log.poll_json("g", "t").collect()
    assert len(rows) == 1  # one key -> one bucket -> one response item
    obj = _json.loads(rows[0]["response"])
    assert obj["topic"] == "t"
    assert obj["startOffset"] == 0
    assert obj["values"] == ["a", "b", "c"]


def test_topics_listing(log):
    assert log.topics() == []
    log.produce("zeta", ["a"], partition_key="k")
    log.produce("alpha", ["b"], partition_key="k")
    assert log.topics() == ["alpha", "zeta"]


def test_consumer_lag(log):
    log.register("g", ["t"], reset="earliest")
    log.produce("t", ["a", "b", "c"], partition_key="k")
    total_lag = sum(r["lag"] for r in log.lag("g", "t").collect())
    assert total_lag == 3
    log.poll("g", "t")  # serves the batch (commit happens on NEXT poll)
    log.poll("g", "t")  # promotes the served position durably
    assert sum(r["lag"] for r in log.lag("g", "t").collect()) == 0


def test_compact_preserves_offsets(log):
    log.register("g", ["t"], reset="earliest")
    for i in range(5):  # 5 produce batches => many small files
        log.produce("t", [f"m{i}a", f"m{i}b"], partition_key="k")
    import glob

    before = len(glob.glob(f"{log.root}/data/topic=t/**/*.parquet", recursive=True))
    rows_before = sorted(
        (r["offset"], r["payload"]) for r in log.read("t").collect()
    )
    log.compact("t")
    after = len(glob.glob(f"{log.root}/data/topic=t/**/*.parquet", recursive=True))
    rows_after = sorted(
        (r["offset"], r["payload"]) for r in log.read("t").collect()
    )
    assert rows_after == rows_before
    assert after < before
    # offsets still continue correctly after compaction
    log.produce("t", ["post"], partition_key="k")
    assert [r["payload"] for r in log.poll("g", "t").orderBy("offset").collect()][
        -1
    ] == "post"


def test_register_restart_keeps_position(spark, tmp_path):
    # R9: the reset policy applies only to NEW groups; a consumer that
    # restarts and re-registers must keep its committed position
    from barco_spark.sources.eventlog import EventLog

    log = EventLog(spark, str(tmp_path / "log"))
    log.register("g", ["t"], reset="earliest")
    log.produce("t", ["a", "b"], partition_key="k")
    assert log.poll("g", "t").count() == 2
    log.goodbye("g", "t")  # durable ack
    log.produce("t", ["c"], partition_key="k")
    # restart: fresh instance re-registers with the default latest reset
    log2 = EventLog(spark, str(tmp_path / "log"))
    log2.register("g", ["t"], reset="latest")
    rows = log2.poll("g", "t").collect()
    assert [r["payload"] for r in rows] == ["c"]  # not skipped


def test_at_least_once_redelivery_on_crash(spark, tmp_path):
    # a consumer that is served a batch but dies before its next poll
    # (no goodbye) must be re-served that batch on restart
    from barco_spark.sources.eventlog import EventLog

    log = EventLog(spark, str(tmp_path / "log"))
    log.register("g", ["t"], reset="earliest")
    log.produce("t", ["a", "b"], partition_key="k")
    assert log.poll("g", "t").count() == 2  # served, NOT yet committed
    # crash: new instance, no goodbye; durable commit never happened
    log2 = EventLog(spark, str(tmp_path / "log"))
    assert log2.poll("g", "t").count() == 2  # redelivered
    assert log2.poll("g", "t").count() == 0  # second poll committed them


def test_manual_commit_flow_redelivers_on_crash_never_skips(spark, tmp_path):
    """The documented manual-ack flow (item: poll(auto_commit=False) +
    commit_served): a crash BEFORE the ack redelivers everything, the
    ack commits exactly what was served, and nothing is ever skipped."""
    log = EventLog(spark, str(tmp_path / "log"))
    log.register("g", ["t"], reset="earliest")
    log.produce("t", ["a", "b", "c"], partition_key="k")
    assert log.poll("g", "t", auto_commit=False).count() == 3
    # crash before the ack: fresh instance redelivers the full batch
    log2 = EventLog(spark, str(tmp_path / "log"))
    batch = log2.poll("g", "t", auto_commit=False)
    assert sorted(r["payload"] for r in batch.collect()) == ["a", "b", "c"]
    # manual ack commits the furthest served position durably
    acked = log2.commit_served("g", "t")
    assert acked and all(n > 0 for n in acked.values())
    # after the ack nothing is re-served — by this instance or a restart
    assert log2.poll("g", "t", auto_commit=False).count() == 0
    log3 = EventLog(spark, str(tmp_path / "log"))
    log3.produce("t", ["d"], partition_key="k")
    rows = log3.poll("g", "t", auto_commit=False).collect()
    assert [r["payload"] for r in rows] == ["d"]  # new data only, none skipped
    # the Spark-free facade flow shares the same manual-ack contract
    served = log3.poll_dicts("g", "t", auto_commit=False)
    assert [v for it in served for v in it["values"]] == ["d"]
    log3.commit_served("g", "t")
    assert log3.poll_dicts("g", "t", auto_commit=False) == []


def test_poll_empty_assignment(log):
    # a starved consumer (assign_buckets with more consumers than
    # buckets) polls an empty assignment and must idle, not crash
    log.produce("t", ["a"], partition_key="k")
    assert log.poll("g", "t", buckets=[]).count() == 0


def test_keyless_routing_stable(log):
    # content-hash round-robin: same payloads -> same buckets on replay
    log.register("g", ["t"], reset="earliest")
    log.produce("t", [f"m{i}" for i in range(20)])
    a = {r["payload"]: r["bucket"] for r in log.poll("g", "t").collect()}
    log2_root = log.root + "2"
    from barco_spark.sources.eventlog import EventLog

    log2 = EventLog(log.spark, log2_root)
    log2.register("g", ["t"], reset="earliest")
    log2.produce("t", [f"m{i}" for i in range(20)])
    b = {r["payload"]: r["bucket"] for r in log2.poll("g", "t").collect()}
    assert a == b


def test_consumer_group_shrink(log):
    # scale-down analogue (reference scale_down_test.go): c2 leaves;
    # c1 takes over all buckets and consumption continues seamlessly
    log.register("g", ["t"], reset="earliest")
    log.produce("t", [(f"k{i}", f"m{i}") for i in range(24)])
    two = assign_buckets(["c1", "c2"], log.buckets)
    n_c1 = log.poll("g", "t", buckets=two["c1"]).count()
    log.poll("g", "t", buckets=two["c1"])  # promote c1's served offsets
    # c2 never polls (died); c1 now owns everything
    solo = assign_buckets(["c1"], log.buckets)
    remaining = log.poll("g", "t", buckets=solo["c1"]).count()
    assert n_c1 + remaining == 24
    log.poll("g", "t", buckets=solo["c1"])
    assert log.poll("g", "t").count() == 0


def test_dev_mode_single_broker(spark, tmp_path):
    # reference dev mode: one broker, fewer ranges
    # (internal/test/integration/dev_mode_test.go:29-112)
    from barco_spark.config import EngineConfig
    from barco_spark.sources.eventlog import EventLog

    cfg = EngineConfig(brokers=1, consumer_ranges=4)
    log = EventLog(spark, str(tmp_path / "log"), config=cfg)
    assert log.buckets == 4
    log.register("g", ["t"], reset="earliest")
    log.produce("t", [(f"k{i}", f"m{i}") for i in range(12)])
    rows = log.poll("g", "t").collect()
    assert len(rows) == 12
    assert all(0 <= r["bucket"] < 4 for r in rows)
    assert log.poll("g", "t").count() == 0  # same consumer: batch served once


def test_parse_topic(log):
    from barco_spark.sources.eventlog import parse_topic

    log.produce(
        "t",
        ['{"productId": 123, "units": -5}', '{"productId": 7}', "not json"],
        partition_key="k",
    )
    rows = (
        parse_topic(log, "t", "productId INT, units INT")
        .orderBy("offset")
        .collect()
    )
    assert [r["productId"] for r in rows] == [123, 7, None]
    assert [r["units"] for r in rows] == [-5, None, None]
    assert rows[0]["offset"] == 0  # metadata retained


def test_produce_rejects_binary_payload_column(spark, tmp_path):
    """A binary payload column must fail loudly: writing it would split
    the log schema across files and silently mangle bytes on read."""
    import pytest
    from pyspark.sql import functions as F

    from barco_spark.sources.eventlog import EventLog

    log = EventLog(spark, str(tmp_path / "log"))
    df = spark.range(3).select(
        F.lit(None).cast("string").alias("partition_key"),
        F.col("id").cast("string").cast("binary").alias("payload"),
    )
    with pytest.raises(TypeError, match="payload must be a string"):
        log.produce("t", df)


def test_produce_rejects_oversized_payload_every_surface(spark, tmp_path):
    """MaxMessageSize (EngineConfig.max_message_size_bytes, reference
    default 1 MiB per config.go:252-254) must bound EVERY ingest
    surface, not just the HTTP facade: bulk list produce, DataFrame
    produce (the streaming foreachBatch path funnels here), and the
    Spark-free produce_arrow fast path. The check is inline with the
    write (no extra validation job) and byte-based (octet_length)."""
    import pytest
    from pyspark.sql import functions as F

    from barco_spark.config import EngineConfig
    from barco_spark.sources.eventlog import EventLog

    # a small cap makes the test cheap; the knob is the config field
    cfg = EngineConfig(max_message_size_bytes=64)
    log = EventLog(spark, str(tmp_path / "log"), config=cfg)

    # list produce
    with pytest.raises(Exception, match="exceeds max message size"):
        log.produce("t", ["ok", "x" * 65])
    # DataFrame produce (the streaming ingest shape)
    df = spark.range(2).select(
        F.lit("k").alias("partition_key"),
        F.concat(F.lit("y" * 70), F.col("id").cast("string")).alias("payload"),
    )
    with pytest.raises(Exception, match="exceeds max message size"):
        log.produce("t", df)
    # byte-based, not char-based: 33 three-byte chars > 64-byte cap
    with pytest.raises(Exception, match="exceeds max message size"):
        log.produce("t", ["€" * 33])
    # Spark-free arrow fast path
    with pytest.raises(ValueError, match="exceeds max message size"):
        log.produce_arrow("t", [("k", "z" * 65, None)])

    # nothing landed, and at-cap payloads still write on every surface
    assert log.produce("t", ["a" * 64]) == 1
    assert log.produce_arrow("t", [("k", "b" * 64, None)]) == 1
    rows = spark.read.parquet(str(tmp_path / "log" / "data")).collect()
    assert sorted(r["payload"][0] for r in rows) == ["a", "b"]


def test_compact_offsets_bounds_files_and_preserves_positions(spark, tmp_path):
    """A long-lived group appends one small parquet file per commit;
    compact_offsets() must fold the log to its latest row per
    (group, topic, bucket) without changing what any group reads next.
    Mirrors the reference's compact SQLite offset store
    (internal/localdb/migrations.go:37-48)."""
    import dataclasses

    from barco_spark.config import DEFAULT
    from barco_spark.sources.eventlog import EventLog

    log = EventLog(spark, str(tmp_path / "log"))
    log.produce("t", [f"m{i}" for i in range(40)], partition_key=None)
    log.register("g1", ["t"], reset="earliest")
    log.register("g2", ["t"], reset="earliest")
    # many explicit commits = many appended files
    for i in range(1, 11):
        log.commit("g1", "t", {b: i for b in range(3)})
        log.commit("g2", "t", {b: 2 * i for b in range(2)})
    files_before = log._offsets_file_count()
    assert files_before > 20
    before_g1 = log.committed("g1", "t")
    before_g2 = log.committed("g2", "t")

    kept = log.compact_offsets()
    assert log._offsets_file_count() == 1
    # one row per (group, topic, bucket) across both groups
    assert kept == 2 * log.buckets
    assert log.committed("g1", "t") == before_g1
    assert log.committed("g2", "t") == before_g2

    # a later commit still wins over the compacted history
    log.commit("g1", "t", {0: 99})
    assert log.committed("g1", "t")[0] == 99


def test_goodbye_triggers_offsets_compaction(spark, tmp_path):
    import dataclasses

    from barco_spark.config import DEFAULT
    from barco_spark.sources.eventlog import EventLog

    cfg = dataclasses.replace(DEFAULT, offsets_compact_threshold=5)
    log = EventLog(spark, str(tmp_path / "log"), config=cfg)
    log.produce("t", [f"m{i}" for i in range(24)], partition_key=None)
    log.register("g", ["t"], reset="earliest")
    # commits now self-compact past the threshold (arrow-native, no
    # Spark job): the file set stays bounded even without a goodbye —
    # a long-lived poll loop used to grow one file per poll, making
    # every later read O(polls)
    for i in range(1, 12):
        log.commit("g", "t", {0: i})
        assert log._offsets_file_count() <= cfg.offsets_compact_threshold + 1
    assert log.committed("g", "t")[0] == 11  # compaction kept latest-wins
    before = log.committed("g", "t")
    log.poll("g", "t", max_records_per_bucket=2)
    log.goodbye("g", "t")  # flushes served positions, then compacts
    after = log.committed("g", "t")
    # served batch was committed by goodbye; everything else unchanged
    assert after[0] >= before[0]


def test_offsets_swap_crash_recovery(spark, tmp_path):
    """compact_offsets() swaps the store via rename-aside (old -> trash,
    tmp -> live, delete trash). Simulate a crash at each window and
    assert the committed positions survive — the old rmtree-then-move
    ordering lost the whole log in the first window."""
    import os
    import shutil

    from barco_spark.sources.eventlog import EventLog

    log = EventLog(spark, str(tmp_path / "log"))
    log.produce("t", [f"m{i}" for i in range(20)])
    log.register("g", ["t"], reset="earliest")
    for _ in range(3):
        log.poll("g", "t", max_records_per_bucket=2)
    pos = log.committed("g", "t")
    assert pos

    # window A: old store moved to trash, new store not yet in place
    trash = str(tmp_path / "log" / "_offsets_trash")
    os.rename(log._offsets_path, trash)
    assert log.committed("g", "t") == pos  # recovered transparently
    assert log._committed_arrow("g", "t") == pos

    # window B: swap completed but trash not yet deleted -> stale trash
    # (holding an OLDER position) must be discarded, not resurrected
    shutil.copytree(log._offsets_path, trash)
    log.produce("t", [f"n{i}" for i in range(40)])  # new data to advance past
    log.poll("g", "t", max_records_per_bucket=50)
    log.commit_served("g", "t")
    newer = log.committed("g", "t")
    assert newer != pos
    assert not os.path.isdir(trash)  # recovery removed the stale copy
    assert log._committed_arrow("g", "t") == newer


def test_poll_dicts_matches_poll_json(spark, tmp_path):
    """The Spark-free poll serves byte-identical response items to the
    Spark poll_json path on the same log state."""
    import json as _json

    from barco_spark.sources.eventlog import EventLog

    log_a = EventLog(spark, str(tmp_path / "log_shared"))
    log_a.produce("t", [(f"k{i}", f"m{i}") for i in range(57)])
    log_a.register("ga", ["t"], reset="earliest")
    log_a.register("gb", ["t"], reset="earliest")

    fast = log_a.poll_dicts("ga", "t", max_records_per_bucket=10)
    slow = [
        _json.loads(r["response"])
        for r in log_a.poll_json("gb", "t", max_records_per_bucket=10).collect()
    ]
    key = lambda d: d["bucket"]  # noqa: E731
    assert sorted(fast, key=key) == sorted(slow, key=key)


def test_keyless_produce_is_single_pass(spark, tmp_path):
    """The statically-keyless fast path schedules exactly TWO Spark
    jobs per produce — the footer-stats watermark lookup and the write
    itself (with its Observation riding along). No persist, no counting
    job, no shuffle (plan-asserted): the reference's packed keyless
    write shape (docs/benchmarks/README.md:34-35, W1)."""
    from pyspark.sql import functions as F

    from barco_spark.sources.eventlog import EventLog

    log = EventLog(spark, str(tmp_path / "log"))
    src = spark.range(5000).select(
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("payload")
    )
    log.produce("warm", src.limit(10))  # settle lazy session init

    def jobs():
        return spark.sparkContext._jsc.sc().dagScheduler().numTotalJobs()

    before = jobs()
    n = log.produce("t", src)
    assert n == 5000
    assert jobs() - before <= 2, "keyless produce must be watermark + write only"

    # contiguity + spread survive the arithmetic assignment
    rows = log.read("t").select("bucket", "offset").collect()
    per_bucket: dict[int, list[int]] = {}
    for r in rows:
        per_bucket.setdefault(r["bucket"], []).append(r["offset"])
    assert len(per_bucket) > 1
    for offs in per_bucket.values():
        assert sorted(offs) == list(range(len(offs)))

    # and the plan has no exchange: payloads are never shuffled
    plan = log.spark.range(1)._jdf  # noqa: F841 - keep py4j warm
    keyless_plan = (
        src.coalesce(log.buckets)
        .withColumn("_pid", F.spark_partition_id())
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in keyless_plan


def test_keyless_salt_rotates_single_messages(spark, tmp_path):
    """Successive single-message keyless produces walk the ring via the
    least-filled-bucket salt instead of piling into bucket 0."""
    from barco_spark.sources.eventlog import EventLog

    log = EventLog(spark, str(tmp_path / "log"))
    for i in range(6):
        log.produce("t", [f"solo{i}"])
    buckets = {r["bucket"] for r in log.read("t").select("bucket").collect()}
    assert len(buckets) == 6  # each landed on a different bucket


def test_recover_offsets_merges_late_commits_from_trash(spark, tmp_path):
    """Crash window between compact's swap and its late-commit rescue:
    offsets dir AND trash dir both exist, with a commit file in trash
    that the compaction snapshot never saw. Recovery must merge it
    back instead of deleting it with the trash."""
    import os
    import shutil

    from barco_spark.sources.eventlog import EventLog

    root = str(tmp_path / "log")
    log = EventLog(spark, root)
    log.produce("t", [(f"k{i}", f"m{i}") for i in range(20)])
    log.register("g", ["t"], reset="earliest")
    log.commit("g", "t", {0: 1})
    # move the store aside (compactor's first rename)...
    trash = f"{root}/_offsets_trash"
    os.rename(log._offsets_path, trash)
    # ...a peer facade's commit lands in what is now the trash dir
    late = EventLog(spark, root)
    late._offsets_path = trash  # write directly into the moved-aside dir
    late._commit_arrow("g", "t", {3: 7})
    # ...compactor writes its compacted store into place, then crashes
    # before the rescue step
    os.makedirs(log._offsets_path)
    log_fresh = EventLog(spark, root)
    log_fresh._commit_arrow("g", "t", {0: 1})  # the compacted row
    # any offsets read triggers recovery; the late {3: 7} must survive
    committed = log_fresh.committed("g", "t")
    assert committed.get(3) == 7, committed
    assert not os.path.isdir(trash)
    shutil.rmtree(root)


def test_commit_is_monotonic_by_default(spark, tmp_path):
    """A stale facade's lower auto-commit must not rewind a durably
    advanced position; explicit rewind still works via
    monotonic=False (the reference's offset-set semantics)."""
    from barco_spark.sources.eventlog import EventLog

    root = str(tmp_path / "log")
    log = EventLog(spark, root)
    log.produce("t", [(f"k{i}", f"m{i}") for i in range(10)])
    log.commit("g", "t", {0: 50})
    log.commit("g", "t", {0: 10})  # stale writer: dropped
    assert log.committed("g", "t")[0] == 50
    log.commit("g", "t", {0: 5}, monotonic=False)  # explicit rewind
    assert log.committed("g", "t")[0] == 5


def test_consumer_lag_report_query(spark, tmp_path):
    """The registry's lag-report op: committed reflects the acked slice
    and lag = high_watermark - committed on every bucket."""
    from barco_spark.registry import load_all

    rows = (
        load_all()["consumer_lag_report"]
        .build(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert rows
    for r in rows:
        assert r["lag"] == r["high_watermark"] - r["committed"]
        if r["high_watermark"] > 0:
            assert r["committed"] == min(10, r["high_watermark"])


def test_produce_arrow_interops_with_spark_produce(spark, tmp_path):
    """The Spark-free arrow produce (facade fast path) and the Spark
    writer are ONE log: same bucket routing per key (bit-exact hash),
    contiguous offsets across interleaved writers, and every reader
    (Spark poll, arrow poll_dicts) sees all records in order."""
    from datetime import datetime, timezone

    log = EventLog(spark, str(tmp_path / "log"))
    log.register("g", ["t"], reset="earliest")
    ts = datetime(2026, 1, 2, 3, 4, 5, 123456, tzinfo=timezone.utc)
    # arrow write first (keyed + keyless mixed)
    assert log.produce_arrow(
        "t", [("ka", "a0", ts), ("kb", "b0", None), (None, "x0", None)]
    ) == 3
    # then the Spark writer appends with the SAME keys
    log.produce("t", [("ka", "a1"), ("kb", "b1")])
    # then arrow again
    assert log.produce_arrow("t", [("ka", "a2", None)]) == 1

    rows = log.poll("g", "t").collect()
    assert sorted(r["payload"] for r in rows) == ["a0", "a1", "a2", "b0", "b1", "x0"]
    by_key = {}
    for r in rows:
        by_key.setdefault(r["partition_key"], []).append((r["offset"], r["payload"], r["bucket"]))
    # per-key: one bucket across both writers, offsets strictly increasing
    for key in ("ka", "kb"):
        got = sorted(by_key[key])
        assert len({b for _o, _p, b in got}) == 1, f"{key} split across buckets"
        offs = [o for o, _p, _b in got]
        assert offs == sorted(offs) and len(set(offs)) == len(offs)
    assert [p for _o, p, _b in sorted(by_key["ka"])] == ["a0", "a1", "a2"]
    # exact producer timestamp survives the arrow write to the microsecond
    (a0,) = [r for r in rows if r["payload"] == "a0"]
    assert a0["timestamp"].microsecond == 123456
    # per-bucket offsets are gapless from 0 (contiguity invariant)
    per_bucket = {}
    for r in rows:
        per_bucket.setdefault(r["bucket"], []).append(r["offset"])
    for b, offs in per_bucket.items():
        assert sorted(offs) == list(range(len(offs))), f"bucket {b} gapped"
    # the arrow reader agrees with the Spark reader
    log2 = EventLog(spark, str(tmp_path / "log"))
    log2.register("g2", ["t"], reset="earliest")
    served = log2.poll_dicts("g2", "t")
    assert sorted(v for it in served for v in it["values"]) == [
        "a0", "a1", "a2", "b0", "b1", "x0"
    ]


def test_produce_arrow_declines_unsupported(spark, tmp_path):
    """Object-store roots and topics needing partition escaping fall
    back to the Spark writer (produce_arrow returns None)."""
    log = EventLog(spark, str(tmp_path / "log"))
    assert log.produce_arrow("weird topic!", [(None, "p", None)]) is None


def test_replay_preserves_keys_order_and_offsets(spark, tmp_path):
    """Replay re-produces a topic's records into a new topic with keys,
    per-key order, and timestamps preserved; from_offsets resumes from
    a committed map (the consumer-reset semantics, materialized)."""
    from barco_spark.sources.eventlog import EventLog

    log = EventLog(spark, str(tmp_path / "log"))
    msgs = [("ka", f"a{i}") for i in range(5)] + [("kb", f"b{i}") for i in range(5)]
    log.produce("src", msgs)

    n = log.replay("src", "dst")
    assert n == 10
    dst = log.read("dst").orderBy("bucket", "offset").collect()
    by_key: dict = {}
    for r in dst:
        by_key.setdefault(r["partition_key"], []).append(r["payload"])
    assert by_key["ka"] == [f"a{i}" for i in range(5)]
    assert by_key["kb"] == [f"b{i}" for i in range(5)]

    # timestamps preserved bit-for-bit
    src_ts = {r["payload"]: r["timestamp"] for r in log.read("src").collect()}
    assert all(r["timestamp"] == src_ts[r["payload"]] for r in dst)

    # partial replay from a committed map: skip everything (replay none)
    hi = log.high_watermarks("src")
    assert log.replay("src", "dst2", from_offsets=hi) == 0


def test_produce_arrow_back_to_back_assigns_contiguous_offsets(spark, tmp_path):
    """Tight-loop arrow produces (coalescer at linger_ms=0) land within
    one kernel coarse-clock tick; the watermark read between them must
    still see the just-written file (listing-memo racy-stamp guard +
    in-process invalidation) or offsets would silently collide."""
    log = EventLog(spark, str(tmp_path / "log"))
    for i in range(6):  # sub-millisecond apart: same mtime tick
        assert log.produce_arrow("t", [("k", f"m{i}", None)]) == 1
    log.register("g", ["t"], reset="earliest")
    rows = sorted(
        (r["offset"], r["payload"]) for r in log.poll("g", "t").collect()
    )
    assert [o for o, _ in rows] == list(range(6)), "offset collision"
    assert [p for _, p in rows] == [f"m{i}" for i in range(6)]
