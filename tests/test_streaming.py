"""Structured Streaming produce/consume + windowed analytics tests.

Mirrors the reference's streaming behaviors: micro-batch produce (W1),
checkpointed consumer groups (R8), end-of-stream (R11), plus the
event-time operators the reference lacks.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from barco_spark.sources.eventlog import EventLog
from barco_spark.streaming.ingest import (
    consumer_group_query,
    stream_consume,
    stream_produce,
)
from barco_spark.streaming.windows import (
    session_counts,
    stream_dedup,
    tumbling_counts,
)


@pytest.fixture()
def log(spark, tmp_path):
    return EventLog(spark, str(tmp_path / "log"))


def _write_source_files(spark, path: str, rows: list[tuple[str, str]]) -> None:
    # one file per call so arrival order (and thus offset order) is
    # deterministic for the assertions below
    spark.createDataFrame(rows, ["partition_key", "payload"]).coalesce(1).write.mode(
        "append"
    ).json(path)


def test_stream_produce_assigns_offsets(spark, tmp_path, log):
    src_dir = str(tmp_path / "src")
    _write_source_files(spark, src_dir, [("k1", f"m{i}") for i in range(10)])
    source = (
        spark.readStream.schema("partition_key string, payload string")
        .json(src_dir)
    )
    q = stream_produce(log, source, "t", str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    rows = log.read("t").orderBy("offset").collect()
    assert len(rows) == 10
    assert len({r["bucket"] for r in rows}) == 1  # one key -> one bucket
    assert [r["offset"] for r in rows] == list(range(10))


def test_stream_produce_exactly_once_on_restart(spark, tmp_path, log):
    src_dir = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _write_source_files(spark, src_dir, [("k", "a"), ("k", "b")])
    source = (
        spark.readStream.schema("partition_key string, payload string").json(src_dir)
    )
    stream_produce(log, source, "t", ckpt).awaitTermination(120)
    assert log.read("t").count() == 2
    # restart with same checkpoint and no new data: nothing re-produced
    stream_produce(log, source, "t", ckpt).awaitTermination(120)
    assert log.read("t").count() == 2
    # new data arrives; only it is produced, offsets continue
    _write_source_files(spark, src_dir, [("k", "c")])
    stream_produce(log, source, "t", ckpt).awaitTermination(120)
    rows = log.read("t").orderBy("offset").collect()
    assert [r["payload"] for r in rows] == ["a", "b", "c"]
    assert [r["offset"] for r in rows] == [0, 1, 2]


def test_consumer_group_checkpoint_resume(spark, tmp_path, log):
    log.produce("t", ["m1", "m2"], partition_key="k")
    seen: list[str] = []

    def sink(df, _bid):
        seen.extend(r["payload"] for r in df.collect())

    consumer_group_query(
        log, "t", "g1", str(tmp_path / "groups"), sink
    ).awaitTermination(120)
    assert sorted(seen) == ["m1", "m2"]

    # same group restarts: checkpoint == committed offset, no redelivery
    seen.clear()
    log.produce("t", ["m3"], partition_key="k")
    consumer_group_query(
        log, "t", "g1", str(tmp_path / "groups"), sink
    ).awaitTermination(120)
    assert seen == ["m3"]

    # a different group reads from the beginning (fresh checkpoint)
    seen.clear()
    consumer_group_query(
        log, "t", "g2", str(tmp_path / "groups"), sink
    ).awaitTermination(120)
    assert sorted(seen) == ["m1", "m2", "m3"]


def test_stream_consume_prunes_topic(spark, tmp_path, log):
    log.produce("t1", ["a"], partition_key="k")
    log.produce("t2", ["b", "c"], partition_key="k")
    out: list[str] = []

    def sink(df, _bid):
        out.extend(r["payload"] for r in df.collect())

    q = (
        stream_consume(log, "t2")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "c"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(out) == ["b", "c"]


def test_tumbling_window_stream(spark, tmp_path, log):
    rows = [
        ("k", "e1", "2024-01-01 00:05:00"),
        ("k", "e2", "2024-01-01 00:55:00"),
        ("k", "e3", "2024-01-01 01:05:00"),
    ]
    df = spark.createDataFrame(rows, ["partition_key", "payload", "ts"]).withColumn(
        "timestamp", F.col("ts").cast("timestamp")
    )
    log.produce("t", df.select("partition_key", "payload", "timestamp"))
    results: list = []

    def sink(df, _bid):
        # complete mode: each batch carries the full window state;
        # keep only the latest (append mode would hold back windows the
        # watermark hasn't closed at end-of-stream)
        results.clear()
        results.extend(df.collect())

    q = (
        tumbling_counts(stream_consume(log, "t"), "1 hour", "1 hour")
        .writeStream.outputMode("complete")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "c"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    counts = {str(r["window_start"]): r["n"] for r in results}
    assert counts.get("2024-01-01 00:00:00") == 2
    assert counts.get("2024-01-01 01:00:00") == 1


def test_session_window_stream(spark, tmp_path, log):
    rows = [
        ("u1", "a", "2024-01-01 00:00:00"),
        ("u1", "b", "2024-01-01 00:10:00"),  # same session (gap 30m)
        ("u1", "c", "2024-01-01 02:00:00"),  # new session
    ]
    df = spark.createDataFrame(rows, ["partition_key", "payload", "ts"]).withColumn(
        "timestamp", F.col("ts").cast("timestamp")
    )
    log.produce("t", df.select("partition_key", "payload", "timestamp"))
    results: list = []

    def sink(d, _b):
        results.clear()
        results.extend(d.collect())

    q = (
        session_counts(stream_consume(log, "t"), gap="30 minutes")
        .writeStream.outputMode("complete")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "c"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(r["n_events"] for r in results) == [1, 2]


def test_stream_dedup(spark, tmp_path, log):
    rows = [
        ("k", "dup", "2024-01-01 00:00:00"),
        ("k", "dup", "2024-01-01 00:05:00"),
        ("k", "uniq", "2024-01-01 00:06:00"),
    ]
    df = spark.createDataFrame(rows, ["partition_key", "payload", "ts"]).withColumn(
        "timestamp", F.col("ts").cast("timestamp")
    )
    log.produce("t", df.select("partition_key", "payload", "timestamp"))
    results: list = []

    q = (
        stream_dedup(stream_consume(log, "t"), ["partition_key", "payload"])
        .writeStream.outputMode("append")
        .foreachBatch(lambda d, _b: results.extend(d.collect()))
        .option("checkpointLocation", str(tmp_path / "c"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(r["payload"] for r in results) == ["dup", "uniq"]


def test_sliding_window_stream(spark, tmp_path, log):
    from barco_spark.streaming.windows import sliding_counts

    rows = [
        ("k", "a", "2024-01-01 00:02:00"),
        ("k", "b", "2024-01-01 00:07:00"),
        ("k", "c", "2024-01-01 00:12:00"),
    ]
    df = spark.createDataFrame(rows, ["partition_key", "payload", "ts"]).withColumn(
        "timestamp", F.col("ts").cast("timestamp")
    )
    log.produce("t", df.select("partition_key", "payload", "timestamp"))
    results: list = []

    def sink(d, _b):
        results.clear()
        results.extend(d.collect())

    q = (
        sliding_counts(stream_consume(log, "t"), "10 minutes", "5 minutes")
        .writeStream.outputMode("complete")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "c"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    counts = {str(r["window_start"]): r["n"] for r in results}
    # event at 00:02 belongs to [23:55,00:05) and [00:00,00:10); etc.
    assert counts["2024-01-01 00:00:00"] == 2  # a, b
    assert counts["2024-01-01 00:05:00"] == 2  # b, c
    assert counts["2024-01-01 00:10:00"] == 1  # c


def test_produce_metrics(spark, tmp_path, log):
    from barco_spark.metrics import produce_metrics

    src_dir = str(tmp_path / "src")
    _write_source_files(spark, src_dir, [("k", f"m{i}") for i in range(25)])
    source = (
        spark.readStream.schema("partition_key string, payload string").json(src_dir)
    )
    q = stream_produce(log, source, "t", str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    m = produce_metrics(q)
    assert m.batches >= 1
    # numInputRows counts source-row reads: the two-phase offset
    # assignment legitimately reads the batch twice (column-pruned
    # count-matrix pass + the write pass) plus the isEmpty probe
    assert 25 <= m.total_rows <= 2 * 25 + 2
    assert log.read("t").count() == 25  # what actually landed, once


def test_stateful_running_totals(spark, tmp_path):
    from barco_spark.streaming.stateful import running_totals

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0)], ["partition_key", "value"]
    ).coalesce(1).write.mode("append").json(src)
    stream = spark.readStream.schema("partition_key string, value double").json(src)
    results: list = []

    q = (
        running_totals(stream)
        .writeStream.outputMode("update")
        .foreachBatch(lambda d, _b: results.extend(d.collect()))
        .option("checkpointLocation", str(tmp_path / "c"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    state = {r["key"]: (r["n_events"], r["total_value"], r["max_value"]) for r in results}
    assert state["a"] == (2, 3.0, 2.0)
    assert state["b"] == (1, 5.0, 5.0)

    # second run with more data: state resumes from checkpoint
    spark.createDataFrame([("a", 10.0)], ["partition_key", "value"]).coalesce(
        1
    ).write.mode("append").json(src)
    results.clear()
    q = (
        running_totals(stream)
        .writeStream.outputMode("update")
        .foreachBatch(lambda d, _b: results.extend(d.collect()))
        .option("checkpointLocation", str(tmp_path / "c"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    state = {r["key"]: (r["n_events"], r["total_value"], r["max_value"]) for r in results}
    assert state["a"] == (3, 13.0, 10.0)


def test_stream_stream_join(spark, tmp_path, log):
    from barco_spark.streaming.windows import stream_stream_join

    clicks = [
        ("u1", "c1", "2024-01-01 00:00:00"),
        ("u1", "c2", "2024-01-01 03:00:00"),
    ]
    purchases = [
        ("u1", "p1", "2024-01-01 00:30:00"),  # within 1h of c1
        ("u1", "p2", "2024-01-01 05:00:00"),  # within 1h of nothing
    ]
    for topic, rows in [("clicks", clicks), ("purchases", purchases)]:
        df = spark.createDataFrame(
            rows, ["partition_key", "payload", "ts"]
        ).withColumn("timestamp", F.col("ts").cast("timestamp"))
        log.produce(topic, df.select("partition_key", "payload", "timestamp"))

    lhs = stream_consume(log, "purchases").select(
        "partition_key", F.col("payload").alias("purchase"), "timestamp"
    )
    rhs = stream_consume(log, "clicks").select(
        "partition_key", F.col("payload").alias("click"), "timestamp"
    )
    joined = stream_stream_join(
        lhs, rhs, "partition_key", within="1 hour"
    ).select(F.col("l.purchase"), F.col("r.click"))
    results: list = []
    q = (
        joined.writeStream.outputMode("append")
        .foreachBatch(lambda d, _b: results.extend(d.collect()))
        .option("checkpointLocation", str(tmp_path / "c"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    pairs = sorted((r["purchase"], r["click"]) for r in results)
    assert pairs == [("p1", "c1")]


def test_stream_static_enrichment_join(spark, tmp_path, log):
    """Stream-static join: streaming consume enriched with a broadcast
    dimension table (the standard fact-stream x dim pattern; the static
    side is re-resolved per micro-batch, no watermark needed)."""
    from pyspark.sql import functions as F

    from barco_spark.streaming.ingest import consumer_group_query

    dim = spark.createDataFrame(
        [("k0", "gold"), ("k1", "silver")], "partition_key string, tier string"
    )
    log.produce("enrich", [(f"k{i % 2}", f"m{i}") for i in range(10)])

    got = []

    def sink(batch_df, batch_id):
        rows = (
            batch_df.join(F.broadcast(dim), "partition_key")
            .select("payload", "tier")
            .collect()
        )
        got.extend((r.payload, r.tier) for r in rows)

    q = consumer_group_query(
        log, "enrich", "g-enrich", str(tmp_path / "ckpt"), sink
    )
    q.awaitTermination(120)
    assert len(got) == 10
    assert all((int(p[1:]) % 2 == 0) == (t == "gold") for p, t in got)


def test_streaming_dedup_ttl(spark, tmp_path):
    """transformWithStateInPandas dedup: first occurrence only, state
    resumes across runs (duplicates in later batches stay suppressed)."""
    from barco_spark.streaming.stateful import streaming_dedup_ttl

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("k1", "v1"), ("k1", "v1-dup"), ("k2", "v2")],
        ["partition_key", "payload"],
    ).coalesce(1).write.mode("append").json(src)
    stream = spark.readStream.schema("partition_key string, payload string").json(src)
    results: list = []

    def run():
        q = (
            streaming_dedup_ttl(stream, ttl_ms=None)
            .writeStream.outputMode("append")
            .foreachBatch(lambda d, _b: results.extend(d.collect()))
            .option("checkpointLocation", str(tmp_path / "c"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    got = {r["dedup_key"]: r["payload"] for r in results}
    assert got == {"k1": "v1", "k2": "v2"}

    # second run: k1/k2 remain suppressed by checkpointed state, k3 is new
    spark.createDataFrame(
        [("k1", "v1-late"), ("k3", "v3")], ["partition_key", "payload"]
    ).coalesce(1).write.mode("append").json(src)
    results.clear()
    run()
    got = {r["dedup_key"]: r["payload"] for r in results}
    assert got == {"k3": "v3"}


def test_streaming_dedup_ttl_expiry_readmits(spark, tmp_path):
    """After the TTL passes, the key's state is evicted (timeout fires on
    a later batch) and the key is admitted again."""
    import time as _time

    from barco_spark.streaming.stateful import streaming_dedup_ttl

    src = str(tmp_path / "src")
    results: list = []

    def run():
        stream = spark.readStream.schema(
            "partition_key string, payload string"
        ).json(src)
        results.clear()
        q = (
            streaming_dedup_ttl(stream, ttl_ms=100)
            .writeStream.outputMode("append")
            .foreachBatch(lambda d, _b: results.extend(d.collect()))
            .option("checkpointLocation", str(tmp_path / "c"))
            .trigger(availableNow=True)
            .start()
        )
        # with pending processing-time timers the query stays active
        # after draining, so availableNow never self-terminates: wait
        # for the batch's foreachBatch output, then stop explicitly
        deadline = _time.time() + 60
        while not results and _time.time() < deadline:
            _time.sleep(0.2)
        _time.sleep(1.0)  # let trailing empty/timer batches commit
        q.stop()
        q.awaitTermination(120)

    def feed(rows):
        spark.createDataFrame(rows, ["partition_key", "payload"]).coalesce(
            1
        ).write.mode("append").json(src)

    feed([("k1", "v1")])
    run()
    assert {r["dedup_key"] for r in results} == {"k1"}
    _time.sleep(2)  # let the 100ms TTL lapse
    feed([("k9", "other")])  # this batch triggers k1's timeout eviction
    run()
    assert {r["dedup_key"] for r in results} == {"k9"}
    feed([("k1", "v1-again")])
    run()
    assert {r["dedup_key"] for r in results} == {"k1"}  # re-admitted


def test_streaming_curation_pipeline(spark, tmp_path):
    """Produce docs -> barco stream -> quality filter -> cross-batch
    exact dedup -> curated rows. The streaming twin of
    operators/pipeline.py, sharing its scoring expressions."""
    import tempfile

    from barco_spark.operators.text import STOPWORDS
    from barco_spark.sources import BarcoDataSource, EventLog
    from barco_spark.streaming.pipeline import curated_stream

    spark.dataSource.register(BarcoDataSource)
    log = EventLog(spark, tempfile.mkdtemp() + "/log")
    good_doc = "quick brown foxes jump over lazy dogs " * 8  # long, no stopwords
    junk_doc = " ".join(STOPWORDS * 10)  # all stopwords -> quality 0
    log.produce("docs", [good_doc, junk_doc])

    results: list = []

    def run():
        q = (
            curated_stream(spark, log.root, "docs")
            .writeStream.outputMode("append")
            .foreachBatch(lambda d, _b: results.extend(d.collect()))
            .option("checkpointLocation", str(tmp_path / "c"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert [r["text"] for r in results] == [good_doc]  # junk filtered
    assert results[0]["quality_score"] >= 0.6
    assert results[0]["n_tokens"] == len(good_doc.split(" "))

    # second batch: a duplicate of the good doc (suppressed by state)
    # and one new document
    other_doc = "completely different sentences about spark engines " * 8
    log.produce("docs", [good_doc, other_doc])
    results.clear()
    run()
    assert [r["text"] for r in results] == [other_doc]


def test_streaming_funnel_progresses_across_batches(spark, tmp_path):
    """Funnel state survives micro-batch boundaries: a click arriving in
    a later batch still matches the view from an earlier one; stage
    order is enforced (purchase before click is ignored)."""
    import datetime as _dt

    from barco_spark.streaming.stateful import streaming_funnel

    src = str(tmp_path / "src")

    def ts(s):
        return _dt.datetime(2024, 1, 1, 0, 0, s)

    def feed(rows):
        spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp"
        ).coalesce(1).write.mode("append").json(src)

    results: list = []

    def run():
        stream = spark.readStream.schema(
            "user_id long, event_type string, ts timestamp"
        ).json(src)
        results.clear()
        q = (
            streaming_funnel(stream)
            .writeStream.outputMode("append")
            .foreachBatch(lambda d, _b: results.extend(d.collect()))
            .option("checkpointLocation", str(tmp_path / "c"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: u1 views; u2 purchases with no prior funnel (ignored)
    feed([(1, "view", ts(1)), (2, "purchase", ts(1))])
    run()
    assert {(r.user_id, r.stage) for r in results} == {(1, "view")}

    # batch 2: u1 clicks (matches checkpointed view), then purchases;
    # u2 views (now starts its funnel); duplicate u1 view is ignored
    feed(
        [
            (1, "click", ts(5)),
            (1, "purchase", ts(9)),
            (1, "view", ts(2)),
            (2, "view", ts(6)),
        ]
    )
    run()
    got = {(r.user_id, r.stage): r.ts_us for r in results}
    assert set(got) == {(1, "click"), (1, "purchase"), (2, "view")}
    assert got[(1, "click")] < got[(1, "purchase")]


def test_streaming_funnel_over_barco_source(spark, tmp_path):
    """End-to-end: funnel events produced to a topic, consumed via
    format('barco'), parsed from JSON payloads, and tracked by the
    stateful funnel — stage state carries across separately-produced
    batches through the checkpoint."""
    import json
    import tempfile

    from pyspark.sql import functions as F

    from barco_spark.sources import BarcoDataSource, EventLog
    from barco_spark.streaming.stateful import streaming_funnel

    spark.dataSource.register(BarcoDataSource)
    log = EventLog(spark, tempfile.mkdtemp() + "/log")

    def produce(evts):
        log.produce(
            "funnel",
            [json.dumps(e) for e in evts],
        )

    results: list = []

    def run():
        stream = (
            spark.readStream.format("barco")
            .option("path", log.root)
            .option("topic", "funnel")
            .load()
        )
        parsed = stream.select(
            F.from_json(
                F.col("payload").cast("string"),
                "user_id long, event_type string, ts timestamp",
            ).alias("e")
        ).select("e.*")
        results.clear()
        q = (
            streaming_funnel(parsed)
            .writeStream.outputMode("append")
            .foreachBatch(lambda d, _b: results.extend(d.collect()))
            .option("checkpointLocation", str(tmp_path / "c"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    produce(
        [
            {"user_id": 7, "event_type": "view", "ts": "2024-01-01 00:00:01"},
            {"user_id": 7, "event_type": "purchase", "ts": "2024-01-01 00:00:02"},
        ]
    )
    run()
    assert {(r.user_id, r.stage) for r in results} == {(7, "view")}

    produce([{"user_id": 7, "event_type": "click", "ts": "2024-01-01 00:00:05"}])
    run()
    assert {(r.user_id, r.stage) for r in results} == {(7, "click")}


def test_streaming_funnel_agrees_with_batch_query(spark, sf_dir, tmp_path):
    """Replaying the whole events table through the stateful funnel in
    one batch must reach exactly the per-stage user counts the batch
    events_funnel query reports (same semantics when no data is late)."""
    from collections import Counter

    from barco_spark.operators.windows import events_funnel
    from barco_spark.streaming.stateful import streaming_funnel
    from barco_spark.tables import t

    src = str(tmp_path / "src")
    # integer micros through the JSON hop: Spark's JSON timestamp format
    # is millisecond-precision and would truncate event times, comparing
    # the two engines at mismatched precision
    t(spark, sf_dir, "events").selectExpr(
        "user_id", "event_type", "unix_micros(ts) AS ts_us"
    ).write.json(src)

    results: list = []
    q = (
        streaming_funnel(
            spark.readStream.schema("user_id long, event_type string, ts_us long")
            .json(src)
            .selectExpr("user_id", "event_type", "timestamp_micros(ts_us) AS ts")
        )
        .writeStream.outputMode("append")
        .foreachBatch(lambda d, _b: results.extend(d.collect()))
        .option("checkpointLocation", str(tmp_path / "c"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = Counter(r.stage for r in results)
    batch = {
        r.stage: r.n_users for r in events_funnel(spark, sf_dir).collect()
    }
    assert streamed == Counter(batch)


def test_streaming_debounce_state_spans_batches(spark, tmp_path):
    """An event in run 2 that lands < 5 min after the last RAW event of
    run 1 for the same (user, type) must be dropped — the state carries
    the last timestamp across checkpointed runs; an event past the
    threshold and an event for a fresh key must be kept."""
    from barco_spark.streaming.stateful import streaming_debounce

    src = str(tmp_path / "src")
    cols = ["user_id", "event_type", "event_id", "ts_us"]
    base = 1_700_000_000_000_000
    spark.createDataFrame(
        [(1, "click", 1, base), (1, "click", 2, base + 400_000_000)],
        cols,
    ).coalesce(1).write.mode("append").json(src)
    results: list = []

    def run():
        results.clear()
        stream = spark.readStream.schema(
            "user_id long, event_type string, event_id long, ts_us long"
        ).json(src)
        q = (
            streaming_debounce(stream)
            .writeStream.outputMode("append")
            .foreachBatch(lambda d, _b: results.extend(d.collect()))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    run()
    flags = {r["event_id"]: r["drop_flag"] for r in results}
    assert flags == {1: 0, 2: 0}  # 400s apart: both kept

    # run 2: event 3 is 100s after event 2 (drop), event 4 is a new
    # key (keep), event 5 is 400s after event 3 — kept, because the
    # rule debounces against the previous RAW event even if dropped
    spark.createDataFrame(
        [
            (1, "click", 3, base + 500_000_000),
            (2, "click", 4, base + 500_000_000),
            (1, "click", 5, base + 900_000_000),
        ],
        cols,
    ).coalesce(1).write.mode("append").json(src)
    run()
    flags = {r["event_id"]: (r["drop_flag"], r["gap_us"]) for r in results}
    assert flags[3] == (1, 100_000_000)
    assert flags[4] == (0, None)
    assert flags[5] == (0, 400_000_000)


def test_curated_stream_quarantine_side_output(spark, tmp_path):
    """Rejected documents must land in quarantine WITH a reason, not
    vanish; accepted ones in the curated table; a drained re-run with
    the same checkpoint writes nothing twice."""
    import tempfile

    from barco_spark.operators.text import STOPWORDS
    from barco_spark.sources import BarcoDataSource, EventLog
    from barco_spark.streaming.pipeline import curated_stream_with_quarantine

    spark.dataSource.register(BarcoDataSource)
    log = EventLog(spark, tempfile.mkdtemp() + "/log")
    good_doc = "the quick brown foxes and their friends jump over a few lazy dogs " * 6
    junk_doc = "x"  # one token -> too_short
    log.produce("docs", [good_doc, junk_doc])

    cur = str(tmp_path / "curated")
    quar = str(tmp_path / "quarantine")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = curated_stream_with_quarantine(
            spark, log.root, "docs", cur, quar, ckpt
        )
        assert q.awaitTermination(180)

    run()
    curated = spark.read.parquet(cur).collect()
    rejected = spark.read.parquet(quar).collect()
    assert [r["text"] for r in curated] == [good_doc]
    assert [r["text"] for r in rejected] == [junk_doc]
    assert rejected[0]["reject_reason"] == "too_short"

    # exactly-once: nothing new to read -> nothing appended
    run()
    assert spark.read.parquet(cur).count() == 1
    assert spark.read.parquet(quar).count() == 1
