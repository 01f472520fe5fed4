"""Custom stateful streaming operators via applyInPandasWithState.

The reference's only state is offsets; these are the engine-level
stateful operators a Spark-native build adds (SURVEY.md §2.7 last
rows): arbitrary per-key state machines with timeout-based eviction.

`running_totals` keeps (count, sum, max_seen) per key and emits an
update row per key per micro-batch — the applyInPandasWithState shape
for per-key aggregations that built-in windows can't express (e.g.
emit-on-every-batch, custom eviction, model state).

Scale notes: state lives in the state store (RocksDB provider in
deploy/), partitioned by key; timeouts bound state growth.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("mx", DoubleType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        v = pdf["value"].astype(float)
        n += len(v)
        total += float(v.sum())
        if len(v):
            mx = max(mx, float(v.max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "max_value": [mx],
        }
    )


def running_totals(events: DataFrame, key_col: str = "partition_key") -> DataFrame:
    """Per-key running (count, sum, max) emitted every micro-batch."""
    return (
        events.selectExpr(f"{key_col} as key", "value")
        .groupBy("key")
        .applyInPandasWithState(
            _update,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --------------------------------------------------------------------------
# Streaming exact dedup with TTL-bounded state
# --------------------------------------------------------------------------
DEDUP_OUT_SCHEMA = StructType(
    [
        StructField("dedup_key", StringType()),
        StructField("payload", StringType()),
    ]
)

_DEDUP_STATE_SCHEMA = StructType([StructField("seen", LongType())])


def streaming_dedup_ttl(
    events: DataFrame, key_col: str = "partition_key", ttl_ms: int | None = 3_600_000
) -> DataFrame:
    """First occurrence per key across micro-batches; state expires after TTL.

    Spark's built-in `dropDuplicates` on a stream needs a watermark to
    bound state by EVENT time; this bounds it by STATE age instead (the
    natural policy for exact dedup of an unordered corpus: "forget a key
    T after it was first seen"). `ttl_ms=None` keeps state forever
    (exact global dedup).

    Implementation note: Spark 4's transformWithStateInPandas offers
    TTL ValueState natively, but its python driver worker needs the
    `protobuf` package (absent in this environment), so this uses the
    equivalent applyInPandasWithState + ProcessingTimeTimeout: the
    timeout callback drops the key's state, re-admitting it afterwards.

    At 100 TB the state store (RocksDB provider, see deploy/) holds one
    small record per distinct key, hash-partitioned across executors;
    the timeout keeps it from growing without bound on infinite streams.
    """
    use_ttl = ttl_ms is not None

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        fresh = not state.exists
        if fresh:
            first = None
            for pdf in pdfs:
                if len(pdf):
                    first = str(pdf["payload"].iloc[0])
                    break
            if first is None:
                return
            state.update((1,))
            if use_ttl:
                state.setTimeoutDuration(ttl_ms)
            yield pd.DataFrame({"dedup_key": [key[0]], "payload": [first]})

    return (
        events.selectExpr(f"{key_col} as dedup_key", "payload")
        .groupBy("dedup_key")
        .applyInPandasWithState(
            update,
            outputStructType=DEDUP_OUT_SCHEMA,
            stateStructType=_DEDUP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if use_ttl
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


FUNNEL_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("stage", StringType()),
        StructField("ts_us", LongType()),
    ]
)

_FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("v", LongType()),
        StructField("c", LongType()),
        StructField("p", LongType()),
    ]
)


def streaming_funnel(events: DataFrame) -> DataFrame:
    """Incremental twin of the batch `events_funnel` query: per-user
    view -> click -> purchase progression tracked across micro-batches.

    State per user is three int64 micros (first view, first click after
    it, first purchase after that; -1 = not reached, so an event at
    exactly epoch 0 is handled correctly). State format note: the
    sentinel changed from 0 to -1; checkpoints written by the
    0-sentinel version are incompatible — start a fresh checkpoint. A row
    (user_id, stage, ts_us) is emitted the moment a user advances a
    stage. Progression is monotone: events arriving late that would
    revise an already-passed stage are ignored — the streaming
    trade-off vs the batch query, which sees the full history (the
    reference's at-least-once posture makes consumers tolerate this
    class of approximation anyway, docs/faq/README.md:14).

    Scale: one 24-byte state record per user in the state store,
    hash-partitioned on user_id; per batch each user's rows are sorted
    locally (bounded by batch size), no shuffles beyond the state-store
    partitioning.
    """

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        v, c, p = state.get if state.exists else (-1, -1, -1)
        rows = []
        for pdf in pdfs:
            for ts, et in zip(pdf["ts_us"], pdf["event_type"]):
                rows.append((int(ts), str(et)))
        rows.sort()
        out = []
        for ts, et in rows:
            if et == "view" and v == -1:
                v = ts
                out.append((key[0], "view", ts))
            elif et == "click" and v != -1 and c == -1 and ts > v:
                c = ts
                out.append((key[0], "click", ts))
            elif et == "purchase" and c != -1 and p == -1 and ts > c:
                p = ts
                out.append((key[0], "purchase", ts))
        state.update((v, c, p))
        if out:
            yield pd.DataFrame(out, columns=["user_id", "stage", "ts_us"])

    return (
        events.selectExpr(
            "user_id", "event_type", "unix_micros(ts) AS ts_us"
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=FUNNEL_OUT_SCHEMA,
            stateStructType=_FUNNEL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


DEBOUNCE_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("gap_us", LongType()),
        StructField("drop_flag", LongType()),
    ]
)

_DEBOUNCE_STATE_SCHEMA = StructType([StructField("last_us", LongType())])

DEBOUNCE_THRESHOLD_US = 300_000_000  # 5 minutes, = operators.windows


def streaming_debounce(
    events: DataFrame, threshold_us: int = DEBOUNCE_THRESHOLD_US
) -> DataFrame:
    """Streaming twin of `events_debounce`: flag events arriving less
    than `threshold_us` after the previous RAW event of the same
    (user, type) key, with the last-seen timestamp carried across
    micro-batches in group state.

    Emits EVERY event with its gap and drop flag (append mode) so the
    caller can both filter the kept stream and audit suppression rates
    — the same per-event columns the batch LAG produces, which is what
    lets the snapshot query hash-match the batch oracle. Per key the
    state is ONE long (the last raw timestamp); because the rule
    debounces against the previous raw event (not the previous kept
    one) the per-batch computation is a vectorized shift, never a
    Python row loop.

    Within a micro-batch rows are sorted by (ts_us, event_id); across
    batches correctness requires the source to deliver a key's events
    in non-decreasing event-time order (file/offset order in the barco
    log), the standard contract for LAG-style streaming state.
    """

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            return
        pdf = pd.concat(frames).sort_values(["ts_us", "event_id"])
        ts = pdf["ts_us"].to_numpy()
        prev = pd.array(
            [state.get[0] if state.exists else None] + list(ts[:-1]),
            dtype="Int64",
        )
        gap = pd.array(ts, dtype="Int64") - prev
        drop = (gap.fillna(threshold_us) < threshold_us).astype("int64")
        state.update((int(ts[-1]),))
        yield pd.DataFrame(
            {
                "user_id": pdf["user_id"].to_numpy(),
                "event_type": pdf["event_type"].to_numpy(),
                "event_id": pdf["event_id"].to_numpy(),
                "ts_us": ts,
                "gap_us": gap,
                "drop_flag": drop,
            }
        )

    return (
        events.select("user_id", "event_type", "event_id", "ts_us")
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            update,
            outputStructType=DEBOUNCE_OUT_SCHEMA,
            stateStructType=_DEBOUNCE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
