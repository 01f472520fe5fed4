"""Engine metrics (reference C9: Prometheus counters on port 9253).

Spark already exports executor/task metrics through its metrics system
(configure a PrometheusServlet sink in metrics.properties on a real
cluster — see deploy/). This module adds the broker-shaped metrics the
reference exposes, two ways:

1. ``PromRegistry`` — a dependency-free Prometheus text-exposition
   registry (format 0.0.4) with the reference's metric names and
   bucket layouts (internal/metrics/metrics.go:13-87). The HTTP facade
   instruments its produce/poll/consumer paths against one and serves
   ``GET /metrics`` (the reference's promhttp handler, metrics.go:77-87
   + main.go), so the deploy/ scrape annotations have a live target.
2. ``produce_metrics`` — broker-style counters derived from Structured
   Streaming query progress (numInputRows per batch, batchDuration),
   for the bulk-ingest path where Spark owns the write loop.
"""

from __future__ import annotations

import threading
from bisect import bisect_left
from dataclasses import dataclass
from typing import Callable, Sequence

from pyspark.sql.streaming import StreamingQuery


def exponential_buckets(start: float, factor: float, count: int) -> list[float]:
    """prometheus.ExponentialBuckets twin (upper bounds, +Inf implied)."""
    out, v = [], float(start)
    for _ in range(count):
        out.append(v)
        v *= factor
    return out


class Counter:
    def __init__(self) -> None:
        self._v = 0.0
        self._lock = threading.Lock()

    def inc(self, v: float = 1.0) -> None:
        with self._lock:
            self._v += v

    @property
    def value(self) -> float:
        return self._v


class Gauge:
    def __init__(self) -> None:
        self._v = 0.0
        self._lock = threading.Lock()

    def set(self, v: float) -> None:
        with self._lock:
            self._v = float(v)

    def inc(self, v: float = 1.0) -> None:
        with self._lock:
            self._v += v

    @property
    def value(self) -> float:
        return self._v


class Histogram:
    """Cumulative-bucket histogram, rendered as Prometheus expects
    (le-labelled cumulative counts + _sum + _count)."""

    def __init__(self, buckets: Sequence[float]) -> None:
        self.uppers = sorted(float(b) for b in buckets)
        self.counts = [0] * len(self.uppers)  # per-bucket (non-cumulative)
        self.inf = 0
        self.sum = 0.0
        self._lock = threading.Lock()

    def observe(self, v: float) -> None:
        with self._lock:
            i = bisect_left(self.uppers, v)
            if i < len(self.uppers):
                self.counts[i] += 1
            else:
                self.inf += 1
            self.sum += v


class PromRegistry:
    """Minimal named-metric registry -> Prometheus text format 0.0.4.

    Supports plain counters/gauges/histograms plus gauge CALLBACKS:
    a callback returns (labels_dict, value) samples computed at scrape
    time — how the facade exposes active-consumer counts and per-bucket
    consumer lag without bookkeeping on every request.
    """

    def __init__(self) -> None:
        self._metrics: dict[str, tuple[str, str, object]] = {}  # name -> (type, help, obj)
        self._callbacks: dict[
            str, tuple[str, Callable[[], list[tuple[dict, float]]]]
        ] = {}

    def counter(self, name: str, help_: str) -> Counter:
        c = Counter()
        self._metrics[name] = ("counter", help_, c)
        return c

    def gauge(self, name: str, help_: str) -> Gauge:
        g = Gauge()
        self._metrics[name] = ("gauge", help_, g)
        return g

    def histogram(
        self, name: str, help_: str, buckets: Sequence[float]
    ) -> Histogram:
        h = Histogram(buckets)
        self._metrics[name] = ("histogram", help_, h)
        return h

    def gauge_callback(
        self,
        name: str,
        help_: str,
        fn: Callable[[], list[tuple[dict, float]]],
    ) -> None:
        self._callbacks[name] = (help_, fn)

    @staticmethod
    def _fmt(v: float) -> str:
        return str(int(v)) if float(v).is_integer() else repr(float(v))

    @staticmethod
    def _labels(labels: dict) -> str:
        if not labels:
            return ""
        inner = ",".join(
            f'{k}="{str(v)}"' for k, v in sorted(labels.items())
        )
        return "{" + inner + "}"

    def render(self) -> str:
        lines: list[str] = []
        for name, (typ, help_, obj) in sorted(self._metrics.items()):
            lines.append(f"# HELP {name} {help_}")
            lines.append(f"# TYPE {name} {typ}")
            if typ in ("counter", "gauge"):
                lines.append(f"{name} {self._fmt(obj.value)}")
            else:  # histogram
                cum = 0
                for upper, c in zip(obj.uppers, obj.counts):
                    cum += c
                    lines.append(f'{name}_bucket{{le="{self._fmt(upper)}"}} {cum}')
                cum += obj.inf
                lines.append(f'{name}_bucket{{le="+Inf"}} {cum}')
                lines.append(f"{name}_sum {self._fmt(obj.sum)}")
                lines.append(f"{name}_count {cum}")
        for name, (help_, fn) in sorted(self._callbacks.items()):
            lines.append(f"# HELP {name} {help_}")
            lines.append(f"# TYPE {name} gauge")
            try:
                samples = fn()
            except Exception:  # scrape must never 500 on a flaky callback
                samples = []
            for labels, v in samples:
                lines.append(f"{name}{self._labels(labels)} {self._fmt(v)}")
        return "\n".join(lines) + "\n"


def broker_metrics(registry: PromRegistry) -> dict:
    """Create the reference's broker metric set on ``registry`` with
    its exact names and bucket layouts (internal/metrics/metrics.go:
    13-87) and return them by short key."""
    return {
        "producer_requests": registry.counter(
            "polar_producer_requests_total",
            "The total number of requests received by the producer server",
        ),
        "producer_body_bytes": registry.counter(
            "polar_producer_requests_body_bytes_total",
            "The total number of bytes for all the request bodies "
            "received by the producer server",
        ),
        "coalescer_messages": registry.counter(
            "polar_coalescer_messages_total",
            "The total number of processed messages by the coalescer (producer)",
        ),
        "coalescer_coalesced": registry.histogram(
            "polar_coalescer_messages_coalesced",
            "Number of messages coalesced into compressed buffers",
            exponential_buckets(2, 2, 9),  # 2..512 like the reference
        ),
        "segment_flush_bytes": registry.histogram(
            "polar_segment_flushed_bytes",
            "The amount of bytes flushed to disk",
            exponential_buckets(2, 7, 10),  # 2..~80MiB like the reference
        ),
        "rerouted_sent": registry.counter(
            "polar_producer_rerouting_sent_total",
            "The total number of re-routed messages sent by this broker",
        ),
        "rerouted_received": registry.counter(
            "polar_producer_rerouting_received_total",
            "The total number of re-routed messages received by the broker",
        ),
    }


@dataclass
class ProduceMetrics:
    batches: int
    total_rows: int
    rows_per_sec_avg: float
    batch_ms_avg: float


def produce_metrics(query: StreamingQuery, last_n: int = 100) -> ProduceMetrics:
    """Aggregate recent micro-batch progress into broker-style counters."""
    progress = [p for p in (query.recentProgress or [])][-last_n:]
    if not progress:
        return ProduceMetrics(0, 0, 0.0, 0.0)
    rows = [int(p.get("numInputRows", 0)) for p in progress]
    rates = [float(p.get("processedRowsPerSecond", 0.0)) for p in progress]
    durs = [
        int(p.get("batchDuration", p.get("durationMs", {}).get("triggerExecution", 0)))
        for p in progress
    ]
    n = len(progress)
    return ProduceMetrics(
        batches=n,
        total_rows=sum(rows),
        rows_per_sec_avg=sum(rates) / n,
        batch_ms_avg=sum(durs) / n,
    )
