"""Facade-path benchmark: request-per-event produce throughput and
poll latency over the live HTTP facade.

Produces the SCALING.md "Facade path" rows:

1. Produce: K concurrent request-per-event HTTP producers (the
   reference's roundtrip_test.go:68-119 client shape) against the
   coalescing facade — reports requests/s, Spark flushes, and the
   merge factor (requests per flush).
2. Poll: p50/p99 latency of 1k HTTP polls draining a 1M-row topic via
   the Spark-free pyarrow slice reader, vs the reference's ms-class
   in-process read queue (internal/consuming/server.go:389-419).

Usage: python scripts/facade_bench.py [--rows 1000000] [--polls 1000]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _req(port, method, path, body=None, ctype="text/plain", accept=None, raw=False,
         headers=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=body.encode() if body is not None else None,
        method=method,
    )
    if body is not None:
        req.add_header("Content-Type", ctype)
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    if accept is not None:
        # the facade's poll default is the reference's BINARY item
        # stream (round 6); the JSON path needs an explicit Accept
        req.add_header("Accept", accept)
    with urllib.request.urlopen(req) as resp:
        data = resp.read()
        return resp.status, (data if raw else data.decode())


def bench_produce(
    server,
    producers: int,
    per_producer: int,
    topic: str = "bench_t",
    headers: dict | None = None,
    flush_server=None,
) -> dict:
    payload = "x" * 1024  # 1 KiB, matching throughput.py's message size
    errors: list[Exception] = []
    flush_server = flush_server or server

    def run(pid: int) -> None:
        try:
            for _ in range(per_producer):
                code, _ = _req(
                    server.port,
                    "POST",
                    f"/v1/topic/{topic}/messages",
                    body=payload,
                    headers=headers,
                )
                assert code == 200
        except Exception as ex:  # pragma: no cover
            errors.append(ex)

    threads = [threading.Thread(target=run, args=(p,)) for p in range(producers)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    if errors:
        raise errors[0]
    total = producers * per_producer
    return {
        "requests": total,
        "seconds": round(dt, 2),
        "requests_per_sec": round(total / dt, 1),
        "spark_flushes": flush_server.coalescer.flushes,
        "merge_factor": round(total / max(flush_server.coalescer.flushes, 1), 1),
    }


def bench_forwarded_produce(spark, root: str, producers: int, per_producer: int) -> dict:
    """S4 server-side forwarding cost: same request-per-event workload,
    but every request hits the NON-leader facade with X-No-Redirect so
    the facade proxies it to the leader (routing route) — one extra
    local HTTP hop per request. Compare requests_per_sec with the
    direct `produce` stage to price the hop."""
    from barco_spark.sources.eventlog import EventLog
    from barco_spark.sources.http_server import BrokerHttpServer

    fa = BrokerHttpServer(EventLog(spark, root + "/fwdlog"))
    fb = BrokerHttpServer(EventLog(spark, root + "/fwdlog"))
    fa.start(), fb.start()
    try:
        leader_id = fa.registry.leader_for("fwd_t")[0]
        leader, follower = (
            (fa, fb) if leader_id == fa.registry.facade_id else (fb, fa)
        )
        out = bench_produce(
            follower,
            producers,
            per_producer,
            topic="fwd_t",
            headers={"X-No-Redirect": "1"},
            flush_server=leader,
        )
        out["forwarded"] = int(follower.metrics["rerouted_sent"].value)
        return out
    finally:
        fa.stop(), fb.stop()


def bench_poll(server, log, rows: int, polls: int) -> dict:
    import pyspark.sql.functions as F

    spark = log.spark
    df = spark.range(rows).select(
        F.concat(F.lit("k"), (F.col("id") % 1000).cast("string")).alias(
            "partition_key"
        ),
        F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("payload"),
    )
    log.produce("poll_t", df)
    _req(
        server.port,
        "PUT",
        "/v1/consumer/register?consumerId=lat1&group=lat&topic=poll_t&onNewGroup=earliest",
        body=" ",
    )
    # size batches so the topic drains across exactly ~`polls` polls
    per_bucket = max(1, rows // polls // log.buckets)
    lat: list[float] = []
    served = 0
    for _ in range(polls):
        t0 = time.perf_counter()
        code, body = _req(
            server.port,
            "POST",
            f"/v1/consumer/poll?consumerId=lat1&maxRecords={per_bucket}",
            body=" ",
            accept="application/json",
        )
        lat.append(time.perf_counter() - t0)
        if code == 200:
            served += sum(len(item["values"]) for item in json.loads(body))
    lat_ms = sorted(x * 1000 for x in lat)
    q = lambda p: lat_ms[min(len(lat_ms) - 1, int(p * len(lat_ms)))]  # noqa: E731
    # second consumer drains the same topic over the DEFAULT binary
    # item stream (no Accept header), for the marshal-cost comparison
    _req(
        server.port,
        "PUT",
        "/v1/consumer/register?consumerId=lat2&group=latb&topic=poll_t&onNewGroup=earliest",
        body=" ",
    )
    from barco_spark.sources.wire import decode_poll_response

    blat: list[float] = []
    bbytes = 0
    bserved = 0
    for _ in range(polls):
        t0 = time.perf_counter()
        code, raw = _req(
            server.port,
            "POST",
            f"/v1/consumer/poll?consumerId=lat2&maxRecords={per_bucket}",
            body=" ",
            raw=True,
        )
        blat.append(time.perf_counter() - t0)
        if code == 200:
            bbytes += len(raw)
            bserved += sum(
                len(item["records"]) for item in decode_poll_response(raw)
            )
    blat_ms = sorted(x * 1000 for x in blat)
    bq = lambda p: blat_ms[min(len(blat_ms) - 1, int(p * len(blat_ms)))]  # noqa: E731
    return {
        "rows": rows,
        "polls": polls,
        "records_served": served,
        "p50_ms": round(statistics.median(lat_ms), 1),
        "p90_ms": round(q(0.90), 1),
        "p99_ms": round(q(0.99), 1),
        "max_ms": round(lat_ms[-1], 1),
        "binary_p50_ms": round(statistics.median(blat_ms), 1),
        "binary_p99_ms": round(bq(0.99), 1),
        "binary_records_served": bserved,
        "binary_bytes": bbytes,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--polls", type=int, default=1000)
    ap.add_argument("--producers", type=int, default=32)
    ap.add_argument("--per-producer", type=int, default=25)
    args = ap.parse_args()

    from barco_spark.session import get_spark
    from barco_spark.sources.eventlog import EventLog
    from barco_spark.sources.http_server import BrokerHttpServer

    spark = get_spark(app_name="facade-bench")
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory() as root:
        log = EventLog(spark, root + "/log")
        server = BrokerHttpServer(log)
        server.start()
        try:
            produce = bench_produce(server, args.producers, args.per_producer)
            poll = bench_poll(server, log, args.rows, args.polls)
        finally:
            server.stop()
        forwarded = bench_forwarded_produce(
            spark, root, args.producers, args.per_producer
        )
    print(json.dumps({"produce": produce, "poll": poll,
                      "forwarded_produce": forwarded}))


if __name__ == "__main__":
    main()
