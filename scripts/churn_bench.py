"""Round-8 platform-surface measurements (VERDICT r8 item 5):

1. CONNECTION-BOUND CHURN: N bound consumers (JSON ConsumerInfo over
   HTTP/1.1 keep-alive, the reference's default client mode) in one
   group; kill their sockets one by one at rate R and measure, per
   kill, socket-close -> unregister latency and socket-close ->
   buckets-fully-redealt-to-survivors latency (the reference's
   TrackedConnection close -> unRegister -> rebalance flow,
   consuming/server.go:140-143,476).

2. FLEET-WORST-CASE FORWARDING: K concurrent request-per-event
   producers ALL pointed at the NON-leader facade with server-side
   routing on (every request pays the proxy hop,
   gossiper.SendToLeader), vs the same K pointed at the leader —
   extends the single-producer 0.55x row with fleet concurrency to
   show whether the hop serializes under load.

3. BINARY REROUTE WORST CASE: a pipelined keyed burst through the
   non-leader's binary server (every frame routed as producer.frames)
   vs a leader-co-located one — the round-8 addendum's numbers.

Usage: python scripts/churn_bench.py [--consumers 20] [--kill-ms 50]
       [--producers 8] [--per-producer 50]
Prints one JSON line; rows go to SCALING.md.
"""

from __future__ import annotations

import argparse
import http.client
import json
import os
import sys
import tempfile
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_bound_churn(spark, root: str, n_consumers: int, kill_ms: float) -> dict:
    from barco_spark.sources.eventlog import EventLog
    from barco_spark.sources.http_server import BrokerHttpServer

    srv = BrokerHttpServer(EventLog(spark, root + "/churn"))
    srv.start()
    try:
        # some data so polls are real
        code_req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/topic/t/messages?partitionKey=k",
            data=b"m", method="POST", headers={"Content-Type": "text/plain"},
        )
        urllib.request.urlopen(code_req).read()
        all_buckets = set(range(srv.log.buckets))

        conns = []
        for i in range(n_consumers):
            c = http.client.HTTPConnection("127.0.0.1", srv.port)
            c.request(
                "PUT", "/v1/consumer/register",
                body=json.dumps(
                    {"id": f"c{i:03d}", "group": "g", "topics": ["t"]}
                ),
            )
            resp = c.getresponse()
            assert resp.status == 200, resp.read()
            resp.read()
            conns.append((f"c{i:03d}", c))

        # one poll each so every consumer is live in the deal-out
        for _cid, c in conns:
            c.request("POST", "/v1/consumer/poll", body=" ",
                      headers={"Accept": "application/json"})
            r = c.getresponse()
            r.read()

        unregister_lat: list[float] = []
        redeal_lat: list[float] = []
        survivors = {cid for cid, _ in conns}
        for cid, c in conns[:-1]:  # keep one survivor
            survivors.discard(cid)
            t0 = time.perf_counter()
            c.close()
            # unregister: consumer gone from the tracked table
            while cid in srv._consumers:
                time.sleep(0.0005)
            unregister_lat.append(time.perf_counter() - t0)
            # re-deal complete: survivors' buckets cover the full ring
            # (drive via the same membership the poll path consults)
            while True:
                owned = set()
                for s in survivors:
                    owned.update(srv.membership.buckets_for("g", s))
                if owned == all_buckets:
                    break
                time.sleep(0.0005)
            redeal_lat.append(time.perf_counter() - t0)
            time.sleep(kill_ms / 1000.0)

        def pct(xs, p):
            xs = sorted(xs)
            return round(xs[min(len(xs) - 1, int(p * len(xs)))] * 1000, 2)

        return {
            "consumers": n_consumers,
            "kill_interval_ms": kill_ms,
            "unregister_ms_p50": pct(unregister_lat, 0.5),
            "unregister_ms_p99": pct(unregister_lat, 0.99),
            "redeal_ms_p50": pct(redeal_lat, 0.5),
            "redeal_ms_p99": pct(redeal_lat, 0.99),
        }
    finally:
        srv.stop()


def _producer_loop(port: int, topic: str, n: int, payload: str, out: list):
    ok = 0
    for i in range(n):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/topic/{topic}/messages?partitionKey=k{i % 32}",
            data=payload.encode(), method="POST",
            headers={"Content-Type": "text/plain"},
        )
        with urllib.request.urlopen(req) as resp:
            resp.read()
            ok += 1
    out.append(ok)


def bench_fleet_forwarding(spark, root: str, producers: int, per: int) -> dict:
    from barco_spark.sources.eventlog import EventLog
    from barco_spark.sources.http_server import BrokerHttpServer

    fa = BrokerHttpServer(EventLog(spark, root + "/fleet"), forward_produce=True)
    fb = BrokerHttpServer(EventLog(spark, root + "/fleet"), forward_produce=True)
    fa.start(), fb.start()
    try:
        leader_id = fa.registry.leader_for("t")[0]
        leader, follower = (
            (fa, fb) if leader_id == fa.registry.facade_id else (fb, fa)
        )
        payload = "x" * 1024

        def run(port: int) -> float:
            outs: list = []
            threads = [
                threading.Thread(
                    target=_producer_loop, args=(port, "t", per, payload, outs)
                )
                for _ in range(producers)
            ]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            dt = time.perf_counter() - t0
            assert sum(outs) == producers * per
            return producers * per / dt

        # warmup both paths once (JIT/coalescer spin-up)
        run(leader.port)
        run(follower.port)
        direct = run(leader.port)
        forwarded = run(follower.port)  # EVERY request proxied
        return {
            "producers": producers,
            "per_producer": per,
            "direct_req_s": round(direct, 1),
            "forwarded_req_s": round(forwarded, 1),
            "ratio": round(forwarded / direct, 3),
        }
    finally:
        fa.stop(), fb.stop()


def bench_binary_reroute(spark, root: str, n_frames: int = 300) -> dict:
    """3. BINARY REROUTE WORST CASE: a pipelined keyed burst through
    the NON-leader facade's binary server (every frame routed to the
    leader over producer.frames bodies) vs the same burst through a
    leader-co-located server. The SCALING.md round-8 addendum numbers
    (37 -> 1335 frames/s after concurrent per-key buckets + merged
    bodies) come from this shape."""
    import socket

    from barco_spark.sources.eventlog import EventLog
    from barco_spark.sources.http_server import BrokerHttpServer
    from barco_spark.sources.tcp_server import BinaryProducerServer
    from barco_spark.sources.wire import (
        HEADER_SIZE,
        PRODUCE_RESPONSE_OP,
        READY_OP,
        STARTUP_OP,
        encode_frame,
        encode_produce_frame,
        parse_header,
    )

    def recv_frame(sock):
        head = b""
        while len(head) < HEADER_SIZE:
            head += sock.recv(HEADER_SIZE - len(head))
        _f, sid, op, blen = parse_header(head)
        body = b""
        while len(body) < blen:
            body += sock.recv(blen - len(body))
        return sid, op

    fa = BrokerHttpServer(EventLog(spark, root + "/bin"))
    fb = BrokerHttpServer(EventLog(spark, root + "/bin"))
    fa.start(), fb.start()
    leader_id = fa.registry.leader_for("t")[0]
    leader, follower = (
        (fa, fb) if leader_id == fa.registry.facade_id else (fb, fa)
    )
    srv_direct = BinaryProducerServer(
        leader.log, registry=leader.registry, lock=leader._lock
    )
    srv_routed = BinaryProducerServer(
        follower.log, registry=follower.registry, lock=follower._lock
    )
    srv_direct.start(), srv_routed.start()
    payload = "x" * 1024
    try:
        def run(port: int) -> float:
            with socket.create_connection(("127.0.0.1", port)) as sock:
                sock.sendall(encode_frame(STARTUP_OP, stream_id=1))
                assert recv_frame(sock) == (1, READY_OP)
                burst = b"".join(
                    encode_produce_frame(
                        "t", [payload], partition_key=f"k{i % 32}",
                        stream_id=i % 60000,
                    )
                    for i in range(n_frames)
                )
                t0 = time.perf_counter()
                sock.sendall(burst)
                for _ in range(n_frames):
                    assert recv_frame(sock)[1] == PRODUCE_RESPONSE_OP
                return n_frames / (time.perf_counter() - t0)

        run(srv_direct.port), run(srv_routed.port)  # warm both paths
        direct = max(run(srv_direct.port), run(srv_direct.port))
        routed = max(run(srv_routed.port), run(srv_routed.port))
        return {
            "frames": n_frames,
            "direct_fps": round(direct, 1),
            "routed_fps": round(routed, 1),
            "ratio": round(routed / direct, 3),
        }
    finally:
        srv_direct.stop(), srv_routed.stop()
        fa.stop(), fb.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--consumers", type=int, default=20)
    ap.add_argument("--kill-ms", type=float, default=50.0)
    ap.add_argument("--producers", type=int, default=8)
    ap.add_argument("--per-producer", type=int, default=50)
    args = ap.parse_args()

    from barco_spark.session import get_spark

    spark = get_spark(app_name="churn-bench")
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory(prefix="churn-bench-") as root:
        churn = bench_bound_churn(spark, root, args.consumers, args.kill_ms)
        fleet = bench_fleet_forwarding(
            spark, root, args.producers, args.per_producer
        )
        binary = bench_binary_reroute(spark, root)
    print(json.dumps({
        "bound_churn": churn,
        "fleet_forwarding": fleet,
        "binary_reroute": binary,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
