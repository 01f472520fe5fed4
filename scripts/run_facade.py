#!/usr/bin/env python
"""Facade entrypoint for containers and dev mode.

Mirrors the reference's single-broker dev mode (POLAR_DEV_MODE,
docs/install/docker_compose/README.md): one process serving the full
produce/consume REST surface plus /status and /metrics. Configuration
by environment:

- LOG_ROOT     event-log root (default /var/lib/barco/log; any
               pyarrow.fs-supported scheme:// URI works)
- FACADE_PORT  HTTP port (default 9250, the reference's producer port)
- FACADE_TTL_S facade-registry heartbeat TTL for multi-facade roots
- FORWARD_PRODUCE=1  proxy mis-routed produces to the topic leader
               server-side for every client (gossiper.SendToLeader
               behavior) instead of only on X-No-Redirect; default
               off (307 redirects, zero proxy overhead for
               leader-aware clients)
"""

from __future__ import annotations

import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from barco_spark.session import get_spark
    from barco_spark.sources.eventlog import EventLog
    from barco_spark.sources.http_server import BrokerHttpServer

    root = os.environ.get("LOG_ROOT", "/var/lib/barco/log")
    port = int(os.environ.get("FACADE_PORT", "9250"))
    ttl = float(os.environ.get("FACADE_TTL_S", "10"))
    fwd = os.environ.get("FORWARD_PRODUCE", "") in ("1", "true", "yes")
    log = EventLog(get_spark(app_name="barco-facade"), root)
    srv = BrokerHttpServer(
        log, host="0.0.0.0", port=port, facade_ttl_s=ttl, forward_produce=fwd
    )
    srv.start()
    print(f"facade listening on :{srv.port} root={root}", flush=True)

    stop = {"flag": False}

    def _sig(*_a):
        stop["flag"] = True

    signal.signal(signal.SIGTERM, _sig)
    signal.signal(signal.SIGINT, _sig)
    try:
        while not stop["flag"]:
            time.sleep(1)
    finally:
        srv.stop()


if __name__ == "__main__":
    main()
