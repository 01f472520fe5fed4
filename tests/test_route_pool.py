"""RouteClientPool failure-phase semantics (the at-least-once rules
the forwarding paths rely on): stale keep-alive sockets retry ONCE on
a fresh dial — whether they fail at send time or as zero-byte
RemoteDisconnected at response time — while fresh-dial failures and
possibly-post-apply errors surface to the caller."""

from __future__ import annotations

import socket as _socket
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from barco_spark.sources.membership import RouteClientPool


class _Srv:
    """Tiny keep-alive HTTP server we can kill and resurrect on the
    SAME port (SO_REUSEADDR), to make pooled sockets go stale."""

    def __init__(self, port: int = 0):
        srv_self = self

        class H(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, fmt, *args):  # noqa: N802
                pass

            def do_POST(self):  # noqa: N802
                n = int(self.headers.get("Content-Length", 0) or 0)
                if n:
                    self.rfile.read(n)
                body = f"gen{srv_self.gen}".encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        class S(ThreadingHTTPServer):
            allow_reuse_address = True
            daemon_threads = True

            def process_request(self, request, client_address):
                # remember accepted sockets so restart() can force-close
                # kept-alive connections (their handler threads block on
                # the next request line otherwise)
                srv_self._accepted.append(request)
                super().process_request(request, client_address)

        self._handler = H
        self._cls = S
        self._accepted: list = []
        self.gen = 0
        self._srv = S(("127.0.0.1", port), H)
        self.port = self._srv.server_address[1]
        self._start_thread()

    def _start_thread(self):
        self._thread = threading.Thread(
            target=self._srv.serve_forever, daemon=True
        )
        self._thread.start()

    def restart(self):
        """Kill every live connection and come back on the same port."""
        self._srv.shutdown()
        self._srv.server_close()
        for s in self._accepted:
            try:
                s.shutdown(_socket.SHUT_RDWR)
            except OSError:
                pass
            try:
                s.close()
            except OSError:
                pass
        self._accepted.clear()
        self.gen += 1
        self._srv = self._cls(("127.0.0.1", self.port), self._handler)
        self._start_thread()

    def stop(self):
        self._srv.shutdown()
        self._srv.server_close()


def test_pool_reuses_keepalive_connections():
    srv = _Srv()
    pool = RouteClientPool()
    try:
        for _ in range(3):
            status, data, _ = pool.send(
                "127.0.0.1", srv.port, "POST", "/x", b"b", {}
            )
            assert (status, data) == (200, b"gen0")
        # exactly one connection was ever dialed and is now idle
        assert len(pool._idle[("127.0.0.1", srv.port)]) == 1
    finally:
        pool.close_all()
        srv.stop()


def test_pool_retries_stale_socket_on_fresh_dial():
    """The peer restarts while a connection sits idle in the pool: the
    next send must transparently retry on a FRESH dial (the stale
    socket fails as send-phase error or zero-byte RemoteDisconnected —
    either way the request provably never reached the new process)."""
    srv = _Srv()
    pool = RouteClientPool()
    try:
        status, data, _ = pool.send("127.0.0.1", srv.port, "POST", "/x", b"b", {})
        assert (status, data) == (200, b"gen0")
        srv.restart()  # the pooled socket is now half-closed
        status, data, _ = pool.send("127.0.0.1", srv.port, "POST", "/x", b"b", {})
        assert (status, data) == (200, b"gen1")
    finally:
        pool.close_all()
        srv.stop()


def test_pool_garbled_response_surfaces_as_route_exhausted():
    """A peer that answers PARTIAL garbage bytes (half a status line,
    then close) raises http.client.BadStatusLine — an HTTPException,
    not an OSError. send() must close the socket and raise it, and
    post_to_leader must convert it to RouteExhaustedError (possibly
    post-apply: never re-send, never crash the handler thread)."""
    from barco_spark.sources.membership import RouteExhaustedError

    lsock = _socket.socket()
    lsock.setsockopt(_socket.SOL_SOCKET, _socket.SO_REUSEADDR, 1)
    lsock.bind(("127.0.0.1", 0))
    lsock.listen(4)
    port = lsock.getsockname()[1]
    served = threading.Event()

    def garbage_server():
        conn, _ = lsock.accept()
        # drain the WHOLE request (headers may arrive in a separate
        # segment from the body): closing early would reset the still-
        # sending client (ECONNRESET) instead of exercising the garbled-
        # status-line read this test is about
        buf = b""
        while b"payload" not in buf:
            chunk = conn.recv(65536)
            if not chunk:
                break
            buf += chunk
        conn.sendall(b"HTTP/1.1 20")  # half a status line, then close
        conn.close()
        served.set()

    t = threading.Thread(target=garbage_server, daemon=True)
    t.start()

    class FakeRegistry:
        def leader_for(self, topic):
            return "peer", "127.0.0.1", port

    pool = RouteClientPool(timeout=2.0)
    try:
        with pytest.raises(RouteExhaustedError, match="BadStatusLine"):
            pool.post_to_leader(
                FakeRegistry(), "t", "t", "", b"payload",
                {"Content-Type": "text/plain"},
            )
        assert served.wait(2)  # exactly one request: no duplicate re-send
        assert not pool._idle  # the garbled socket was not pooled
    finally:
        pool.close_all()
        lsock.close()


def test_pool_fresh_dial_failure_surfaces():
    """A dead peer (nothing listening) raises to the caller — no
    silent swallowing when the failure isn't a stale-socket case."""
    srv = _Srv()
    port = srv.port
    srv.stop()
    pool = RouteClientPool(timeout=2.0)
    try:
        with pytest.raises(OSError):
            pool.send("127.0.0.1", port, "POST", "/x", b"b", {})
    finally:
        pool.close_all()
