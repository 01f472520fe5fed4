"""Python client for the facade — the reference-client surface.

The reference ships client libraries that speak discovery, produce with
partition-aware routing, and the consumer register/poll/commit/goodbye
protocol (docs/developer/NETWORK_FORMATS.md; internal routes in
internal/conf/constants.go:5-22). This is that surface for the Spark
facade, stdlib-only:

- ``BarcoProducer``: POST produce with ``partitionKey``; on a 307 the
  topic's leader (multi-facade single-writer routing) is learned from
  ``Location``/body and cached, so subsequent sends go direct — the
  client-side half of the reference's partition-aware routing.
- ``BarcoConsumer``: register -> poll -> commit/goodbye. Polls consume
  the facade's DEFAULT compressed binary item stream and decode it
  field-for-field (``wire.decode_poll_response``); ``json_mode=True``
  asks for ``application/json`` instead, like the reference's Accept
  negotiation. 204 means "no buckets owned yet, retry" and returns [].

Both are plain HTTP/1.1 via urllib — no third-party deps, usable from
any Python process with no Spark on the client side.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request

from barco_spark.sources.wire import decode_poll_response

_TIMEOUT_S = 30.0


class BarcoClientError(RuntimeError):
    def __init__(self, status: int, body: str):
        super().__init__(f"HTTP {status}: {body[:200]}")
        self.status = status
        self.body = body


def _request(
    base: str,
    method: str,
    path: str,
    body: bytes | None = None,
    headers: dict | None = None,
) -> tuple[int, bytes, dict]:
    req = urllib.request.Request(base + path, data=body, method=method)
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    try:
        with urllib.request.urlopen(req, timeout=_TIMEOUT_S) as resp:
            return resp.status, resp.read(), dict(resp.headers)
    except urllib.error.HTTPError as ex:
        payload = ex.read()
        if ex.code == 307:  # reroute: not an error, caller follows
            return ex.code, payload, dict(ex.headers)
        raise BarcoClientError(ex.code, payload.decode(errors="replace"))


def discover(base: str) -> dict:
    """GET /v1/brokers — the client-discovery bootstrap."""
    _, body, _ = _request(base, "GET", "/v1/brokers")
    return json.loads(body)


class BarcoProducer:
    """Produce client with leader-following (307) topic routing.

    ``server_side_routing=True`` sends ``X-No-Redirect`` so a
    mis-routed produce is proxied to the leader BY THE FACADE (the
    reference's gossiper.SendToLeader behavior) — for clients whose
    HTTP stack refuses to re-POST on 3xx. The default keeps
    client-side 307 following (one fewer proxy hop once the leader
    is cached)."""

    def __init__(self, base: str, server_side_routing: bool = False):
        self.base = base.rstrip("/")
        self.server_side_routing = server_side_routing
        self._leader: dict[str, str] = {}  # topic -> base url

    def produce(
        self, topic: str, message: str, key: str | None = None
    ) -> dict:
        qs = f"?partitionKey={urllib.parse.quote(key)}" if key else ""
        path = f"/v1/topic/{urllib.parse.quote(topic)}/messages{qs}"
        base = self._leader.get(topic, self.base)
        headers = {"Content-Type": "text/plain"}
        if self.server_side_routing:
            headers["X-No-Redirect"] = "1"
        status, body, headers_out = _request(
            base, "POST", path, message.encode(), headers
        )
        if status == 307:
            # multi-facade: this facade is not the topic's leader; learn
            # the leader and re-issue there (cached for future sends)
            leader = headers_out.get("Location", "").split("/v1/")[0]
            if not leader:
                leader = json.loads(body)["leader"]
            self._leader[topic] = leader
            status, body, _ = _request(
                leader, "POST", path, message.encode(),
                {"Content-Type": "text/plain"},
            )
        if status != 200:
            raise BarcoClientError(status, body.decode(errors="replace"))
        return json.loads(body)


class BarcoBoundConsumer:
    """Connection-bound consumer client — the reference's DEFAULT
    client mode (consuming/server.go:255-259): one keep-alive
    connection carries the identity, registration is a JSON
    ConsumerInfo body, polls omit ``consumerId``, and ``close()``
    (or a crash dropping the socket) unregisters server-side
    immediately. Use as a context manager; binary polls by default."""

    def __init__(
        self,
        host: str,
        port: int,
        consumer_id: str,
        group: str,
        topic: str,
        on_new_group: str = "startFromEarliest",
        json_mode: bool = False,
    ):
        import http.client

        self.json_mode = json_mode
        self._conn = http.client.HTTPConnection(host, port, timeout=_TIMEOUT_S)
        body = json.dumps(
            {
                "id": consumer_id,
                "group": group,
                "topics": [topic],
                "onNewGroup": on_new_group,
            }
        )
        self._conn.request("PUT", "/v1/consumer/register", body=body)
        resp = self._conn.getresponse()
        payload = resp.read()
        if resp.status != 200:
            raise BarcoClientError(resp.status, payload.decode(errors="replace"))

    def poll(self, max_records: int = 1000) -> list[dict]:
        headers = {"Accept": "application/json"} if self.json_mode else {}
        self._conn.request(
            "POST",
            f"/v1/consumer/poll?maxRecords={max_records}",
            body=" ",
            headers=headers,
        )
        resp = self._conn.getresponse()
        body = resp.read()
        if resp.status == 204:
            return []
        if resp.status != 200:
            raise BarcoClientError(resp.status, body.decode(errors="replace"))
        if self.json_mode:
            return json.loads(body)
        return decode_poll_response(body)

    def payloads(self, max_records: int = 1000) -> list[str]:
        items = self.poll(max_records)
        if self.json_mode:
            return [v for item in items for v in item["values"]]
        return [r["payload"] for item in items for r in item["records"]]

    def close(self) -> None:
        """Drop the connection: the facade unregisters this consumer
        and re-deals its buckets immediately."""
        self._conn.close()

    def __enter__(self) -> "BarcoBoundConsumer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class BarcoConsumer:
    """Register/poll/commit/goodbye client; binary polls by default."""

    def __init__(
        self,
        base: str,
        consumer_id: str,
        group: str,
        topic: str,
        on_new_group: str = "earliest",
        json_mode: bool = False,
    ):
        self.base = base.rstrip("/")
        self.consumer_id = consumer_id
        self.group = group
        self.topic = topic
        self.on_new_group = on_new_group
        self.json_mode = json_mode
        self._register()

    def _register(self) -> None:
        _request(
            self.base,
            "PUT",
            "/v1/consumer/register"
            f"?consumerId={urllib.parse.quote(self.consumer_id)}"
            f"&group={urllib.parse.quote(self.group)}"
            f"&topic={urllib.parse.quote(self.topic)}"
            f"&onNewGroup={self.on_new_group}",
            b" ",
        )

    def _consumer_qs(self) -> str:
        return f"?consumerId={urllib.parse.quote(self.consumer_id)}"

    def poll(self, max_records: int = 1000) -> list[dict]:
        """One poll; returns decoded response items ([] on 204).

        Each item carries ``topic``, ``start_offset`` (binary) or
        ``startOffset`` (json) and its records/values, exactly as the
        facade serialized them. A consumer the facade evicted for
        inactivity (R13) is transparently re-registered and retried
        once — committed offsets live server-side per group, so the
        re-registered consumer resumes where the group left off.
        """
        headers = {"Accept": "application/json"} if self.json_mode else {}
        try:
            status, body, _ = _request(
                self.base,
                "POST",
                f"/v1/consumer/poll{self._consumer_qs()}"
                f"&maxRecords={max_records}",
                b" ",
                headers,
            )
        except BarcoClientError as ex:
            # 409 Conflict = the reference's "Consumer not registered"
            # (the facade evicted us, R13); 400+"Unregistered" was this
            # facade's pre-r8 spelling, kept for rolling upgrades
            evicted = ex.status == 409 or (
                ex.status == 400 and "Unregistered" in ex.body
            )
            if not evicted:
                raise
            self._register()
            status, body, _ = _request(
                self.base,
                "POST",
                f"/v1/consumer/poll{self._consumer_qs()}"
                f"&maxRecords={max_records}",
                b" ",
                headers,
            )
        if status == 204:
            return []
        if self.json_mode:
            return json.loads(body)
        return decode_poll_response(body)

    def payloads(self, max_records: int = 1000) -> list[str]:
        """Flattened record payloads from one poll."""
        items = self.poll(max_records)
        if self.json_mode:
            return [v for item in items for v in item["values"]]
        return [r["payload"] for item in items for r in item["records"]]

    def commit(self) -> dict:
        # Accept: application/json opts into the facade's committed-map
        # extension; the reference-exact default is 204 No Content
        status, body, _ = _request(
            self.base, "POST", f"/v1/consumer/commit{self._consumer_qs()}",
            b" ", {"Accept": "application/json"},
        )
        return json.loads(body) if status == 200 else {}

    def goodbye(self) -> None:
        _request(
            self.base, "POST", f"/v1/consumer/goodbye{self._consumer_qs()}", b" "
        )

    def __enter__(self) -> "BarcoConsumer":
        return self

    def __exit__(self, *exc) -> None:
        try:
            self.goodbye()
        except BarcoClientError:
            pass
