"""Consumer-group membership with debounced rebalance (R3 watcher).

The reference tracks connected consumers and re-deals bucket ownership
on membership change, but debounces the re-deal so a burst of
joins/leaves (a deploy rolling every consumer) triggers ONE rebalance
instead of N (internal/consuming/consumer_state.go:181-272: mutations
are queued and applied by a timer tick). The assignment itself stays
the pure deterministic deal-out of `assign_buckets`
(consumer_state.go:308-350) — this class only decides WHEN the applied
view advances to the latest membership.

Spark-first posture: no background thread is needed — the applied view
advances lazily whenever it is read past the debounce deadline, which
makes the behavior deterministic and testable with an injected clock
(the HTTP facade reads it on every poll).
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable
from urllib.parse import quote, unquote

from barco_spark.sources.eventlog import assign_buckets


class GroupMembership:
    """Tracks live consumers per group; applies the deterministic
    deal-out after a debounce window of membership quiet time."""

    def __init__(
        self,
        buckets: int,
        debounce_s: float = 0.0,
        clock: Callable[[], float] = time.monotonic,
    ) -> None:
        self.buckets = buckets
        self.debounce_s = debounce_s
        self._clock = clock
        self._members: dict[str, set[str]] = {}
        # the served view: group -> consumer_id -> [buckets]
        self._applied: dict[str, dict[str, list[int]]] = {}
        # group -> deadline after which the pending membership applies
        self._deadline: dict[str, float] = {}

    # -- mutations ------------------------------------------------------
    def join(self, group: str, consumer_id: str) -> None:
        members = self._members.setdefault(group, set())
        if consumer_id in members:
            return  # idempotent re-register keeps the current view
        members.add(consumer_id)
        self._touch(group)

    def leave(self, group: str, consumer_id: str) -> None:
        members = self._members.get(group, set())
        if consumer_id not in members:
            return
        members.discard(consumer_id)
        self._touch(group)

    def _touch(self, group: str) -> None:
        now = self._clock()
        if group not in self._applied:
            # first change a group sees applies immediately: there is no
            # previous ownership to keep stable while debouncing
            self._applied[group] = assign_buckets(
                sorted(self._members.get(group, set())), self.buckets
            )
            self._deadline.pop(group, None)
        else:
            # further churn inside the window extends it (the reference
            # resets its rebalance timer on every queued mutation)
            self._deadline[group] = now + self.debounce_s

    # -- reads ----------------------------------------------------------
    def assignment(self, group: str) -> dict[str, list[int]]:
        """Current applied deal-out for the whole group (advances past
        the debounce deadline; stable inside the window)."""
        deadline = self._deadline.get(group)
        if deadline is not None and self._clock() >= deadline:
            self._applied[group] = assign_buckets(
                sorted(self._members.get(group, set())), self.buckets
            )
            self._deadline.pop(group, None)
        return self._applied.get(group, {})

    def buckets_for(self, group: str, consumer_id: str) -> list[int]:
        """Buckets this consumer currently owns ([] while unassigned)."""
        return self.assignment(group).get(consumer_id, [])

    def members(self, group: str) -> list[str]:
        return sorted(self._members.get(group, set()))

    def rebalance_pending(self, group: str) -> bool:
        return group in self._deadline

    def bootstrap(self, members: dict[str, set[str]]) -> None:
        """Adopt a recovered membership snapshot in one step, applying
        the deal-out immediately (a restarting facade must serve the
        same assignment the group had, not debounce every recovered
        member as churn)."""
        for group, cids in members.items():
            self._members[group] = set(cids)
            self._applied[group] = assign_buckets(sorted(cids), self.buckets)
            self._deadline.pop(group, None)


class MembershipStore:
    """Durable, shared consumer-registration store.

    The reference replicates consumer registrations to peer brokers so
    any broker can answer for the group and a broker restart forgets
    nothing (internal/consuming/server.go:569-591, consumer_state.go
    peer sync). On shared storage the same guarantee is one object per
    consumer under ``{root}/_membership/{group}/{consumer}.json`` —
    joins/leaves are single-file writes/deletes (no multi-writer
    conflict between facades), and every facade over the same log root
    sees one membership view by listing the directory. Object-store
    friendly by construction (one small object per consumer, no
    appends, no renames of shared files) — but this implementation
    writes through the local filesystem, so a ``scheme://`` root is
    rejected loudly instead of silently creating a cwd-relative
    ``./s3:/...`` directory no peer facade would ever see. Run facades
    over a mounted shared path (NFS/FUSE), or subclass with an
    object-store client.
    """

    def __init__(self, root: str) -> None:
        if "://" in root:
            raise NotImplementedError(
                "MembershipStore writes through the local filesystem; "
                f"object-store root {root!r} needs a mounted path "
                "(NFS/FUSE) or an object-store-backed subclass"
            )
        self.path = os.path.join(root, "_membership")

    def version(self) -> tuple:
        """Cheap change stamp: (name, mtime_ns) of the membership root
        and every group dir. File creates/deletes/os.replace all bump
        the containing directory's mtime, so an unchanged stamp means
        consumers() would return the same view — callers use it to skip
        full rescans on hot paths (the facade checks it per poll)."""
        try:
            st = os.stat(self.path)
        except FileNotFoundError:
            return ()
        parts = [("", st.st_mtime_ns)]
        for gdir in sorted(os.listdir(self.path)):
            gpath = os.path.join(self.path, gdir)
            try:
                gst = os.stat(gpath)
            except FileNotFoundError:
                continue  # concurrent group removal
            if os.path.isdir(gpath):
                parts.append((gdir, gst.st_mtime_ns))
        return tuple(parts)

    def _group_dir(self, group: str) -> str:
        return os.path.join(self.path, quote(group, safe=""))

    def put(self, group: str, consumer_id: str, topics: list[str]) -> None:
        d = self._group_dir(group)
        os.makedirs(d, exist_ok=True)
        target = os.path.join(d, quote(consumer_id, safe="") + ".json")
        tmp = target + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(
                {"group": group, "consumer_id": consumer_id, "topics": topics},
                fh,
            )
        os.replace(tmp, target)  # atomic publish

    def remove(self, group: str, consumer_id: str) -> None:
        target = os.path.join(
            self._group_dir(group), quote(consumer_id, safe="") + ".json"
        )
        try:
            os.remove(target)
        except FileNotFoundError:
            pass  # concurrent goodbye from another facade already won

    def consumers(self) -> dict[str, tuple[str, list[str]]]:
        """consumer_id -> (group, topics) across every group."""
        out: dict[str, tuple[str, list[str]]] = {}
        if not os.path.isdir(self.path):
            return out
        for gdir in sorted(os.listdir(self.path)):
            gpath = os.path.join(self.path, gdir)
            if not os.path.isdir(gpath):
                continue
            for fn in sorted(os.listdir(gpath)):
                if not fn.endswith(".json"):
                    continue
                try:
                    with open(os.path.join(gpath, fn), encoding="utf-8") as fh:
                        rec = json.load(fh)
                except (OSError, json.JSONDecodeError):
                    continue  # torn concurrent write: visible next scan
                cid = rec.get("consumer_id") or unquote(fn[: -len(".json")])
                out[cid] = (rec.get("group", unquote(gdir)), rec.get("topics", []))
        return out

    def members(self) -> dict[str, set[str]]:
        """group -> set of consumer ids (derived from consumers())."""
        out: dict[str, set[str]] = {}
        for cid, (group, _topics) in self.consumers().items():
            out.setdefault(group, set()).add(cid)
        return out


class LocalMembershipStore:
    """Single-facade fallback for roots MembershipStore cannot serve
    (object-store URIs without a mounted path): keeps registrations in
    this process only. Restart recovery and cross-facade convergence
    are explicitly OFF — the facade logs a warning when it picks this —
    but the single-facade contract is identical to the durable store.
    """

    def __init__(self, root: str) -> None:
        self._data: dict[str, tuple[str, list[str]]] = {}
        self._version = 0

    def version(self) -> tuple:
        return (self._version,)

    def put(self, group: str, consumer_id: str, topics: list[str]) -> None:
        self._data[consumer_id] = (group, topics)
        self._version += 1

    def remove(self, group: str, consumer_id: str) -> None:
        self._data.pop(consumer_id, None)
        self._version += 1

    def consumers(self) -> dict[str, tuple[str, list[str]]]:
        return dict(self._data)

    def members(self) -> dict[str, set[str]]:
        out: dict[str, set[str]] = {}
        for cid, (group, _topics) in self._data.items():
            out.setdefault(group, set()).add(cid)
        return out
