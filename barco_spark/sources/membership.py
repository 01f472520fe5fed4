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

import time
from typing import Callable

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
