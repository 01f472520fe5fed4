"""Pin the driver contract's rotating CORRECTNESS window (r11 policy).

The driver hash-checks exactly the FIRST 50 entries of
``__spark_entry__.queries()`` in iteration order.  Round 10 curated the
window once (relational anchors + LLM flagships); round 11 turns the
curation into a standing ROTATION POLICY (VERDICT r10 item 2) so the
whole registry cycles through driver-oracle coverage:

* ``CANARY_CORE`` (10 fixed queries) appears in every round's window.
* The other 40 slots rotate each round through oracle-paired entries
  that have never had a driver-oracle row; when that pool drains, the
  least-recently-checked return.
* Each round's window must be >=60% disjoint from the previous round's
  committed window.

These tests make the policy an explicit, reviewed contract instead of
an import-order accident.
"""

from __future__ import annotations

import json
import os
import subprocess

import __spark_entry__ as entrymod
from barco_spark.registry import load_all

QUERIES = load_all()
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROTATION_ROUND = 12  # bump when a new ROTATION_R{N} list lands


def _committed_correctness_files() -> list[str]:
    """CORRECTNESS_r*.json names tracked by git (the policy counts
    COMMITTED windows only — an untracked/stale local file from an
    abandoned round must not change which entries count as checked)."""
    out = subprocess.run(
        ["git", "ls-files", "CORRECTNESS_r*.json"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    )
    return [line for line in out.stdout.splitlines() if line]


def _checked_before(round_n: int) -> set[str]:
    """Names with a driver-oracle row in any committed CORRECTNESS file
    from a round strictly before ``round_n``."""
    seen: set[str] = set()
    for name in _committed_correctness_files():
        digits = "".join(c for c in name if c.isdigit())
        if not digits or int(digits) >= round_n:
            continue
        blob = subprocess.run(
            ["git", "show", f"HEAD:{name}"],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        seen |= set(json.loads(blob).keys())
    return seen


def test_window_is_exactly_fifty_known_queries():
    w = entrymod.DRIVER_WINDOW
    assert len(w) == 50
    assert len(set(w)) == 50
    missing = [n for n in w if n not in QUERIES]
    assert not missing, f"window names not in registry: {missing}"


def test_queries_iteration_order_leads_with_the_window():
    names = list(entrymod.queries())
    assert names[:50] == entrymod.DRIVER_WINDOW
    # nothing is dropped: every registry entry still reaches the driver
    assert set(names) == set(QUERIES)
    assert len(names) == len(QUERIES)


def test_canary_core_is_fixed_and_first():
    """The 10 regression tripwires open every round's window, flagship
    first (entry() depends on q1)."""
    core = entrymod.CANARY_CORE
    assert len(core) == 10 and len(set(core)) == 10
    assert core[0] == "q1_pricing_summary"
    assert entrymod.DRIVER_WINDOW[:10] == core
    # every core member is oracle-paired — canaries must hash-check
    assert all(QUERIES[n].oracle is not None for n in core)
    # the anchors the verdicts watch hardest stay in the core
    for anchor in (
        "q3_shipping_priority",
        "q5_region_revenue",
        "scan_filter_project",
        "events_exact_tokens",
        "events_bucket_offsets",
    ):
        assert anchor in core


def _previous_committed_window() -> set[str]:
    """Key set of the highest-round committed CORRECTNESS file strictly
    below ROTATION_ROUND — the previous round's actual driver window."""
    best_round, best_name = 0, None
    for name in _committed_correctness_files():
        digits = "".join(c for c in name if c.isdigit())
        if digits and best_round < int(digits) < ROTATION_ROUND:
            best_round, best_name = int(digits), name
    if best_name is None:
        return set()
    blob = subprocess.run(
        ["git", "show", f"HEAD:{best_name}"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    return set(json.loads(blob).keys())


def test_window_rotates_at_least_sixty_percent():
    """Policy invariant: the current window shares at most 20 names with
    the previous round's committed window (>=60% disjoint)."""
    overlap = set(entrymod.DRIVER_WINDOW) & _previous_committed_window()
    assert len(overlap) <= 20, sorted(overlap)


def test_rotating_slots_are_previously_unchecked_and_oracled():
    """While the never-checked pool lasts, every rotating slot must be a
    query with NO driver-oracle row in any earlier round, and must be
    oracle-paired (the window spends at most 1 slot on a rows-only
    entry)."""
    rotation = entrymod.DRIVER_WINDOW[10:]
    assert len(rotation) == 40
    seen = _checked_before(ROTATION_ROUND)
    stale = [n for n in rotation if n in seen]
    assert not stale, f"rotating slots already driver-checked: {stale}"
    rows_only = [
        n for n in entrymod.DRIVER_WINDOW if QUERIES[n].oracle is None
    ]
    assert len(rows_only) <= 1, rows_only


def test_rotation_spans_the_llm_pipeline_surface():
    """Every round's window must exercise the LLM-pipeline surface, not
    just relational anchors: >=15 oracle-paired entries from the
    dedup/similarity/text/pipeline/sampling/udf categories."""
    llm_categories = {"dedup", "similarity", "text", "pipeline", "sampling", "udf"}
    llm_oracled = [
        n
        for n in entrymod.DRIVER_WINDOW
        if QUERIES[n].category in llm_categories
        and QUERIES[n].oracle is not None
    ]
    assert len(llm_oracled) >= 15, llm_oracled


def test_oracle_sql_matches_registry():
    osql = entrymod.oracle_sql()
    expected = {n for n, s in QUERIES.items() if s.oracle is not None}
    assert set(osql) == expected
    assert all(isinstance(v, str) and v.strip() for v in osql.values())
