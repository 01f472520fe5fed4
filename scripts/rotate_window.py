#!/usr/bin/env python
"""Propose the next round's DRIVER_WINDOW rotation (r11 policy).

Policy (see __spark_entry__.py): CANARY_CORE is fixed; the 40 rotating
slots draw from oracle-paired registry entries with NO driver-oracle
row in any committed CORRECTNESS_r*.json, category-stratified
(round-robin over categories, never-checked first). When the
never-checked pool holds fewer than 40, the remainder recycles to the
least-recently-checked oracle-paired entries (return cycle).

Prints the proposed ROTATION_R{N} list as Python source to paste into
__spark_entry__.py, plus a coverage summary. Read-only: the builder
reviews and commits the new list; tests/test_driver_contract.py then
enforces the invariants (>=60% disjoint, unchecked-first, etc.).

Usage:
    python scripts/rotate_window.py [next_round_number]
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SLOTS = 40


def checked_by_round() -> dict[str, int]:
    """query name -> most recent round with a driver-oracle row."""
    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        digits = "".join(c for c in os.path.basename(path) if c.isdigit())
        if not digits:
            continue
        n = int(digits)
        for name in json.load(open(path)):
            latest[name] = max(latest.get(name, 0), n)
    return latest


def stratified(pool: list[tuple[str, str]], k: int) -> list[str]:
    """Round-robin over categories so one surface can't flood the
    window; within a category, registry order (stable)."""
    by_cat: dict[str, list[str]] = defaultdict(list)
    for name, cat in pool:
        by_cat[cat].append(name)
    out: list[str] = []
    cats = sorted(by_cat)
    while len(out) < k and any(by_cat[c] for c in cats):
        for c in cats:
            if by_cat[c] and len(out) < k:
                out.append(by_cat[c].pop(0))
    return out


def main() -> None:
    import __spark_entry__ as entrymod
    from barco_spark.registry import load_all

    queries = load_all()
    latest = checked_by_round()
    core = set(entrymod.CANARY_CORE)
    current = set(entrymod.DRIVER_WINDOW)

    never = [
        (n, s.category)
        for n, s in queries.items()
        if s.oracle is not None
        and n not in latest
        and n not in core
        and n not in current
    ]
    picks = stratified(never, SLOTS)
    if len(picks) < SLOTS:
        # return cycle: least-recently-checked oracle-paired entries,
        # excluding the core and anything already picked or currently
        # in the window (disjointness)
        stale = sorted(
            (
                (latest[n], n)
                for n, s in queries.items()
                if s.oracle is not None
                and n in latest
                and n not in core
                and n not in picks
                and n not in current
            ),
        )
        picks += [n for _, n in stale[: SLOTS - len(picks)]]

    n_round = (
        int(sys.argv[1])
        if len(sys.argv) > 1
        else max(latest.values(), default=0) + 1
    )
    print(f"# never-driver-checked oracle-paired remaining: {len(never)}")
    print(f"# proposed window overlap with current: "
          f"{len((core | set(picks)) & current)}/50")
    print(f"ROTATION_R{n_round}: list[str] = [")
    for n in picks:
        print(f'    "{n}",')
    print("]")


if __name__ == "__main__":
    main()
