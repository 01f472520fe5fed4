#!/usr/bin/env python
"""Bench regression guard (VERDICT r3 item 6).

Runs bench.py at sf0.01 and compares per-query wall times against the
committed pin (BENCH_PIN_sf0.01.json). Fails (exit 1) when any query is
slower than ``max(1.5x pin, pin + 0.35 s)`` — the absolute floor keeps
sub-100ms queries from tripping the guard on scheduler noise — or when a
pinned query goes DNF.

Usage:
    python scripts/bench_guard.py            # check against the pin
    python scripts/bench_guard.py --update   # re-capture the pin
    python scripts/bench_guard.py --pin BENCH_LOCAL_r07.json
        # compare against a committed per-query record instead (set
        # BENCH_GUARD_SF_DIR to the record's SF, e.g. /root/testdata/sf0.1)

The pin should only be refreshed on an otherwise-idle machine (`--update`
while a pytest run is live bakes contention into the baseline and makes
every future check too lax).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PIN_PATH = os.path.join(REPO, "BENCH_PIN_sf0.01.json")
SF_DIR = os.environ.get("BENCH_GUARD_SF_DIR", "/root/testdata/sf0.01")
TOL_RATIO = 1.5
TOL_ABS = 0.35  # seconds; noise floor for fast queries


def run_bench() -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF_DIR)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
    )
    # bench.py prints the full per-query JSON line, then a compact
    # truncation-proof summary line (no "queries"); take the last line
    # that parses AND carries per-query timings.
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            parsed = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "queries" in parsed:
            return parsed
    print(proc.stdout[-2000:], file=sys.stderr)
    print(proc.stderr[-2000:], file=sys.stderr)
    raise SystemExit("bench.py produced no JSON line")


def main() -> int:
    args = sys.argv[1:]
    update = "--update" in args
    pin_path = PIN_PATH
    if "--pin" in args:
        # compare against an arbitrary committed per-query record
        # (BENCH_LOCAL_r{N}.json) — same "queries" map as the pin
        pin_path = os.path.join(REPO, args[args.index("--pin") + 1])
    result = run_bench()
    timings: dict[str, float] = result["queries"]

    if update:
        pin = {
            "sf": result["sf"],
            "queries": timings,
            "total": result["value"],
        }
        with open(PIN_PATH, "w") as f:
            json.dump(pin, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"pinned {len(timings)} queries to {PIN_PATH}")
        return 0

    if not os.path.exists(pin_path):
        raise SystemExit(f"no pin at {pin_path}; run with --update first")
    with open(pin_path) as f:
        pin = json.load(f)

    # Environment normalization: the guard exists to catch PER-QUERY
    # regressions caused by code changes, not uniform machine drift
    # (shared host, noisy neighbors). The median current/pin ratio over
    # all pinned queries estimates the drift — code changes move a few
    # queries, drift moves all of them, so the median isolates it.
    # Limits scale by the drift (never below 1.0 so a uniformly FASTER
    # machine cannot mask a real regression).
    ratios = sorted(
        timings[n] / b
        for n, b in pin["queries"].items()
        if n in timings and b > 0
    )
    drift = ratios[len(ratios) // 2] if ratios else 1.0
    scale = max(1.0, drift)
    print(f"machine drift vs pin (median ratio): {drift:.2f}x -> limits x{scale:.2f}")

    regressions: list[str] = []
    for name, base in sorted(pin["queries"].items()):
        cur = timings.get(name)
        if cur is None:
            regressions.append(f"{name}: DNF (pinned at {base:.3f}s)")
            continue
        limit = max(base * scale * TOL_RATIO, base * scale + TOL_ABS)
        status = "FAIL" if cur > limit else "ok"
        print(f"{status:4s} {name:35s} {cur:7.3f}s  pin {base:7.3f}s  limit {limit:7.3f}s")
        if cur > limit:
            regressions.append(
                f"{name}: {cur:.3f}s > limit {limit:.3f}s (pin {base:.3f}s, drift x{drift:.2f})"
            )
    new = sorted(set(timings) - set(pin["queries"]))
    if new:
        print(f"note: {len(new)} unpinned queries (run --update to pin): {new}")

    if regressions:
        print("\nBENCH GUARD FAILED:")
        for r in regressions:
            print("  " + r)
        return 1
    print(f"\nbench guard ok: {len(pin['queries'])} queries within tolerance")
    return 0


if __name__ == "__main__":
    sys.exit(main())
