"""Idle-band certifiability: ONE shared definition of the calibration
band for bench.py, scripts/bench_guard.py, and every committed record.

Why this exists (VERDICT r8 item 5): the host's throughput drifts with
invisible co-tenant interference, so every bench run carries two
machine probes — ``calib_sec`` (pure arithmetic) and
``calib_shuffle_sec`` (exchange-bearing, sees I/O-side interference the
CPU loop is blind to). A run whose shuffle probe sits outside
``CALIB_BAND`` of the committed idle capture's probe CANNOT certify
per-query timings either way — its regressions and its wins are both
host artifacts. Round 8's driver capture was exactly this case (calib
42% above the idle band) and the judge had to re-derive the rule by
hand; now every bench JSON line carries the verdict precomputed,
against the same band the guard enforces.
"""

from __future__ import annotations

import glob
import json
import os
import re

# max fractional deviation of calib_shuffle_sec from the committed idle
# capture for a run to be certifiable (bench_guard has enforced 25%
# since r8; measured idle-vs-idle repeatability is well inside it)
CALIB_BAND = 0.25


def idle_reference(
    repo_dir: str, sf: float | str, exclude: str | None = None
) -> dict | None:
    """The committed idle record whose calibs define the band at ``sf``:
    the newest ``BENCH_LOCAL_r{N}.json`` with a matching ``sf`` field
    and a shuffle probe, else (sf0.01 only) the bench-guard pin.
    ``exclude`` names a basename to skip — bench.py passes its OWN
    output target so a re-capture never certifies itself against the
    uncommitted file it is about to overwrite (the band must come from
    a PRIOR round's record). Returns the parsed record with ``_path``
    set, or None when nothing committed matches."""
    try:
        sf_num = float(sf)
    except (TypeError, ValueError):
        return None
    best_n, best_rec = -1, None
    for path in glob.glob(os.path.join(repo_dir, "BENCH_LOCAL_r*.json")):
        m = re.search(r"BENCH_LOCAL_r(\d+)\.json$", path)
        if not m or int(m.group(1)) <= best_n:
            continue
        if exclude and os.path.basename(path) == exclude:
            continue
        try:
            with open(path) as f:
                rec = json.load(f)
            rec_sf = float(rec.get("sf"))
        except (OSError, json.JSONDecodeError, TypeError, ValueError):
            continue  # unreadable or non-numeric sf: never crash a
            # bench run after its queries already ran
        if rec_sf != sf_num or not rec.get("calib_shuffle_sec"):
            # a record without the shuffle probe (pre-r8 captures)
            # cannot define the band — keep looking at older rounds
            continue
        if (rec.get("calib_verdict") or {}).get("verdict") == "outside":
            # an interference-era capture committed WITH its honest
            # "outside" verdict (round 9's case) must never become the
            # band: certifying against an uncertified baseline is
            # circular and silently rebases the band to the noisy
            # host state — skip to the newest CERTIFIED record
            continue
        best_n, best_rec = int(m.group(1)), rec
        best_rec["_path"] = os.path.basename(path)
    if best_rec is not None:
        return best_rec
    if sf_num == 0.01:
        pin = os.path.join(repo_dir, "BENCH_PIN_sf0.01.json")
        try:
            with open(pin) as f:
                rec = json.load(f)
        except (OSError, json.JSONDecodeError):
            return None
        rec["_path"] = os.path.basename(pin)
        return rec
    return None


def certify(calib_shuffle_sec: float | None, reference: dict | None) -> dict:
    """One-line certifiability verdict for a bench capture.

    Returns a dict safe to embed in the bench JSON line:
    ``verdict`` is ``"within"`` (timings certifiable), ``"outside"``
    (host interference — per-query numbers cannot certify regressions
    OR wins), or ``"no-reference"`` (nothing committed to compare
    against at this SF)."""
    ref_cs = (reference or {}).get("calib_shuffle_sec")
    if not ref_cs or not calib_shuffle_sec:
        return {"verdict": "no-reference", "band": CALIB_BAND}
    deviation = abs(calib_shuffle_sec / ref_cs - 1.0)
    return {
        "verdict": "within" if deviation <= CALIB_BAND else "outside",
        "band": CALIB_BAND,
        "deviation": round(deviation, 4),
        "reference_calib_shuffle_sec": ref_cs,
        "reference_file": (reference or {}).get("_path"),
    }
