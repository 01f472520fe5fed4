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

# --- re-baselining escape hatch (VERDICT r9 item 2) -----------------
# Round 9 ended with NO certifiable window: across seven sittings over
# four hours the shuffle probe ranged 0.41-3.51s against the 0.359 idle
# reference, so every capture was "outside" and the entire round's
# per-query story was mechanically uncertifiable.  If the HOST has
# durably changed (not just a noisy afternoon), the old band is the
# wrong yardstick forever.  The rule, applied by rebased_reference():
# adopt a NEW reference only when the newest >=3 sittings that are
# (a) pairwise >=2h apart, (b) ALL outside the old band, and
# (c) mutually consistent (each within CALIB_BAND of their median)
# exist with NO in-band sitting more recent than the oldest of them —
# an intermittent return to the old band means noise, not a shift.
# The median of those sittings becomes the reference and the adopting
# record embeds full provenance.  Sittings come from CALIB_SITTINGS.jsonl,
# which bench.py appends one line to per run (timestamped probes).
SITTINGS_FILE = "CALIB_SITTINGS.jsonl"
REBASE_MIN_SITTINGS = 3
REBASE_MIN_GAP_SEC = 2 * 3600.0


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
        verdict = (rec.get("calib_verdict") or {}).get("verdict")
        if verdict == "outside":
            # an interference-era capture committed WITH its honest
            # "outside" verdict (round 9's case) must never become the
            # band: certifying against an uncertified baseline is
            # circular and silently rebases the band to the noisy
            # host state — skip to the newest CERTIFIED record
            continue
        if int(m.group(1)) >= 9 and verdict != "within":
            # ADVICE r9: every record from r9 on embeds its verdict at
            # capture time, so a missing/"no-reference" verdict on a
            # recent record is a capture-path bug, not a bootstrap case
            # — accepting it would partially reopen the circular-
            # certification hole.  Only pre-r9 records (and the sf0.01
            # pin below) are verdict-less bootstrap references.
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


def load_sittings(repo_dir: str, sf: float | str) -> list[dict]:
    """All recorded calib sittings at ``sf``, time-ordered.  A sitting
    is one bench run's machine probes with a wall-clock timestamp —
    bench.py appends one line per run; lines are independent evidence
    of host state regardless of whether that run's capture was kept."""
    try:
        sf_num = float(sf)
    except (TypeError, ValueError):
        return []
    out: list[dict] = []
    path = os.path.join(repo_dir, SITTINGS_FILE)
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                    if (
                        float(rec.get("sf")) == sf_num
                        and float(rec.get("ts", 0)) > 0
                        and float(rec.get("calib_shuffle_sec", 0)) > 0
                    ):
                        out.append(rec)
                except (json.JSONDecodeError, TypeError, ValueError):
                    continue  # one corrupt line must not void the log
    except OSError:
        return []
    out.sort(key=lambda r: float(r["ts"]))
    return out


def record_sitting(
    repo_dir: str,
    sf: float | str,
    ts: float,
    calib_sec: float | None,
    calib_shuffle_sec: float | None,
    verdict: str | None,
    source: str = "bench",
) -> None:
    """Append one sitting line (best-effort: never fails a bench run).

    ``source`` distinguishes full bench runs ("bench") from standalone
    probes ("probe", scripts/calib_probe.py).  Probe sittings exist
    because of the r10 selection-bias hole: when sittings come ONLY
    from capture attempts that are themselves gated on quiet-looking
    moments, the log is biased toward a consistent mid-range and the
    rebase veto ("no newer in-band sitting") is starved of the in-band
    dips that would fire it.  Cheap probes sample the host state
    BETWEEN captures, so a host that still reaches the old band keeps
    vetoing re-bases — rebased_reference treats all sources equally."""
    rec = {
        "ts": round(float(ts), 1),
        "sf": sf,
        "calib_sec": calib_sec,
        "calib_shuffle_sec": calib_shuffle_sec,
        # verdict vs the OLD committed band at capture time, so the
        # sittings log itself shows when the drift started
        "verdict_vs_committed": verdict,
        "source": source,
    }
    try:
        with open(os.path.join(repo_dir, SITTINGS_FILE), "a") as f:
            f.write(json.dumps(rec, sort_keys=True) + "\n")
    except OSError:
        pass


def rebased_reference(
    repo_dir: str,
    sf: float | str,
    old_reference: dict | None,
    ts_cutoff: float | None = None,
) -> dict | None:
    """The escape hatch: a NEW reference derived from the sittings log
    when the host has durably changed (module docstring has the rule).
    Returns a reference dict (median shuffle calib + provenance) usable
    by certify(), or None when the evidence does not support re-basing
    — a noisy round must keep failing certification rather than
    silently adopt the noise as the new normal.

    ``ts_cutoff``: ignore sittings recorded at or after this timestamp.
    Callers that append sittings as a side effect of the capture they
    are judging (bench_guard --update runs bench.py subprocesses, each
    of which records one) MUST pass the attempt's start time here, so
    the capture's own probes can never become the durable-shift
    evidence that waives the old pin's calib bands. bench.py gets the
    same guarantee by ordering (rebase check BEFORE its own append);
    this parameter gives out-of-process callers the same ordering."""
    old_cs = (old_reference or {}).get("calib_shuffle_sec")
    if not old_cs:
        return None  # nothing to escape from
    sittings = load_sittings(repo_dir, sf)
    if ts_cutoff is not None:
        sittings = [r for r in sittings if float(r["ts"]) < ts_cutoff]
    if not sittings:
        return None

    def outside_old(rec: dict) -> bool:
        return abs(float(rec["calib_shuffle_sec"]) / old_cs - 1.0) > CALIB_BAND

    # newest-first chain of sittings pairwise >=2h apart, stopping at
    # the first in-band sitting: a host that still sometimes reads
    # inside the old band has not durably shifted
    chain: list[dict] = []
    for rec in reversed(sittings):
        if not outside_old(rec):
            break
        if chain and float(chain[-1]["ts"]) - float(rec["ts"]) < REBASE_MIN_GAP_SEC:
            continue
        chain.append(rec)
        if len(chain) == REBASE_MIN_SITTINGS:
            break
    if len(chain) < REBASE_MIN_SITTINGS:
        return None
    values = sorted(float(r["calib_shuffle_sec"]) for r in chain)
    median = values[len(values) // 2]
    if any(abs(v / median - 1.0) > CALIB_BAND for v in values):
        return None  # mutually inconsistent = interference, not a shift
    return {
        "calib_shuffle_sec": round(median, 4),
        "_path": SITTINGS_FILE,
        "rebased": True,
        "rebase_provenance": [
            {
                "ts": float(r["ts"]),
                "calib_shuffle_sec": float(r["calib_shuffle_sec"]),
            }
            for r in reversed(chain)  # chronological in the record
        ],
        "old_reference_calib_shuffle_sec": old_cs,
        "old_reference_file": (old_reference or {}).get("_path"),
    }


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
    out = {
        "verdict": "within" if deviation <= CALIB_BAND else "outside",
        "band": CALIB_BAND,
        "deviation": round(deviation, 4),
        "reference_calib_shuffle_sec": ref_cs,
        "reference_file": (reference or {}).get("_path"),
    }
    if (reference or {}).get("rebased"):
        # a verdict against a re-based reference carries the full
        # provenance so a reader can audit the durable-shift evidence
        # without opening the sittings log
        out["rebased"] = True
        out["rebase_provenance"] = reference.get("rebase_provenance")
        out["old_reference_calib_shuffle_sec"] = reference.get(
            "old_reference_calib_shuffle_sec"
        )
        out["old_reference_file"] = reference.get("old_reference_file")
    return out
