"""bench_guard logic: the per-query regression check, the calib-v2
interference flag, and the --update refresh sanity gate. Pure-function
tests — no Spark, no bench run."""

from __future__ import annotations

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "bench_guard",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "bench_guard.py"),
)
bg = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bg)


def _pin(queries, calib=0.20, calib_shuffle=0.40):
    return {
        "sf": 0.01,
        "queries": queries,
        "calib_sec": calib,
        "calib_shuffle_sec": calib_shuffle,
    }


def test_evaluate_passes_within_tolerance():
    pin = _pin({"q1": 1.0, "q2": 0.1})
    assert bg.evaluate({"q1": 1.2, "q2": 0.3}, pin) == []


def test_evaluate_flags_single_query_regression():
    # uniform-drift normalization: median ratio ~1.0, q2 regressed 4x
    pin = _pin({"q1": 1.0, "q2": 1.0, "q3": 1.0})
    out = bg.evaluate({"q1": 1.0, "q2": 4.0, "q3": 1.05}, pin)
    assert len(out) == 1 and out[0].startswith("q2:")


def test_evaluate_normalizes_uniform_machine_drift():
    # everything 1.8x slower = drift, not regression
    pin = _pin({f"q{i}": 1.0 for i in range(5)})
    cur = {f"q{i}": 1.8 for i in range(5)}
    assert bg.evaluate(cur, pin) == []


def test_evaluate_dnf_is_a_regression():
    pin = _pin({"q1": 1.0, "q2": 1.0})
    out = bg.evaluate({"q1": 1.0}, pin)
    assert out and "DNF" in out[0]


def test_calib_flag_rejects_slow_shuffle_record():
    """VERDICT r8 item 4's synthetic slow-shuffle record: per-query
    times look fine, but the exchange-bearing calib probe ran 60%
    slower than the pin's idle band — the run must be refused as
    not-certifiable, not passed (or failed) on contaminated numbers."""
    pin = _pin({"q1": 1.0})
    slow_shuffle_run = {
        "queries": {"q1": 1.1},
        "calib_sec": 0.20,  # arithmetic probe blind to I/O interference
        "calib_shuffle_sec": 0.64,  # 1.6x the pin's 0.40
    }
    flag = bg.calib_flag(slow_shuffle_run, pin)
    assert flag is not None and "cannot certify" in flag


def test_calib_flag_accepts_idle_band():
    pin = _pin({"q1": 1.0})
    ok_run = {"queries": {"q1": 1.1}, "calib_sec": 0.21,
              "calib_shuffle_sec": 0.45}
    assert bg.calib_flag(ok_run, pin) is None


def test_refresh_rejects_entry_exceeding_sf01_time():
    """A pin candidate whose sf0.01 entry is SLOWER than the committed
    sf0.1 capture of the same query is physically implausible (10x the
    data) — the r7 contamination class, now rejected mechanically."""
    result = {
        # kmeans at 2.9x its sf0.1 time = the r7 contamination class;
        # "flat" at 1.3x = a scale-flat query under normal cross-record
        # noise, which must NOT be rejected
        "queries": {"kmeans": 2.73, "flat": 0.40, "fast": 0.10},
        "calib_sec": 0.20,
        "calib_shuffle_sec": 0.40,
    }
    sf01 = {"sf": 0.1, "queries": {"kmeans": 0.93, "flat": 0.30,
                                   "fast": 0.30},
            "_path": "BENCH_LOCAL_r07.json"}
    reasons = bg.refresh_rejections(result, None, sf01)
    assert len(reasons) == 1 and reasons[0].startswith("kmeans:")


def test_refresh_rejects_calib_outside_idle_band():
    result = {
        "queries": {"q": 0.5},
        "calib_sec": 0.30,  # 1.5x the old pin's 0.20
        "calib_shuffle_sec": 0.41,
    }
    old_pin = _pin({"q": 0.5})
    reasons = bg.refresh_rejections(result, old_pin, None)
    assert len(reasons) == 1 and "calib_sec" in reasons[0]


def test_refresh_accepts_clean_capture():
    result = {
        "queries": {"q": 0.5, "r": 0.2},
        "calib_sec": 0.21,
        "calib_shuffle_sec": 0.43,
    }
    old_pin = _pin({"q": 0.6, "r": 0.25})
    sf01 = {"sf": 0.1, "queries": {"q": 2.0, "r": 0.8},
            "_path": "BENCH_LOCAL_r07.json"}
    assert bg.refresh_rejections(result, old_pin, sf01) == []


# -- shared calib band (barco_spark/calib.py) --------------------------

def test_certify_shares_the_guard_band():
    """bench.py's calib_verdict and the guard enforce ONE band
    definition — the constant lives in barco_spark.calib and the guard
    imports it."""
    from barco_spark import calib

    assert bg.CALIB_BAND is calib.CALIB_BAND


def test_certify_within_and_outside():
    from barco_spark.calib import CALIB_BAND, certify

    ref = {"calib_shuffle_sec": 0.40, "_path": "BENCH_LOCAL_r08.json"}
    v = certify(0.40 * (1 + CALIB_BAND) - 0.001, ref)
    assert v["verdict"] == "within"
    v = certify(0.40 * (1 + CALIB_BAND) + 0.01, ref)
    assert v["verdict"] == "outside"
    assert v["reference_file"] == "BENCH_LOCAL_r08.json"
    # a 42%-out capture (the r8 driver case) must read outside
    assert certify(0.5105, {"calib_shuffle_sec": 0.3589})["verdict"] == "outside"
    # symmetric: a suspiciously FAST probe is just as uncertifiable
    assert certify(0.20, ref)["verdict"] == "outside"
    assert certify(None, ref)["verdict"] == "no-reference"
    assert certify(0.40, None)["verdict"] == "no-reference"
    assert certify(0.40, {"calib_shuffle_sec": None})["verdict"] == "no-reference"


def test_idle_reference_picks_newest_matching_sf(tmp_path):
    import json

    from barco_spark.calib import idle_reference

    (tmp_path / "BENCH_LOCAL_r07.json").write_text(
        json.dumps({"sf": 0.1, "calib_shuffle_sec": 0.50})
    )
    (tmp_path / "BENCH_LOCAL_r08.json").write_text(
        json.dumps({"sf": 0.1, "calib_shuffle_sec": 0.36})
    )
    (tmp_path / "BENCH_PIN_sf0.01.json").write_text(
        json.dumps({"sf": 0.01, "calib_shuffle_sec": 0.30})
    )
    ref = idle_reference(str(tmp_path), 0.1)
    assert ref["_path"] == "BENCH_LOCAL_r08.json"
    assert ref["calib_shuffle_sec"] == 0.36
    # a newer record WITHOUT the shuffle probe (pre-r8 capture shape)
    # cannot define the band — fall back to the newest one that can
    (tmp_path / "BENCH_LOCAL_r09.json").write_text(json.dumps({"sf": 0.1}))
    ref = idle_reference(str(tmp_path), 0.1)
    assert ref["_path"] == "BENCH_LOCAL_r08.json"
    # a record with a non-numeric sf must be skipped, never crash
    (tmp_path / "BENCH_LOCAL_r10.json").write_text(
        json.dumps({"sf": "0.1-retry", "calib_shuffle_sec": 0.5})
    )
    assert idle_reference(str(tmp_path), 0.1)["_path"] == "BENCH_LOCAL_r08.json"
    # sf0.01 has no BENCH_LOCAL record here -> falls back to the pin
    ref = idle_reference(str(tmp_path), 0.01)
    assert ref["_path"] == "BENCH_PIN_sf0.01.json"
    # unknown SF -> no reference
    assert idle_reference(str(tmp_path), 0.001) is None
    assert idle_reference(str(tmp_path), "weird") is None


def test_idle_reference_excludes_own_output_target(tmp_path):
    """A re-capture must never certify against the uncommitted file it
    is about to overwrite — exclude drops it so the band comes from a
    prior round's record."""
    import json

    from barco_spark.calib import idle_reference

    (tmp_path / "BENCH_LOCAL_r08.json").write_text(
        json.dumps({"sf": 0.1, "calib_shuffle_sec": 0.36})
    )
    (tmp_path / "BENCH_LOCAL_r09.json").write_text(
        json.dumps(
            {
                "sf": 0.1,
                "calib_shuffle_sec": 0.50,
                # r>=9 records must embed a "within" verdict to define
                # the band (ADVICE r9 fix, tested separately below)
                "calib_verdict": {"verdict": "within", "band": 0.25},
            }
        )
    )
    ref = idle_reference(str(tmp_path), 0.1, exclude="BENCH_LOCAL_r09.json")
    assert ref["_path"] == "BENCH_LOCAL_r08.json"
    # without exclude the newest wins (the committed-history behavior)
    assert idle_reference(str(tmp_path), 0.1)["_path"] == "BENCH_LOCAL_r09.json"


def test_idle_reference_skips_uncertified_records(tmp_path):
    """A record committed WITH an embedded "outside" verdict (an
    interference-era capture kept for honesty, round 9's case) must
    never define the band — certifying against an uncertified baseline
    is circular and would silently rebase the band to the noisy host
    state. The newest CERTIFIED record wins instead."""
    import json

    from barco_spark.calib import idle_reference

    (tmp_path / "BENCH_LOCAL_r08.json").write_text(
        json.dumps({"sf": 0.1, "calib_shuffle_sec": 0.36})
    )
    (tmp_path / "BENCH_LOCAL_r09.json").write_text(
        json.dumps(
            {
                "sf": 0.1,
                "calib_shuffle_sec": 0.60,
                "calib_verdict": {"verdict": "outside", "band": 0.25},
            }
        )
    )
    ref = idle_reference(str(tmp_path), 0.1)
    assert ref["_path"] == "BENCH_LOCAL_r08.json"
    assert ref["calib_shuffle_sec"] == 0.36
    # a record whose embedded verdict is "within" DOES define the band
    (tmp_path / "BENCH_LOCAL_r10.json").write_text(
        json.dumps(
            {
                "sf": 0.1,
                "calib_shuffle_sec": 0.37,
                "calib_verdict": {"verdict": "within", "band": 0.25},
            }
        )
    )
    assert idle_reference(str(tmp_path), 0.1)["_path"] == "BENCH_LOCAL_r10.json"


def test_idle_reference_requires_embedded_verdict_from_r9_on(tmp_path):
    """ADVICE r9: every capture from r9 on embeds its verdict at write
    time, so a recent record WITHOUT one (or with "no-reference") is a
    capture-path bug — letting it define the band would partially
    reopen the circular-certification hole. Pre-r9 records stay
    verdict-less bootstrap references."""
    import json

    from barco_spark.calib import idle_reference

    (tmp_path / "BENCH_LOCAL_r08.json").write_text(
        json.dumps({"sf": 0.1, "calib_shuffle_sec": 0.36})
    )
    # newer, but no embedded verdict -> rejected
    (tmp_path / "BENCH_LOCAL_r11.json").write_text(
        json.dumps({"sf": 0.1, "calib_shuffle_sec": 0.80})
    )
    # newer, but "no-reference" verdict -> rejected
    (tmp_path / "BENCH_LOCAL_r12.json").write_text(
        json.dumps(
            {
                "sf": 0.1,
                "calib_shuffle_sec": 0.90,
                "calib_verdict": {"verdict": "no-reference"},
            }
        )
    )
    ref = idle_reference(str(tmp_path), 0.1)
    assert ref["_path"] == "BENCH_LOCAL_r08.json"


# -- re-baselining escape hatch (VERDICT r9 item 2) ---------------------


def _sittings(tmp_path, rows):
    import json

    from barco_spark.calib import SITTINGS_FILE

    lines = [
        json.dumps(
            {
                "ts": ts,
                "sf": 0.1,
                "calib_sec": 0.2,
                "calib_shuffle_sec": cs,
                "verdict_vs_committed": v,
            }
        )
        for ts, cs, v in rows
    ]
    (tmp_path / SITTINGS_FILE).write_text("\n".join(lines) + "\n")


OLD_REF = {"calib_shuffle_sec": 0.36, "_path": "BENCH_LOCAL_r08.json"}
H = 3600.0


def test_rebase_accepts_a_durable_shift(tmp_path):
    """Three sittings >=2h apart, all outside the old band, mutually
    within CALIB_BAND of their median, none followed by an in-band
    reading -> the median becomes the new reference with provenance."""
    from barco_spark.calib import certify, rebased_reference

    _sittings(
        tmp_path,
        [
            (0.0, 0.35, "within"),  # the old idle world
            (10 * H, 0.78, "outside"),  # shift begins
            (12.5 * H, 0.82, "outside"),
            (15 * H, 0.76, "outside"),
        ],
    )
    ref = rebased_reference(str(tmp_path), 0.1, OLD_REF)
    assert ref is not None
    assert ref["rebased"] is True
    assert ref["calib_shuffle_sec"] == 0.78  # median of 0.76/0.78/0.82
    assert [p["calib_shuffle_sec"] for p in ref["rebase_provenance"]] == [
        0.78,
        0.82,
        0.76,
    ]
    assert ref["old_reference_file"] == "BENCH_LOCAL_r08.json"
    # a capture in the new world certifies against it, with provenance
    verdict = certify(0.80, ref)
    assert verdict["verdict"] == "within"
    assert verdict["rebased"] is True
    assert verdict["old_reference_calib_shuffle_sec"] == 0.36


def test_rebase_rejects_a_noisy_round(tmp_path):
    """Sittings outside the old band but mutually INCONSISTENT (the r9
    case: 0.41-3.51s across one afternoon) must NOT re-base — noise is
    not a durable host shift."""
    from barco_spark.calib import rebased_reference

    _sittings(
        tmp_path,
        [
            (10 * H, 0.48, "outside"),
            (12.5 * H, 3.51, "outside"),
            (15 * H, 0.95, "outside"),
        ],
    )
    assert rebased_reference(str(tmp_path), 0.1, OLD_REF) is None


def test_rebase_rejects_intermittent_return_to_band(tmp_path):
    """An in-band sitting NEWER than the would-be evidence chain breaks
    it: the host still sometimes reads idle, so the old band is still
    the right yardstick."""
    from barco_spark.calib import rebased_reference

    _sittings(
        tmp_path,
        [
            (10 * H, 0.78, "outside"),
            (12.5 * H, 0.80, "outside"),
            (15 * H, 0.79, "outside"),
            (16 * H, 0.37, "within"),  # back inside the old band
        ],
    )
    assert rebased_reference(str(tmp_path), 0.1, OLD_REF) is None


def test_rebase_rejects_sittings_closer_than_two_hours(tmp_path):
    """Three outside readings within one hour are one sitting, not
    three — the gap rule requires the shift to persist across hours."""
    from barco_spark.calib import rebased_reference

    _sittings(
        tmp_path,
        [
            (10 * H, 0.78, "outside"),
            (10.4 * H, 0.80, "outside"),
            (10.8 * H, 0.79, "outside"),
        ],
    )
    assert rebased_reference(str(tmp_path), 0.1, OLD_REF) is None


def test_rebase_needs_an_old_reference_and_a_log(tmp_path):
    from barco_spark.calib import rebased_reference

    assert rebased_reference(str(tmp_path), 0.1, OLD_REF) is None  # no log
    _sittings(tmp_path, [(10 * H, 0.78, "outside")])
    assert rebased_reference(str(tmp_path), 0.1, None) is None  # no old ref
    assert rebased_reference(str(tmp_path), 0.1, OLD_REF) is None  # 1 sitting


def test_refresh_waives_calib_bands_on_certified_durable_shift(
    tmp_path, monkeypatch, capsys
):
    """The calib-v3 hatch applies to the pin refresh too: when the
    sittings log certifies a durable host shift, the old pin's calib
    bands are obsolete as a whole and must not block the refresh
    forever (the refresh records the new calibs in the new pin)."""
    import json

    monkeypatch.setattr(bg, "REPO", str(tmp_path))
    _sittings(
        tmp_path,
        [(10 * H, 0.78, "outside"), (12.5 * H, 0.82, "outside"),
         (15 * H, 0.76, "outside")],
    )
    # sittings helper writes sf=0.1 rows; the refresh capture must match
    lines = [
        json.loads(line) for line in
        (tmp_path / "CALIB_SITTINGS.jsonl").read_text().splitlines()
    ]
    result = {
        "sf": 0.1,
        "queries": {"q": 0.5},
        "calib_sec": 0.44,  # 2x the old pin: would reject without the hatch
        "calib_shuffle_sec": 0.80,  # within band of the rebased 0.78
    }
    old_pin = {"sf": 0.1, "queries": {"q": 0.5}, "calib_sec": 0.20,
               "calib_shuffle_sec": 0.36}
    assert bg.refresh_rejections(result, old_pin, None) == []
    assert "durable host shift" in capsys.readouterr().out
    # same capture, but the log is the r9 NOISE profile -> both
    # rejections stand
    _sittings(
        tmp_path,
        [(10 * H, 0.48, "outside"), (12.5 * H, 3.51, "outside"),
         (15 * H, 0.95, "outside")],
    )
    reasons = bg.refresh_rejections(result, old_pin, None)
    assert len(reasons) == 2 and all("calib" in r for r in reasons)


def test_rebase_vetoed_by_probe_source_sittings(tmp_path):
    """The r10 selection-bias fix: sittings from scripts/calib_probe.py
    (source "probe") count as veto evidence exactly like bench runs —
    an in-band probe dip newer than the would-be chain kills the
    re-base even when every CAPTURE sitting reads outside."""
    import json

    from barco_spark.calib import SITTINGS_FILE, rebased_reference

    lines = [
        {"ts": 10 * H, "sf": 0.1, "calib_shuffle_sec": 0.66,
         "verdict_vs_committed": "outside", "source": "bench"},
        {"ts": 12.5 * H, "sf": 0.1, "calib_shuffle_sec": 0.65,
         "verdict_vs_committed": "outside", "source": "bench"},
        # a cheap probe BETWEEN capture attempts catches the host
        # dipping back into the old band
        {"ts": 13 * H, "sf": 0.1, "calib_shuffle_sec": 0.37,
         "verdict_vs_committed": "within", "source": "probe"},
        {"ts": 15 * H, "sf": 0.1, "calib_shuffle_sec": 0.64,
         "verdict_vs_committed": "outside", "source": "bench"},
    ]
    (tmp_path / SITTINGS_FILE).write_text(
        "\n".join(json.dumps(r) for r in lines) + "\n"
    )
    assert rebased_reference(str(tmp_path), 0.1, OLD_REF) is None
    # without the probe line the same log WOULD re-base — proving the
    # probe is the decisive evidence
    (tmp_path / SITTINGS_FILE).write_text(
        "\n".join(json.dumps(r) for r in lines if r["source"] == "bench")
        + "\n"
    )
    ref = rebased_reference(str(tmp_path), 0.1, OLD_REF)
    assert ref is not None and ref["calib_shuffle_sec"] == 0.65


def test_rebase_ts_cutoff_fences_out_self_evidence(tmp_path):
    """The r11 fix for bench_guard --update's self-evidence hole: the
    capture's own run_bench() subprocesses each append a sitting BEFORE
    refresh_rejections consults rebased_reference, so without a fence
    the attempt's own probes can complete (or re-median) the
    durable-shift chain that waives the old pin's calib bands.
    Passing ts_cutoff = attempt start time excludes them — mirroring
    bench.py's check-before-append ordering."""
    _sittings(
        tmp_path,
        [
            (0.0, 0.35, "within"),
            (10 * H, 0.78, "outside"),
            (12.5 * H, 0.80, "outside"),
            # the --update attempt starts at 20h; its three bench
            # subprocesses appended these:
            (20 * H, 0.79, "outside"),
            (20.2 * H, 0.81, "outside"),
        ],
    )
    from barco_spark.calib import rebased_reference

    # unfenced, the attempt's own sittings complete the 3-element chain
    assert rebased_reference(str(tmp_path), 0.1, OLD_REF) is not None
    # fenced at the attempt start, only 2 admissible sittings remain ->
    # no re-base; the calib-band rejections stand
    assert (
        rebased_reference(str(tmp_path), 0.1, OLD_REF, ts_cutoff=20 * H)
        is None
    )


def test_refresh_rejections_passes_cutoff_through(tmp_path, monkeypatch):
    """refresh_rejections(ts_cutoff=...) must actually thread the fence
    into rebased_reference: with the fence, the calib-outside-band
    rejection stands even when post-cutoff self-sittings would have
    certified a durable shift."""
    import scripts.bench_guard as bg
    from barco_spark.calib import SITTINGS_FILE  # noqa: F401

    _sittings(
        tmp_path,
        [
            (10 * H, 0.78, "outside"),
            (12.5 * H, 0.80, "outside"),
            (20 * H, 0.79, "outside"),  # the attempt's own probe
        ],
    )
    monkeypatch.setattr(bg, "REPO", str(tmp_path))
    result = {"sf": 0.1, "queries": {}, "calib_sec": 0.3,
              "calib_shuffle_sec": 0.79}
    old_pin = {"calib_sec": 0.2, "calib_shuffle_sec": 0.36, "queries": {}}
    # unfenced: the self-sitting completes the chain and waives the band
    assert bg.refresh_rejections(result, old_pin, None) == []
    # fenced at the attempt start: rejection stands
    reasons = bg.refresh_rejections(
        result, old_pin, None, ts_cutoff=20 * H
    )
    assert any("calib_shuffle_sec" in r for r in reasons)


def test_rotate_window_proposal_is_policy_compliant():
    """scripts/rotate_window.py must propose exactly 40 oracle-paired
    registry names, none from the canary core, category-stratified
    (no single category floods the list), and all previously
    driver-unchecked while the never-checked pool lasts."""
    import re
    import subprocess
    import sys

    import __spark_entry__ as entrymod
    from barco_spark.registry import load_all

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "scripts/rotate_window.py", "99"],
        capture_output=True,
        text=True,
        cwd=repo,
    ).stdout
    names = re.findall(r'^\s+"([a-z0-9_]+)",$', out, re.M)
    queries = load_all()
    assert len(names) == 40 and len(set(names)) == 40
    assert not set(names) & set(entrymod.CANARY_CORE)
    assert all(queries[n].oracle is not None for n in names)
    # stratified: with >=8 eligible categories no category may flood
    from collections import Counter

    cats = Counter(queries[n].category for n in names)
    assert max(cats.values()) <= 40 - len(cats) + 1
    assert len(cats) >= 5


def test_rotate_window_stratified_round_robins():
    import scripts.rotate_window as rw

    pool = [("a1", "x"), ("a2", "x"), ("a3", "x"), ("b1", "y"), ("c1", "z")]
    # one pick per category before any category repeats
    assert rw.stratified(pool, 3) == ["a1", "b1", "c1"]
    assert rw.stratified(pool, 5) == ["a1", "b1", "c1", "a2", "a3"]
