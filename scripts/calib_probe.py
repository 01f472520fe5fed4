#!/usr/bin/env python
"""Standalone calib probe: measure both machine probes in a fresh JVM
and append ONE sitting line (source "probe") to CALIB_SITTINGS.jsonl.

Why this exists (r10 saga, SCALING.md round-10 postscript): the rebase
escape hatch's veto — "no in-band sitting newer than the evidence
chain" — only works if sittings actually sample the host between
capture attempts.  When the log contains only bench runs, and capture
attempts are themselves gated on quiet-looking moments, the evidence
stream is selection-biased toward a consistent mid-range and a
legitimate-looking (but wrong) durable-shift chain can assemble while
the host demonstrably still dips into the old band for minutes at a
time.  Run this between capture attempts (it costs ~20 s) so those
dips enter the record and veto premature re-bases.

Usage:
    python scripts/calib_probe.py            # probe at sf0.1 geometry
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python scripts/calib_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from barco_spark.calib import certify, idle_reference, record_sitting
    from barco_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    spark = get_spark(app_name="calib-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def calibrate() -> float:
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr(
            "sum((id * 2654435761) % 1000003) AS s"
        ).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def calibrate_shuffle() -> float:
        t0 = time.perf_counter()
        spark.range(20_000_000).selectExpr(
            "(id * 2654435761) % 65536 AS k", "id AS v"
        ).groupBy("k").sum("v").write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    calibrate_shuffle()  # JVM/codegen warmup, same as bench.py's q1 pass
    calib = round(min(calibrate(), calibrate()), 4)
    calib_shuffle = round(min(calibrate_shuffle(), calibrate_shuffle()), 4)
    verdict = certify(calib_shuffle, idle_reference(REPO, sf_val))["verdict"]
    record_sitting(
        REPO, sf_val, time.time(), calib, calib_shuffle, verdict, source="probe"
    )
    print(
        json.dumps(
            {
                "sf": sf_val,
                "calib_sec": calib,
                "calib_shuffle_sec": calib_shuffle,
                "verdict_vs_committed": verdict,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
