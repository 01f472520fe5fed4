#!/usr/bin/env python
"""Standalone fresh-JVM adjudicator for a single bench query
(VERDICT r8 item 2 — the r5 keyed-dip methodology).

Runs ONE registry query in its own process exactly as bench.py would
(same session factory, warmup, cache hygiene, best-of-two), capturing
both calib probes in the SAME process, and prints one JSON line.
Interleave invocations to separate host-state interference from real
plan cost: a query time that swings while calib_shuffle_sec swings with
it is interference; a stable time at stable calibs is the plan.

Usage:
    python scripts/adjudicate_query.py ann_ivfpq_search   # one run
    for i in 1 2 3; do python scripts/adjudicate_query.py q; done
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    name = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from barco_spark.registry import load_all
    from barco_spark.session import free_persistent_rdds, get_spark

    queries = load_all()
    spark = get_spark(app_name=f"adjudicate-{name}")
    spark.sparkContext.setLogLevel("ERROR")

    def run_once(qname: str) -> float:
        spark.catalog.clearCache()
        free_persistent_rdds(spark)
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.3)
        t0 = time.perf_counter()
        df = queries[qname].build(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

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

    run_once("q1_pricing_summary")  # executor/codegen warmup, like bench.py
    calib = round(min(calibrate(), calibrate()), 4)
    calib_shuffle = round(min(calibrate_shuffle(), calibrate_shuffle()), 4)
    t_first = round(run_once(name), 4)
    t_second = round(run_once(name), 4)
    print(json.dumps({
        "query": name,
        "sf_dir": sf_dir,
        "best": min(t_first, t_second),
        "runs": [t_first, t_second],
        "calib_sec": calib,
        "calib_shuffle_sec": calib_shuffle,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
