"""Interleaved A/B of keyed-produce throughput across two checkouts.

Adjudicates the r5 keyed-produce dip (152-180k vs the 207-313k
historical band, SCALING.md facade section): run the EXACT pre-8MB-
row-group commit (a worktree) and the current tree alternately in
fresh JVMs on a provably idle host, so commit effect and machine state
are separable. Each process: full-size warm batch (the cold-JVM ramp
is 56k -> 216k across the first produces), then two measured keyed
produces; calib (the fixed synthetic JVM agg from bench.py) is
measured in-process so every sample carries its own machine reading.

Usage: python scripts/ab_keyed_produce.py <label> (run from the
checkout to measure; the driver script alternates checkouts).
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

from pyspark.sql import functions as F

from barco_spark.session import get_spark
from barco_spark.sources import EventLog

N = 1_000_000


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "run"
    spark = get_spark(app_name=f"ab-{label}")
    spark.sparkContext.setLogLevel("ERROR")

    def calibrate() -> float:
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr(
            "sum((id * 2654435761) % 1000003) AS s"
        ).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    calibrate()
    calib = round(min(calibrate(), calibrate()), 4)

    src = spark.range(N).select(
        (F.col("id") % 1000).cast("string").alias("partition_key"),
        F.concat(F.lit("x" * 1000), F.col("id").cast("string")).alias(
            "payload"
        ),
    )
    src.write.format("noop").mode("overwrite").save()

    warm_log = EventLog(spark, tempfile.mkdtemp() + "/warmlog")
    warm_log.produce("warm", src)

    rates = []
    for i in range(2):
        log = EventLog(spark, tempfile.mkdtemp() + f"/log{i}")
        t0 = time.perf_counter()
        n = log.produce("keyed", src)
        rates.append(round(n / (time.perf_counter() - t0)))

    print(json.dumps({"label": label, "calib": calib, "keyed_rates": rates}))
    spark.stop()


if __name__ == "__main__":
    main()
