"""Broker-path throughput benchmark (the reference's own benchmark
dimension: msgs/s at 1 KiB per message, docs/benchmarks/README.md).

Separate from bench.py (which times the analytical queries): this
measures the produce and consume data planes end-to-end on local[N].

Reference numbers for context (3x 1-vCPU brokers, EBS):
  - keyed produce  > 250k msgs/s   - unkeyed produce > 1M msgs/s
"""

from __future__ import annotations

import json
import tempfile
import time

from pyspark.sql import functions as F

from barco_spark.session import get_spark
from barco_spark.sources import EventLog

N = 1_000_000


REPS = 3  # best-of-REPS per metric (see steady-state note below)


def main() -> None:
    import sys

    from barco_spark.config import DEFAULT, EngineConfig

    # --tuned: the headroom profile the r8 study measured and the parity
    # benchmark deliberately rejected (SCALING.md round-8): 32 buckets
    # (produce parallelism = bucket count; at cluster scale you raise
    # buckets with the hardware) + zstd level 1 (~17% cheaper chunk
    # compression than the reference's SpeedDefault). The default run
    # keeps the reference's 12-bucket / zstd-3 geometry so the
    # BASELINE.md comparison stays apples-to-apples.
    tuned = "--tuned" in sys.argv[1:]
    config = EngineConfig(brokers=8, zstd_level=1) if tuned else DEFAULT

    spark = get_spark(app_name="barco-throughput")
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "profile": "tuned" if tuned else "parity",
        "buckets": config.buckets,
        "zstd_level": config.zstd_level,
    }

    src_keyed = spark.range(N).select(
        (F.col("id") % 1000).cast("string").alias("partition_key"),
        F.concat(F.lit("x" * 1000), F.col("id").cast("string")).alias("payload"),
    )
    src_keyed.write.format("noop").mode("overwrite").save()  # warm the scan

    # warm the full produce path (columnar-cache build, window codegen,
    # parquet/zstd writer JIT) with one FULL-SIZE throwaway batch, then
    # report the BEST of 3 measured 1M-row produces per metric: the
    # steady-state rate is what a long-running broker delivers, and the
    # ramp is LONG — measured 56k -> 129k -> 216k msgs/s across the
    # first three 1M-row produces on a cold JVM, and a single
    # post-warm run still understates steady state up to ~1.6x
    # (interleaved r8 reps: 771k -> 1025k -> 1086k unkeyed). Best-of-N
    # is the same estimator bench.py's best-of-two run() uses and the
    # standard wall-clock noise treatment (BENCH_PIN methodology).
    warm_log = EventLog(spark, tempfile.mkdtemp() + "/warmlog", config=config)
    warm_log.produce("warm", src_keyed)

    def best(fn) -> int:
        rates = []
        for _ in range(REPS):
            rates.append(fn())
        return round(max(rates))

    src_unkeyed = src_keyed.drop("partition_key")

    def produce_rate(src) -> float:
        log = EventLog(spark, tempfile.mkdtemp() + "/log", config=config)
        t0 = time.perf_counter()
        n = log.produce("t", src)
        return n / (time.perf_counter() - t0)

    out["produce_keyed_msgs_per_s"] = best(lambda: produce_rate(src_keyed))
    # keyless API shape: no partition_key column at all (triggers the
    # zero-shuffle whole-partition fast path)
    out["produce_unkeyed_msgs_per_s"] = best(lambda: produce_rate(src_unkeyed))

    # read path: footer scan + vectorized reader over a fresh log
    read_log = EventLog(spark, tempfile.mkdtemp() + "/readlog", config=config)
    read_log.produce("keyed", src_keyed)
    read_log.poll("gw", "keyed", max_records_per_bucket=10**9, auto_commit=False).count()

    def consume_rate() -> float:
        t0 = time.perf_counter()
        cnt = read_log.poll(
            "g", "keyed", max_records_per_bucket=10**9, auto_commit=False
        ).count()
        return cnt / (time.perf_counter() - t0)

    out["consume_msgs_per_s"] = best(consume_rate)

    out["n_messages"] = N
    out["payload_bytes"] = 1000
    out["reps"] = REPS
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
