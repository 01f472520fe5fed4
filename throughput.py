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


def main() -> None:
    spark = get_spark(app_name="barco-throughput")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}

    src_keyed = spark.range(N).select(
        (F.col("id") % 1000).cast("string").alias("partition_key"),
        F.concat(F.lit("x" * 1000), F.col("id").cast("string")).alias("payload"),
    )
    src_keyed.write.format("noop").mode("overwrite").save()  # warm the scan

    # warm the full produce path (columnar-cache build, window codegen,
    # parquet/zstd writer JIT) with one FULL-SIZE throwaway batch: the
    # steady-state rate is what a long-running broker delivers, and the
    # ramp is long — measured 56k -> 129k -> 216k msgs/s across the
    # first three 1M-row produces on a cold JVM, so a small warm batch
    # still understates steady state ~2-3x
    warm_log = EventLog(spark, tempfile.mkdtemp() + "/warmlog")
    warm_log.produce("warm", src_keyed)

    log = EventLog(spark, tempfile.mkdtemp() + "/log")
    t0 = time.perf_counter()
    n = log.produce("keyed", src_keyed)
    out["produce_keyed_msgs_per_s"] = round(n / (time.perf_counter() - t0))

    # keyless API shape: no partition_key column at all (triggers the
    # zero-shuffle whole-partition fast path)
    src_unkeyed = src_keyed.drop("partition_key")
    t0 = time.perf_counter()
    n = log.produce("unkeyed", src_unkeyed)
    out["produce_unkeyed_msgs_per_s"] = round(n / (time.perf_counter() - t0))

    # warm the read path the same way (footer scan + vectorized reader)
    warm_log.poll("gw", "warm", max_records_per_bucket=10**9, auto_commit=False).count()
    t0 = time.perf_counter()
    cnt = log.poll("g", "keyed", max_records_per_bucket=10**9, auto_commit=False).count()
    out["consume_msgs_per_s"] = round(cnt / (time.perf_counter() - t0))

    out["n_messages"] = N
    out["payload_bytes"] = 1000
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
