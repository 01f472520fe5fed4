"""Bench a subset of HEADLINE queries with bench.py's exact protocol.

Usage: python scripts/minibench.py <name> [name ...]
Prints one line per query: min-of-2 noop-sink seconds, cold cache,
GC+settle before each run — directly comparable to bench.py output
from the same host state (modulo suite position).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from barco_spark.registry import load_all  # noqa: E402
from barco_spark.session import free_persistent_rdds, get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = load_all()
    spark = get_spark(app_name="minibench")
    spark.sparkContext.setLogLevel("ERROR")

    def run_once(name: str) -> float:
        spark.catalog.clearCache()
        free_persistent_rdds(spark)
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.3)
        t0 = time.perf_counter()
        df = queries[name].build(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run_once("q1_pricing_summary")  # warmup
    for name in names:
        a, b = run_once(name), run_once(name)
        print(f"{name}: min {round(min(a, b), 4)}  runs [{a:.4f}, {b:.4f}]",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
