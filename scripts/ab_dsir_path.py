"""ABBA same-JVM A/B: dsir small-corpus double-explode path (A) vs the
single-pass per-(doc,bucket) counts path (B) at the bench SF.

The small/large cutoff (20k docs) was measured before the r12 row-sized
spread; this re-measures it with the spread active on both arms.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from barco_spark.operators.dsir import dsir_importance_weights  # noqa: E402
from barco_spark.registry import load_all  # noqa: E402
from barco_spark.session import free_persistent_rdds, get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = load_all()
    spark = get_spark(app_name="ab-dsir-path")
    spark.sparkContext.setLogLevel("ERROR")

    def run_once(small_max) -> float:
        spark.catalog.clearCache()
        free_persistent_rdds(spark)
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.3)
        t0 = time.perf_counter()
        df = dsir_importance_weights(spark, sf_dir, small_max_docs=small_max)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def bench_q(name: str) -> None:
        spark.catalog.clearCache()
        free_persistent_rdds(spark)
        queries[name].build(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    bench_q("q1_pricing_summary")  # warmup
    res = {"A": [], "B": []}
    for arm in os.environ.get("AB_ORDER", "ABBAABBA"):
        res[arm].append(run_once(None if arm == "A" else 0))
    a, b = res["A"], res["B"]
    print(
        f"dsir: A/small(min {min(a):.3f} reps {[f'{x:.3f}' for x in a]})"
        f"  B/big(min {min(b):.3f} reps {[f'{x:.3f}' for x in b]})",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
