"""ABBA same-JVM A/B: row-sized spread under dedup_incremental's
fingerprint folds (B) vs the plain 1-split scan (A).

The profile showed the two dominant stages are SINGLE-TASK md5+minhash
fingerprint folds (1.37 s + 0.76 s warm) — the same narrow-scan
pathology spread_rows fixed for the LSH family.  A is forced by
monkeypatching tables.spread_rows to identity INSIDE dedup only
(driver-side plan building, so the patch is valid).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from barco_spark import tables  # noqa: E402
from barco_spark.registry import load_all  # noqa: E402
from barco_spark.session import free_persistent_rdds, get_spark  # noqa: E402

REAL = tables.spread_rows


def identity(df, spark, sf_dir, key, name="documents", rows_per_task=600):
    return df


def main() -> None:
    names = sys.argv[1:] or ["dedup_incremental"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = load_all()
    spark = get_spark(app_name="ab-incr-spread")
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
        res = {"A": [], "B": []}
        for arm in os.environ.get("AB_ORDER", "ABBA"):
            tables.spread_rows = identity if arm == "A" else REAL
            res[arm].append(run_once(name))
        tables.spread_rows = REAL
        a, b = res["A"], res["B"]
        print(
            f"{name}: A/plain(min {min(a):.3f} reps {[f'{x:.3f}' for x in a]})"
            f"  B/spread(min {min(b):.3f} reps {[f'{x:.3f}' for x in b]})",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
