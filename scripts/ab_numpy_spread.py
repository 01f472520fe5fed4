"""ABBA same-JVM A/B: row-guarded spread of the numpy kernels' scan
input (r13, ADVICE r12 item 4) vs the raw 1-3-split scan.

The r12 one-pass Arrow kernels (ann_pq_search_int8's
quantize/encode/ADC, kmeans_int8_clusters' per-round Lloyd pass)
bypassed the fold arms' narrow-scan repartition, so the dominant
mapInPandas kernel ran on the raw parquet splits — 1 task at sf0.1.
The spread is partition-independent (per-row kernels; integer partial
sums are associative), so the output is bit-identical either way;
this script only times it.

RESULT (r13, host ~1.8x certified floor, both arms equally
contaminated): spread LOSES on both queries —
  ann_pq_search_int8: spread min 1.129 [5.905,1.407,1.129,1.133]
                      vs plain 0.882 [1.641,1.248,1.121,0.882]
  kmeans_int8_clusters: spread min 1.389 [1.736,1.389,1.575,1.473]
                        vs plain 1.133 [1.147,1.133,1.189,1.251]
The vectorized kernels are too cheap per row for the exchange +
per-task Python worker setup to pay at bench scale, and the row guard
makes the spread a no-op at warehouse scan widths — no scale story
either.  _NUMPY_SPREAD defaults to False; this script remains the
re-runnable record.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/ab_numpy_spread.py
       [query ...]   # default: ann_pq_search_int8 kmeans_int8_clusters
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from barco_spark.operators import kmeans_int8, pq  # noqa: E402
from barco_spark.registry import load_all  # noqa: E402
from barco_spark.session import free_persistent_rdds, get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:] or ["ann_pq_search_int8", "kmeans_int8_clusters"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = load_all()
    spark = get_spark(app_name="ab-numpy-spread")
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
    order = os.environ.get("AB_ORDER", "ABBABAAB")
    for name in names:
        res: dict[str, list[float]] = {"A": [], "B": []}
        for arm in order:
            flag = arm == "A"
            pq._NUMPY_SPREAD = flag
            kmeans_int8._NUMPY_SPREAD = flag
            res[arm].append(run_once(name))
        pq._NUMPY_SPREAD = True
        kmeans_int8._NUMPY_SPREAD = True
        print(
            f"{name}: spread min {min(res['A']):.3f} "
            f"{[round(x, 3) for x in res['A']]}"
            f" | plain min {min(res['B']):.3f} "
            f"{[round(x, 3) for x in res['B']]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
