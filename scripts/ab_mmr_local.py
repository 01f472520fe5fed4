"""ABBA same-JVM A/B: mmr_diverse_rerank's driver-local unrolled
greedy over the collected pool (N_QUERY x MMR_POOL rows, bounded at
any scale) vs the DataFrame greedy (eager-persisted pool + three
windowed argmax steps over 32-partition crumbs) — r12 session 7.

Score arithmetic mirrors the Column ops exactly (sequential fold
cosines, same literal mults, math.sqrt); both arms verified bit-equal
(values AND schema) at sf0.001/0.01/0.1 before timing.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/ab_mmr_local.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from barco_spark.operators import similarity  # noqa: E402
from barco_spark.registry import load_all  # noqa: E402
from barco_spark.session import free_persistent_rdds, get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:] or ["mmr_diverse_rerank"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = load_all()
    spark = get_spark(app_name="ab-pq-numpy")
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
            similarity._MMR_LOCAL = arm == "A"
            res[arm].append(run_once(name))
        similarity._MMR_LOCAL = True
        print(
            f"{name}: numpy min {min(res['A']):.3f} "
            f"{[round(x, 3) for x in res['A']]}"
            f" | df min {min(res['B']):.3f} "
            f"{[round(x, 3) for x in res['B']]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
