"""ABBA same-JVM A/B: adaptive driver fixed-point vs distributed loop
for pagerank_similarity_graph / graph_kcore / graph_kcore_converged.

Arm A = distributed loop (driver_max_pairs=0 forces it).
Arm B = adaptive driver path (default cap).
Bench protocol otherwise identical to minibench (noop sink, cold cache,
GC+settle per rep).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from barco_spark.operators.graph import (  # noqa: E402
    KCORE_ROUNDS,
    _kcore_peel,
    pagerank_similarity_graph,
)
from barco_spark.registry import load_all  # noqa: E402
from barco_spark.session import free_persistent_rdds, get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = load_all()
    spark = get_spark(app_name="ab-graph-local")
    spark.sparkContext.setLogLevel("ERROR")

    builders = {
        "pagerank": {
            "A": lambda: pagerank_similarity_graph(
                spark, sf_dir, driver_max_pairs=0
            ),
            "B": lambda: pagerank_similarity_graph(spark, sf_dir),
        },
        "kcore": {
            "A": lambda: _kcore_peel(
                spark, sf_dir, rounds=KCORE_ROUNDS, driver_max_pairs=0
            )[0],
            "B": lambda: _kcore_peel(spark, sf_dir, rounds=KCORE_ROUNDS)[0],
        },
        "kcore_conv": {
            "A": lambda: _kcore_peel(
                spark, sf_dir, rounds=None, driver_max_pairs=0
            )[0],
            "B": lambda: _kcore_peel(spark, sf_dir, rounds=None)[0],
        },
    }

    def run_once(build) -> float:
        spark.catalog.clearCache()
        free_persistent_rdds(spark)
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.3)
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def bench_q(name: str) -> float:
        return run_once(lambda: queries[name].build(spark, sf_dir))

    bench_q("q1_pricing_summary")  # warmup
    for name, arms in builders.items():
        res = {"A": [], "B": []}
        for arm in "ABBA":
            res[arm].append(run_once(arms[arm]))
        a, b = res["A"], res["B"]
        print(
            f"{name}: A(min {min(a):.3f} reps {[f'{x:.3f}' for x in a]})"
            f"  B(min {min(b):.3f} reps {[f'{x:.3f}' for x in b]})",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
