"""ABBA same-JVM A/B: bit-exact numpy cell assignment (mapInPandas,
dim-order folds) vs the broadcast-join + groupBy(max_by) interpreted
form (r12 session 7).

Unlike the r12 session-6 literal-array attempt (rejected — HOF-in-HOF
CodegenFallback evaluated SLOWER than the flat join rows), this arm
moves the N x sqrt(N) assignment loop out of the interpreter entirely:
one Arrow pass, numpy folding dim-by-dim so every double matches the
sequential JVM fold bit-for-bit (verified on all five consumers at
sf0.001 AND sf0.1 before timing; np.matmul would NOT match — see the
ann_ivf_search registration note).

Usage: SPARK_GRAFT_SF_DIR=... python scripts/ab_assign_numpy.py [names...]
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
    names = sys.argv[1:] or [
        "dedup_embedding_cosine",
        "semdedup_prune",
        "hard_negative_mining",
        "ann_ivf_search_exact",
        "ann_recall_report",
    ]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = load_all()
    spark = get_spark(app_name="ab-assign-numpy")
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
            similarity._ASSIGN_NUMPY = arm == "A"
            res[arm].append(run_once(name))
        similarity._ASSIGN_NUMPY = True
        print(
            f"{name}: numpy min {min(res['A']):.3f} "
            f"{[round(x, 3) for x in res['A']]}"
            f" | join min {min(res['B']):.3f} "
            f"{[round(x, 3) for x in res['B']]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
