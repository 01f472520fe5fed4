"""ABBA same-JVM A/B: literal-array centroid assignment vs the
broadcast-join + groupBy(max_by) form (r12 session 6).

REJECTED — kept as the experiment record (the `_ASSIGN_LITERAL` hook
was removed with the revert).  Measured at sf0.1, min-of-4 per arm,
same JVM: the literal projection (argmax over a collected-centroid
array literal via transform/array_max, the kmeans_int8 trick) LOST
2-4x at every site — dedup_embedding_cosine 4.76 vs 2.40,
semdedup_prune 4.77 vs 1.81, hard_negative_mining 4.66 vs 1.56,
ann_ivf_search_exact 3.90 vs 1.12, ann_recall_report 4.81 vs 1.56.
Root cause: the assignment dot folds are already the innermost loop;
nesting them inside transform/array_max (HOF-in-HOF, every level
CodegenFallback) evaluates slower than the flat broadcast-join rows,
where the join/partial-agg machinery around the single-level fold is
whole-stage-codegen.  The kmeans_int8 win came from replacing K
SEPARATE Column trees (per-iteration analysis cost), not from the
array form being faster per row.  A follow-up A/B (same sitting)
showed the companion "one shared repartition('cell') for both pair
sides" is a wash on wall time AND produces zero exchange reuse in the
executed plan (Spark 4.1 does not sameResult round-robin-spread
subtrees across self-join sides), so it was reverted too.
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
    spark = get_spark(app_name="ab-assign-literal")
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
            similarity._ASSIGN_LITERAL = arm == "A"
            res[arm].append(run_once(name))
        similarity._ASSIGN_LITERAL = True
        print(
            f"{name}: literal min {min(res['A']):.3f} {res['A']}"
            f" | join min {min(res['B']):.3f} {res['B']}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
