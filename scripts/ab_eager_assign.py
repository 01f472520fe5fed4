"""ABBA same-JVM A/B: eager_persist of the IVF `assigned` frame in
_cell_blocked_pairs / hard_negative_mining (it feeds BOTH sides of the
cell self-join; un-persisted, the interpreted assignment fold runs
twice — the r12 plan captures show two full scan+assign pipelines and
no ReusedExchange).  Persist may still LOSE if the duplicated subtrees
overlap on idle cores better than the serialized count+cache+2-reads
(the market_basket lesson), hence the A/B.
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
    ]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = load_all()
    spark = get_spark(app_name="ab-eager-assign")
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
            similarity._EAGER_ASSIGN = arm == "B"
            res[arm].append(run_once(name))
        similarity._EAGER_ASSIGN = False
        a, b = res["A"], res["B"]
        print(
            f"{name}: A/plain(min {min(a):.3f} reps {[f'{x:.3f}' for x in a]})"
            f"  B/persist(min {min(b):.3f} reps {[f'{x:.3f}' for x in b]})",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
