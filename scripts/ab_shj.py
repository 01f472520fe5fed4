"""ABBA same-JVM A/B: allow shuffled-hash joins (guide §3.1/§9) vs the
sort-merge default, on the three headline plans that carry a
SortMergeJoin at r13 start (q21_waiting_suppliers lineitem self-joins,
semdedup_prune corpus left-outer, hybrid_rrf_retrieval full-outer
fusion) plus controls.

Arm A: spark.sql.join.preferSortMergeJoin=false and
       spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=64m
       (lets the planner pick SHJ when its size conditions hold and
       lets AQE rewrite SMJ->SHJ at runtime).
Arm B: Spark defaults (preferSortMergeJoin=true, threshold 0).

Both flags are planner strategy only — join results are identical;
this script only times. Runtime conf toggles take effect per query
(no session restart needed for these planner flags).

Usage: SPARK_GRAFT_SF_DIR=... python scripts/ab_shj.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from barco_spark.registry import load_all  # noqa: E402
from barco_spark.session import free_persistent_rdds, get_spark  # noqa: E402

DEFAULT = [
    "q21_waiting_suppliers",
    "semdedup_prune",
    "hybrid_rrf_retrieval",
    # controls: broadcast-pinned / exchange-free plans must not move
    "q3_shipping_priority",
    "dedup_minhash_lsh",
    "market_basket_lift",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = load_all()
    spark = get_spark(app_name="ab-shj")
    spark.sparkContext.setLogLevel("ERROR")

    def set_arm(shj: bool) -> None:
        spark.conf.set(
            "spark.sql.join.preferSortMergeJoin", "false" if shj else "true"
        )
        spark.conf.set(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            "67108864" if shj else "0",
        )

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
            set_arm(arm == "A")
            res[arm].append(run_once(name))
        set_arm(False)
        print(
            f"{name}: shj min {min(res['A']):.3f} "
            f"{[round(x, 3) for x in res['A']]}"
            f" | smj min {min(res['B']):.3f} "
            f"{[round(x, 3) for x in res['B']]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
