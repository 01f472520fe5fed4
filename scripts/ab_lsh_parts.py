"""ABBA same-JVM A/B: row-sized _verify_join_parts vs session width.

Arm A = current helper (max(shuffle.partitions, ceil(n/16k))).
Arm B = row-sized (max(min(base, ceil(n/600)), ceil(n/16k))) — the
spread_rows density applied to the LSH verify/dedup exchanges.

The helper runs on the DRIVER at plan-build time, so a driver-side
monkeypatch is a valid A/B kernel (unlike worker-side code).
Order per query: A B B A (both arms equally contaminated).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from barco_spark.operators import dedup  # noqa: E402
from barco_spark.registry import load_all  # noqa: E402
from barco_spark.session import free_persistent_rdds, get_spark  # noqa: E402

ORIG = dedup._verify_join_parts


def row_sized(spark, sf_dir):
    n_docs = dedup._corpus_count(spark, sf_dir)
    base = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return max(min(base, -(-n_docs // 600)), -(-n_docs // 16_000))


def main() -> None:
    names = sys.argv[1:] or [
        "dedup_minhash_lsh",
        "dedup_clusters",
        "graph_kcore",
        "cross_split_leakage",
        "fuzzy_match_blocked",
    ]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = load_all()
    spark = get_spark(app_name="ab-lsh-parts")
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
            dedup._verify_join_parts = ORIG if arm == "A" else row_sized
            res[arm].append(run_once(name))
        dedup._verify_join_parts = ORIG
        a, b = res["A"], res["B"]
        print(
            f"{name}: A(min {min(a):.3f} reps {[f'{x:.3f}' for x in a]})"
            f"  B(min {min(b):.3f} reps {[f'{x:.3f}' for x in b]})",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
