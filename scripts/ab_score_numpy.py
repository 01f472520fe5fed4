"""ABBA same-JVM A/B: bit-exact numpy brute query scoring
(mapInPandas, dim-order folds / exact int8 quantization) vs the
broadcast(q).crossJoin(c) interpreted-fold form (r12 session 7).

Companion to ab_assign_numpy.py — same kernel discipline, applied to
the brute scoring pass shared by ann_cosine_topk (and through it
ann_recall_report's exact side), ann_int8_recall (both rankings; the
numpy arm also drops the quantize-frame eager_persist),
and ann_matryoshka_recall (full-dim and prefix cosines).  Bit-exact
equality of both arms was verified on all five queries at sf0.001 AND
sf0.1 before timing.

mmr_diverse_rerank's pool stage was ALSO tried (carry_vec=True) and
measured NEGATIVE (numpy min 1.875 vs join 1.680, numpy loses every
paired position): the pool carries the candidate vector, and
re-emitting it N_QUERY x through Arrow costs more than the fold
saving.  That site was reverted to the JVM pass; this script's mmr
entry now A/Bs identical arms (kept for the record).

Usage: SPARK_GRAFT_SF_DIR=... python scripts/ab_score_numpy.py [names...]
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
        "ann_cosine_topk",
        "ann_int8_recall",
        "ann_matryoshka_recall",
        "mmr_diverse_rerank",
        "ann_recall_report",
    ]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = load_all()
    spark = get_spark(app_name="ab-score-numpy")
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
            similarity._SCORE_NUMPY = arm == "A"
            res[arm].append(run_once(name))
        similarity._SCORE_NUMPY = True
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
