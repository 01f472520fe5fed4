"""ABBA same-JVM A/B: the r13 single-evaluation CDC chunker fold
(md5 once per word in a transform; if(cond, struct, struct) so only
the taken branch's concat runs) vs the r12 form that evaluated the
boundary test and the concat twice per word (once per struct field).

Chunks are bit-identical (same md5, same branching semantics) —
pinned by the differential fuzz test and the oracle pairing; an
in-script equality gate re-checks before timing.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/ab_cdc_fold.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from barco_spark.operators import quality  # noqa: E402
from barco_spark.registry import load_all  # noqa: E402
from barco_spark.session import free_persistent_rdds, get_spark  # noqa: E402

_NEW = quality.cdc_chunk_array


def _old(text_col: str = "text"):
    bnd = (
        f"cast(conv(substring(md5(w), 1, 7), 16, 10) as bigint) "
        f"% {quality._CDC_DIV} = 0"
    )
    step = "if(acc.cur is null, w, concat(acc.cur, ' ', w))"
    return F.expr(
        f"""
        aggregate(
          split({text_col}, ' '),
          struct(cast(array() as array<string>) as done,
                 cast(null as string) as cur),
          (acc, w) -> struct(
            if({bnd}, array_append(acc.done, {step}), acc.done) as done,
            if({bnd}, cast(null as string), {step}) as cur),
          acc -> if(acc.cur is null, acc.done,
                    array_append(acc.done, acc.cur)))
        """
    )


def main() -> None:
    names = sys.argv[1:] or ["dedup_cdc_chunks"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = load_all()
    spark = get_spark(app_name="ab-cdc-fold")
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
        quality.cdc_chunk_array = _NEW
        a_rows = sorted(map(repr, queries[name].build(spark, sf_dir).collect()))
        quality.cdc_chunk_array = _old
        b_rows = sorted(map(repr, queries[name].build(spark, sf_dir).collect()))
        assert a_rows == b_rows, f"{name}: arms differ"
        order = os.environ.get("AB_ORDER", "ABBABAAB")
        res: dict[str, list[float]] = {"A": [], "B": []}
        for arm in order:
            quality.cdc_chunk_array = _NEW if arm == "A" else _old
            res[arm].append(run_once(name))
        quality.cdc_chunk_array = _NEW
        print(
            f"{name}: new min {min(res['A']):.3f} "
            f"{[round(x, 3) for x in res['A']]}"
            f" | old min {min(res['B']):.3f} "
            f"{[round(x, 3) for x in res['B']]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
