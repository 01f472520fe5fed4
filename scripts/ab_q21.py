"""ABBA same-JVM A/B: q21_waiting_suppliers single-scan re-plan.

Current (r12) shape: `flagged` (lineitem JOIN orders) is built TWICE —
once filtered late for the probe side, once under a double
count-distinct (Expand x2, two exchanges) for per-order counts; the
fact table is scanned twice.

Candidate: repartition `flagged` by l_orderkey ONCE, collapse to
(l_orderkey, l_suppkey) pairs with max(late) + sum(late rows), derive
per-order counts from the pairs, and join pairs-with-late back to the
per-order counts — both branches hang off the SAME exchange
(ReusedExchange), so lineitem is scanned once, no Expand, and the only
wide shuffle carries 3 narrow columns (guide §2.3, §2.4).

Equivalence: COUNT(DISTINCT l_suppkey) == number of non-null pair rows;
COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) == pairs with any
late row; the final COUNT(*) over late flagged rows == sum of per-pair
late-row counts. An in-script gate collects both arms (rows AND
schema) before timing.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/ab_q21.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from barco_spark.registry import load_all  # noqa: E402
from barco_spark.session import free_persistent_rdds, get_spark  # noqa: E402
from barco_spark.tables import t  # noqa: E402


def build_new(spark, sf_dir):
    # The explicit l_suppkey IS NOT NULL makes the two branch subtrees
    # canonically equal so AQE reuses the shuffle stage (without it the
    # pairs side infers the filter from the supplier join, the counts
    # side does not, and lineitem is scanned twice). A/B of the two new
    # arms at sf0.1 was a wash both sittings (1.800/1.233 vs
    # 1.697/1.183 contended mins); the single-scan shape wins the tie
    # on the 100 TB story — one fact scan, one fewer shuffle write.
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    flagged = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_suppkey").isNotNull())
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)).alias(
                "late"
            ),
        )
    )
    # one exchange on the per-order key; both aggregates below reuse it
    pairs = (
        flagged.repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max("late").alias("supp_late"),
            F.sum(F.when(F.col("late"), 1).otherwise(0)).alias("n_late_rows"),
        )
    )
    per_order = pairs.groupBy("l_orderkey").agg(
        F.count("l_suppkey").alias("n_supp"),
        F.count(F.when(F.col("supp_late"), F.col("l_suppkey"))).alias(
            "n_late"
        ),
    )
    return (
        pairs.filter(F.col("supp_late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(
            F.broadcast(t(spark, sf_dir, "supplier")),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.sum("n_late_rows").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(25)
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = load_all()
    spark = get_spark(app_name="ab-q21")
    spark.sparkContext.setLogLevel("ERROR")
    name = "q21_waiting_suppliers"

    def run_once(build) -> float:
        spark.catalog.clearCache()
        free_persistent_rdds(spark)
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.3)
        t0 = time.perf_counter()
        df = build(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    old_build = queries[name].build
    run_once(queries["q1_pricing_summary"].build)  # warmup

    a = build_new(spark, sf_dir)
    b = old_build(spark, sf_dir)
    assert [f.name for f in a.schema.fields] == [
        f.name for f in b.schema.fields
    ], "schema names differ"
    assert [f.dataType for f in a.schema.fields] == [
        f.dataType for f in b.schema.fields
    ], f"schema types differ: {a.schema} vs {b.schema}"
    ra = [tuple(r) for r in a.collect()]
    rb = [tuple(r) for r in b.collect()]
    assert ra == rb, f"rows differ: {ra[:5]} vs {rb[:5]}"
    print(f"equality gate OK ({len(ra)} rows)", flush=True)

    order = os.environ.get("AB_ORDER", "ABBABAAB")
    res: dict[str, list[float]] = {"A": [], "B": []}
    for arm in order:
        res[arm].append(run_once(build_new if arm == "A" else old_build))
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
