"""ABBA same-JVM A/B: q1_pricing_summary decimal-width narrowing.

Current shape casts doubles to decimal(18,2)/(18,4); the disc_price
product is then decimal(18,2) x decimal(6,4) -> decimal(37,6) and the
charge product decimal(25+,10) — both beyond Spark's 18-digit compact
representation, so every row's money math runs through JavaBigDecimal
(guide §2.3: narrower types).

Candidate: domain-bounded casts — l_extendedprice fits decimal(11,2)
(TPC-H bound ~104,950.00, 6 integer digits; 9 allowed), discount/tax
fit decimal(5,4). Then ep*(1-d) = decimal(18,6): compact-long decimal
math per row; sums get +10 headroom on top of the domain bound, so the
narrowing is scale-safe (row values are bounded by the data domain,
not the corpus size). Values are bit-identical: decimal arithmetic is
exact at both widths, rounding happens at the same scale-2 points, and
the output casts to double are unchanged.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/ab_q1_decimal.py
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


def _q(c: str) -> F.Column:  # quantity: <= 50.00
    return F.col(c).cast("decimal(11,2)")


def _ep(c: str) -> F.Column:  # extendedprice: <= ~104,950.00
    return F.col(c).cast("decimal(11,2)")


def _pct(c: str) -> F.Column:  # discount/tax: <= 0.10
    return F.col(c).cast("decimal(5,4)")


def build_old(spark, sf_dir):
    """The pre-r13 wide-decimal arm (decimal(18,2)/(18,4) casts), kept
    inline so the A/B stays re-runnable after the narrow arm landed as
    the registry build."""
    one = F.lit(1).cast("decimal(18,4)")
    d2 = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    d4 = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    cnt = F.count(F.lit(1))
    return (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(d2("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(d2("l_extendedprice")).cast("double").alias(
                "sum_base_price"
            ),
            F.round(F.sum(d2("l_extendedprice") * (one - d4("l_discount"))), 2)
            .cast("double")
            .alias("sum_disc_price"),
            F.round(
                F.sum(
                    d2("l_extendedprice")
                    * (one - d4("l_discount"))
                    * (one + d4("l_tax"))
                ),
                2,
            )
            .cast("double")
            .alias("sum_charge"),
            (F.sum(d2("l_quantity")).cast("double") / cnt).alias("avg_qty"),
            (F.sum(d2("l_extendedprice")).cast("double") / cnt).alias(
                "avg_price"
            ),
            (F.sum(d4("l_discount")).cast("double") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


def build_new(spark, sf_dir):
    one = F.lit(1).cast("decimal(5,4)")
    cnt = F.count(F.lit(1))
    return (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_q("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_ep("l_extendedprice")).cast("double").alias(
                "sum_base_price"
            ),
            F.round(
                F.sum(_ep("l_extendedprice") * (one - _pct("l_discount"))), 2
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.round(
                F.sum(
                    _ep("l_extendedprice")
                    * (one - _pct("l_discount"))
                    * (one + _pct("l_tax"))
                ),
                2,
            )
            .cast("double")
            .alias("sum_charge"),
            (F.sum(_q("l_quantity")).cast("double") / cnt).alias("avg_qty"),
            (F.sum(_ep("l_extendedprice")).cast("double") / cnt).alias(
                "avg_price"
            ),
            (F.sum(_pct("l_discount")).cast("double") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = load_all()
    spark = get_spark(app_name="ab-q1-decimal")
    spark.sparkContext.setLogLevel("ERROR")
    name = "q1_pricing_summary"

    def run_once(build) -> float:
        spark.catalog.clearCache()
        free_persistent_rdds(spark)
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.3)
        t0 = time.perf_counter()
        df = build(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    old_build = build_old
    run_once(queries["q3_shipping_priority"].build)  # warmup

    a = build_new(spark, sf_dir)
    b = old_build(spark, sf_dir)
    assert a.schema == b.schema, f"schema differs: {a.schema} vs {b.schema}"
    key = lambda r: (r[0], r[1])  # noqa: E731
    ra = sorted((tuple(r) for r in a.collect()), key=key)
    rb = sorted((tuple(r) for r in b.collect()), key=key)
    assert ra == rb, f"rows differ:\n{ra}\nvs\n{rb}"
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
