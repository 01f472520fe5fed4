"""ABBA same-JVM A/B: telemetry_sessions_pipeline debounce inside ONE
user_id exchange (B, the new shape) vs the original (user_id,
event_type) debounce window + user_id sessionize re-shuffle (A).

Both shapes are built inline here (driver-side plan building only) so
the comparison shares one JVM; results were verified bit-identical vs
the DuckDB oracle before this A/B ran.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from barco_spark.operators.windows import _DEBOUNCE_US  # noqa: E402
from barco_spark.registry import load_all  # noqa: E402
from barco_spark.session import free_persistent_rdds, get_spark  # noqa: E402
from barco_spark.tables import t  # noqa: E402


def _old_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    w_d = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    kept = (
        ev.withColumn("prev_us", F.lag("ts_us").over(w_d))
        .where(
            F.col("prev_us").isNull()
            | (F.col("ts_us") - F.col("prev_us") >= _DEBOUNCE_US)
        )
        .select("user_id", "event_id", "ts_us")
    )
    w_s = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = kept.withColumn(
        "new_session",
        F.when(
            F.lag("ts_us").over(w_s).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w_s) >= 1_800_000_000),
            1,
        ).otherwise(0),
    )
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    numbered = flagged.withColumn("sid", F.sum("new_session").over(w_cum))
    sessions = numbered.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("ts_us") - F.min("ts_us")).alias("dur_us"),
    )
    return (
        sessions.groupBy(
            F.least(F.col("n_events"), F.lit(10)).cast("bigint").alias("size_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").cast("bigint").alias("total_events"),
            F.sum("dur_us").cast("bigint").alias("total_dur_us"),
            (F.sum("dur_us").cast("double") / F.count(F.lit(1))).alias("avg_dur_us"),
        )
        .orderBy("size_bucket")
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = load_all()
    spark = get_spark(app_name="ab-telemetry")
    spark.sparkContext.setLogLevel("ERROR")

    def run_once(build) -> float:
        spark.catalog.clearCache()
        free_persistent_rdds(spark)
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.3)
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    new_build = lambda: queries["telemetry_sessions_pipeline"].build(spark, sf_dir)  # noqa: E731
    old_build = lambda: _old_shape(spark, sf_dir)  # noqa: E731

    run_once(lambda: queries["q1_pricing_summary"].build(spark, sf_dir))  # warmup
    res = {"A": [], "B": []}
    for arm in os.environ.get("AB_ORDER", "ABBABAAB"):
        res[arm].append(run_once(old_build if arm == "A" else new_build))
    a, b = res["A"], res["B"]
    print(
        f"telemetry: A/old(min {min(a):.3f} reps {[f'{x:.3f}' for x in a]})"
        f"  B/one-exchange(min {min(b):.3f} reps {[f'{x:.3f}' for x in b]})",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
