"""Capture .explain("formatted") for headline queries into plans/$PLANS_ROUND (default r13)/.

Usage: python scripts/capture_plans.py <suffix> [name ...]
Writes plans/r12/<query>_<suffix>.txt for each query (default: every
bench.py HEADLINE entry).  Plan capture is driver-only (no job runs),
so it is safe to run alongside other work.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from barco_spark.registry import load_all  # noqa: E402
from barco_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("PLANS_ROUND", "r13")
    )
    os.makedirs(out_dir, exist_ok=True)
    queries = load_all()
    spark = get_spark(app_name="plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = queries[name].build(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as ex:  # noqa: BLE001
            plan = f"PLAN CAPTURE FAILED: {type(ex).__name__}: {ex}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok" if not plan.startswith("PLAN CAPTURE FAILED") else "FAIL")
    spark.stop()


if __name__ == "__main__":
    main()
