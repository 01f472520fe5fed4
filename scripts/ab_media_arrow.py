"""ABBA same-JVM A/B: pyarrow local-table build of the synthetic media
relation (r13) vs the old pickled-RDD ``spark.createDataFrame(rows,
MEDIA_SCHEMA)`` path.

The old path slices driver rows into an RDD and starts one Python
worker per partition just to unpickle them; profile_query.py showed
the decode stages behind phash_image_dedup burning ~1.4 s/task on
~9-row partitions.  Rows and schema are bit-identical between the
arms (asserted before timing on the first run).

Usage: SPARK_GRAFT_SF_DIR=... python scripts/ab_media_arrow.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from barco_spark.multimodal import media  # noqa: E402
from barco_spark.registry import load_all  # noqa: E402
from barco_spark.session import free_persistent_rdds, get_spark  # noqa: E402

QUERIES = ["phash_image_dedup", "multimodal_profile", "audio_feature_extract"]

_ARROW_BUILDER = media.media_rows_df


def _old_builder(spark, rows, n):
    return spark.createDataFrame(
        [(r[0], r[1], bytearray(r[2]), r[3]) for r in rows],
        media.MEDIA_SCHEMA,
    ).coalesce(max(1, n // 16))


def main() -> None:
    names = sys.argv[1:] or QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = load_all()
    spark = get_spark(app_name="ab-media-arrow")
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
        # equality gate before timing
        media.media_rows_df = _ARROW_BUILDER
        a_rows = sorted(map(repr, queries[name].build(spark, sf_dir).collect()))
        media.media_rows_df = _old_builder
        b_rows = sorted(map(repr, queries[name].build(spark, sf_dir).collect()))
        assert a_rows == b_rows, f"{name}: arms differ"
        res: dict[str, list[float]] = {"A": [], "B": []}
        for arm in order:
            media.media_rows_df = _ARROW_BUILDER if arm == "A" else _old_builder
            res[arm].append(run_once(name))
        media.media_rows_df = _ARROW_BUILDER
        print(
            f"{name}: arrow min {min(res['A']):.3f} "
            f"{[round(x, 3) for x in res['A']]}"
            f" | rdd min {min(res['B']):.3f} "
            f"{[round(x, 3) for x in res['B']]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
