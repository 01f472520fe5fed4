"""Z-ordered layout: pruning is real (plan-asserted) and lossless."""

from __future__ import annotations

from pyspark.sql import functions as F

from barco_spark.sources.layout import (
    Z_COL,
    write_zordered,
    z_partitions_for_rectangle,
    zordered_rectangle_scan,
)

BOUNDS = ((0.0, 100.0), (0.0, 100.0))
BITS = 3


def _write(spark, tmp_path):
    path = str(tmp_path / "ztab")
    df = spark.range(20_000).select(
        F.col("id"),
        ((F.col("id") * 7919) % 101).cast("double").alias("x"),
        ((F.col("id") * 104729) % 101).cast("double").alias("y"),
    )
    write_zordered(df, path, "x", "y", BOUNDS[0], BOUNDS[1], bits=BITS)
    return path, df


def test_zorder_rectangle_scan_prunes_and_matches(spark, tmp_path):
    path, df = _write(spark, tmp_path)
    rect = ((10.0, 25.0), (60.0, 80.0))

    scan = zordered_rectangle_scan(
        spark, path, "x", "y", rect[0], rect[1], BOUNDS[0], BOUNDS[1], BITS
    )
    plan = scan._jdf.queryExecution().executedPlan().toString()
    # the z IN-list must prune at file-listing time, not as a data filter
    assert "PartitionFilters" in plan and Z_COL in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0]

    expect = sorted(
        r["id"]
        for r in df.where(
            (F.col("x") >= rect[0][0])
            & (F.col("x") <= rect[0][1])
            & (F.col("y") >= rect[1][0])
            & (F.col("y") <= rect[1][1])
        ).collect()
    )
    got = sorted(r["id"] for r in scan.collect())
    assert got == expect and len(got) > 0

    # the pruning set must be a strict subset of the partition grid:
    # a 16x21 rectangle of a 101x101 domain at 3 bits touches at most
    # 2x3=6 of the 64 buckets
    zs = z_partitions_for_rectangle(rect[0], rect[1], BOUNDS[0], BOUNDS[1], BITS)
    assert 0 < len(zs) <= 6


def test_zorder_bucket_edges_stay_lossless(spark, tmp_path):
    """Values on bucket boundaries and domain extremes must never be
    lost to pruning: scan every 1-wide rectangle along the diagonal and
    compare against the unpruned filter."""
    path, df = _write(spark, tmp_path)
    for lo in (0.0, 12.5, 25.0, 49.5, 99.0, 100.0):
        rect = ((lo, lo + 1.0), (lo, lo + 1.0))
        got = sorted(
            r["id"]
            for r in zordered_rectangle_scan(
                spark, path, "x", "y", rect[0], rect[1],
                BOUNDS[0], BOUNDS[1], BITS,
            ).collect()
        )
        expect = sorted(
            r["id"]
            for r in df.where(
                (F.col("x") >= rect[0][0])
                & (F.col("x") <= rect[0][1])
                & (F.col("y") >= rect[1][0])
                & (F.col("y") <= rect[1][1])
            ).collect()
        )
        assert got == expect, f"lost rows at rectangle {rect}"
