"""Z-ordered data layout: multi-dimensional partition pruning.

Single-column layouts (partitionBy(date), sorted parquet) skip data for
ONE predicate dimension; a rectangle query on (x, y) still scans every
partition of the non-layout dimension. Interleaving the bits of two
coarse bucket ids (Morton / Z-order, the curve Delta's OPTIMIZE ZORDER
and HBase keys use) gives one partition column whose ranges are
simultaneously local in BOTH dimensions, so a rectangle predicate maps
to a small set of partition values and Spark's partition pruning (plan
`PartitionFilters`, checked in tests/test_layout.py) skips everything
else at FILE-LISTING time — no footer reads, no row groups touched.

Scope notes, honestly stated:
- Buckets are FIXED-WIDTH ranges over caller-declared (min, max)
  bounds, so the bucket of a value is computable at read time without
  consulting the data — what makes pruning a pure function of the
  predicate. Skewed dimensions want quantile bounds; that's a layout
  *re-write* decision, same as any lakehouse OPTIMIZE.
- `bits` per dimension defaults to 3 (64 partitions): at 100 TB you
  raise it until partitions approach your file-size target; pruning
  work stays O(#partitions touched by the rectangle).
- This prunes at partition granularity. The reference's own analogue
  is offset-indexed segment seek (R5, SURVEY.md §2.4) — one dimension.
  Row-group-level skipping within the surviving partitions still
  happens via ordinary parquet min/max pushdown.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

Z_COL = "z_bucket"


def _bucket(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Fixed-width range bucket id in [0, 2**bits)."""
    n = 1 << bits
    raw = F.floor(
        (col.cast("double") - F.lit(float(lo)))
        * F.lit(float(n))
        / F.lit(float(hi) - float(lo) + 1e-9)
    ).cast("int")
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), raw))


def _interleave(bx: int, by: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((bx >> i) & 1) << (2 * i + 1)
        z |= ((by >> i) & 1) << (2 * i)
    return z


def zvalue(
    x: Column, y: Column, x_bounds: tuple, y_bounds: tuple, bits: int = 3
) -> Column:
    """Morton-interleaved bucket of (x, y) as one int column.

    The interleave runs as a JVM-side CASE over the per-dimension
    bucket ids via a lookup array (2**bits entries per dimension), so
    no UDF is involved and codegen keeps the write path vectorized.
    """
    bxc = _bucket(x, x_bounds[0], x_bounds[1], bits)
    byc = _bucket(y, y_bounds[0], y_bounds[1], bits)
    n = 1 << bits
    # z = rowmajor lookup table indexed by bx * n + by (tiny: n*n ints)
    table = F.array(
        *[
            F.lit(_interleave(bx, by, bits))
            for bx in range(n)
            for by in range(n)
        ]
    )
    return F.element_at(table, bxc * n + byc + 1).alias(Z_COL)


def write_zordered(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    x_bounds: tuple,
    y_bounds: tuple,
    bits: int = 3,
) -> None:
    """Write `df` partitioned by the z bucket of (x, y)."""
    (
        df.withColumn(Z_COL, zvalue(F.col(x), F.col(y), x_bounds, y_bounds, bits))
        .repartition(Z_COL)  # one shuffle -> one file per partition dir
        .write.mode("overwrite")
        .partitionBy(Z_COL)
        .parquet(path)
    )


def z_partitions_for_rectangle(
    x_range: tuple,
    y_range: tuple,
    x_bounds: tuple,
    y_bounds: tuple,
    bits: int = 3,
) -> list[int]:
    """Z buckets a rectangle query can touch (the pruning set).

    Exact range decomposition of the Z curve (BIGMIN/LITMAX) is the
    classic refinement; at partition granularity (bits <= ~6 per
    dimension) enumerating the bucket grid is exact and costs
    microseconds, so this stays the simple correct thing.
    """

    def brange(lo_v, hi_v, lo_b, hi_b):
        n = 1 << bits
        span = float(hi_b) - float(lo_b) + 1e-9
        lo_i = max(0, min(n - 1, int((float(lo_v) - lo_b) * n / span)))
        hi_i = max(0, min(n - 1, int((float(hi_v) - lo_b) * n / span)))
        return range(lo_i, hi_i + 1)

    return sorted(
        _interleave(bx, by, bits)
        for bx in brange(x_range[0], x_range[1], x_bounds[0], x_bounds[1])
        for by in brange(y_range[0], y_range[1], y_bounds[0], y_bounds[1])
    )


def zordered_rectangle_scan(
    spark: SparkSession,
    path: str,
    x: str,
    y: str,
    x_range: tuple,
    y_range: tuple,
    x_bounds: tuple,
    y_bounds: tuple,
    bits: int = 3,
) -> DataFrame:
    """Rectangle query over a z-ordered table with partition pruning.

    The z-bucket IN-list reaches the scan as `PartitionFilters` (pure
    metadata pruning); the exact x/y range predicates remain as data
    filters over the surviving partitions, so results are identical to
    a full scan with the same predicates.
    """
    zs = z_partitions_for_rectangle(x_range, y_range, x_bounds, y_bounds, bits)
    return (
        spark.read.parquet(path)
        .where(F.col(Z_COL).isin(zs))
        .where(
            (F.col(x) >= x_range[0])
            & (F.col(x) <= x_range[1])
            & (F.col(y) >= y_range[0])
            & (F.col(y) <= y_range[1])
        )
    )
