"""Generic as-of join operator.

Spark lacks a native as-of join (pandas `merge_asof` semantics: each
left row matched to the latest right row with right_ts <= left_ts per
key). The scale-correct shape is union + running last_value — ONE
shuffle on the key, no row explosion — rather than the O(n*m) theta
join a naive implementation produces.

Used by the `asof_join_last_click` registry query; this module is the
reusable operator form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row at-or-before its
    timestamp, per `on` key.

    Returns all left columns plus `<right_ts><suffix>` and each value
    column as `<col><suffix>`.

    Tie behavior: when multiple right rows share the same (key,
    right_ts), which one matches is unspecified (the running window has
    no further ordering) — pre-deduplicate or disambiguate timestamps
    if the distinction matters.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]

    lhs = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left.columns if c not in (on,)],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast(dict(right.dtypes)[right_ts]).alias("_r_ts"),
    )
    rhs = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns if c != on],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(right_ts).alias("_r_ts"),
    )
    unioned = lhs.unionByName(rhs)

    # right rows sort before left rows at equal timestamps so a
    # same-instant right row is visible to the left row (at-or-before)
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
        F.last("_r_ts", ignorenulls=True).over(w).alias(f"{right_ts}{suffix}"),
    )
    keep = (
        [on]
        + [c for c in left.columns if c != on]
        + [f"{c}{suffix}" for c in value_cols]
        + [f"{right_ts}{suffix}"]
    )
    return filled.filter(F.col("_is_left") == 1).select(*keep)
