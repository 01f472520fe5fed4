"""Skew mitigation: salting for hot keys (the 100 TB survival kit).

The reference shards hot partition keys only by adding brokers (ring
split, C6); Spark gives two better tools, both here:

- AQE skew-join splitting (enabled in session.py) — free, runtime.
- Explicit salting for aggregations/joins whose key distribution is
  known-skewed (a handful of keys carrying most rows): two-phase
  aggregate via a salted key, and replicate-broadcast salted joins.

Both transforms are semantics-preserving; tests compare against the
unsalted plan's results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted(df: DataFrame, salt_buckets: int, salt_col: str = "_salt") -> DataFrame:
    """Add a uniform salt column (0..salt_buckets-1) derived from a
    stable row hash (not rand(): deterministic under retries)."""
    return df.withColumn(
        salt_col,
        F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt_buckets)),
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation over a skewed key.

    Phase 1 aggregates on (key, salt) — hot keys split into
    `salt_buckets` partial groups that spread across executors; phase 2
    merges partials on the key alone. Supported aggs: sum, count, min,
    max (the re-aggregatable ones; avg = sum+count composed by caller).

    `aggs` maps output column -> "fn(col)", e.g. {"n": "count(*)",
    "total": "sum(value)"}.
    """
    phase1_exprs = []
    phase2_exprs = []
    for out, spec in aggs.items():
        fn, _, arg = spec.partition("(")
        fn = fn.strip().lower()
        arg = arg.rstrip(")").strip()
        if fn == "count":
            phase1_exprs.append(F.count(F.lit(1)).alias(f"_p_{out}"))
            phase2_exprs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "sum":
            phase1_exprs.append(F.sum(arg).alias(f"_p_{out}"))
            phase2_exprs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "min":
            phase1_exprs.append(F.min(arg).alias(f"_p_{out}"))
            phase2_exprs.append(F.min(f"_p_{out}").alias(out))
        elif fn == "max":
            phase1_exprs.append(F.max(arg).alias(f"_p_{out}"))
            phase2_exprs.append(F.max(f"_p_{out}").alias(out))
        else:
            raise ValueError(f"unsupported re-aggregatable fn: {fn}")
    part = (
        salted(df, salt_buckets)
        .groupBy(*keys, "_salt")
        .agg(*phase1_exprs)
    )
    return part.groupBy(*keys).agg(*phase2_exprs)


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi join: salt the fact side, replicate the dim side.

    Each dim row is exploded into `salt_buckets` copies (one per salt),
    so a hot fact key's rows land on `salt_buckets` different reducers
    yet still find their dim match. Dim must be the small side.
    """
    salted_facts = facts.withColumn(
        "_salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt_buckets))
    )
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    joined = salted_facts.join(replicated_dim, [key, "_salt"], how)
    return joined.drop("_salt")


def key_histogram(df: DataFrame, key: str | Column, top: int = 20) -> DataFrame:
    """Diagnostic: row count of the heaviest keys (find skew before it
    finds you)."""
    key_col = F.col(key) if isinstance(key, str) else key
    return (
        df.groupBy(key_col.alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("key"))
        .limit(top)
    )
