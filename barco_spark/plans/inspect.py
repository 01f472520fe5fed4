"""Physical-plan inspection helpers.

The scale contract of every operator is enforced in tests with these:
filters must reach the parquet scan (PushedFilters), dim joins must be
BroadcastHashJoin, scans must prune columns (ReadSchema), and the
shuffle count must match the operator's design (one shuffle per
groupBy/window key, zero extra).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_pushed_filters(df: DataFrame, *needles: str) -> bool:
    """True if the plan pushes at least one filter into the scan
    (optionally requiring each `needle` column name to appear in the
    PushedFilters list)."""
    plan = explain_str(df)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    joined = ";".join(pushed)
    if not any(p.strip() for p in pushed):
        return False
    return all(n in joined for n in needles)


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists of each scan's ReadSchema (column-pruning check)."""
    plan = explain_str(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of DISTINCT shuffle exchanges in the physical plan (pre-AQE).

    Counts only data shuffles (hash/range/single-partition exchange);
    BroadcastExchange is not a shuffle of the probe side.  Exchanges are
    deduplicated by plan_id: when a cached relation is referenced more
    than once, every InMemoryRelation reference reprints the cached
    subtree's full lineage, so the SAME physical exchange (one plan_id,
    executed once at cache materialization) appears several times in the
    text — textual occurrences would overcount the runtime shuffles.
    """
    plan = explain_str(df, "simple")
    matches = re.findall(
        r"(?<!Broadcast)Exchange (?:hash|range|Single)\S*[^\n]*?(?:\[plan_id=(\d+)\])?\n",
        plan + "\n",
    )
    ids = [m for m in matches if m]
    anon = len(matches) - len(ids)
    return len(set(ids)) + anon


def wholestage_codegen_spans(df: DataFrame) -> int:
    return len(re.findall(r"WholeStageCodegen", explain_str(df, "simple")))
