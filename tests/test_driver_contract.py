"""Pin the driver contract's curated CORRECTNESS window.

The driver hash-checks exactly the FIRST 50 entries of
``__spark_entry__.queries()`` in iteration order (observed unchanged
r1-r9).  Round 10 curates that window (VERDICT r9 item 1): relational
anchors that have been green since r1 stay in as regression canaries,
and the LLM-pipeline flagships get their first driver-oracle exposure.
These tests make the composition an explicit, reviewed contract instead
of an import-order accident.
"""

from __future__ import annotations

import __spark_entry__ as entrymod
from barco_spark.registry import load_all

QUERIES = load_all()

LLM_CATEGORIES = {"dedup", "similarity", "text", "pipeline", "sampling", "udf"}


def test_window_is_exactly_fifty_known_queries():
    w = entrymod.DRIVER_WINDOW
    assert len(w) == 50
    assert len(set(w)) == 50
    missing = [n for n in w if n not in QUERIES]
    assert not missing, f"window names not in registry: {missing}"


def test_queries_iteration_order_leads_with_the_window():
    names = list(entrymod.queries())
    assert names[:50] == entrymod.DRIVER_WINDOW
    # nothing is dropped: every registry entry still reaches the driver
    assert set(names) == set(QUERIES)
    assert len(names) == len(QUERIES)


def test_window_has_oracled_llm_flagships_and_kept_anchors():
    w = entrymod.DRIVER_WINDOW
    llm_oracled = [
        n
        for n in w
        if QUERIES[n].category in LLM_CATEGORIES and QUERIES[n].oracle is not None
    ]
    # VERDICT r9 item 1 done-criterion: >=15 LLM-pipeline operators with
    # a real driver-oracle row (hash check, not rows-only)
    assert len(llm_oracled) >= 15, llm_oracled
    # the flagship + the broker/window anchors the verdict called out
    for anchor in (
        "q1_pricing_summary",
        "events_exact_tokens",
        "consumer_lag_report",
        "window_topk_per_group",
    ):
        assert anchor in w
    # at most one rows-only entry spends window budget without a hash row
    rows_only = [n for n in w if QUERIES[n].oracle is None]
    assert len(rows_only) <= 1, rows_only


def test_oracle_sql_matches_registry():
    osql = entrymod.oracle_sql()
    expected = {n for n, s in QUERIES.items() if s.oracle is not None}
    assert set(osql) == expected
    assert all(isinstance(v, str) and v.strip() for v in osql.values())
