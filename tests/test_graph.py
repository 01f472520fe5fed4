"""k-core peel: convergence twin vs the fixed unroll.

The oracle-paired ``graph_kcore`` unrolls exactly KCORE_ROUNDS peel
rounds (matching the nested-CTE DuckDB oracle).  The rows-only
``graph_kcore_converged`` peels until the edge count is stable.  When
the fixpoint is reached within KCORE_ROUNDS, the two MUST agree; when
it is not, extra peeling can only shrink the core (peeling is
monotone).
"""

from __future__ import annotations

from barco_spark.operators.graph import (
    KCORE_ROUNDS,
    _kcore_peel,
    graph_kcore,
    graph_kcore_converged,
)


def test_kcore_converged_matches_unrolled_at_fixpoint(spark, sf_dir):
    conv, rounds = _kcore_peel(spark, sf_dir, rounds=None)
    conv_rows = sorted(tuple(r) for r in conv.collect())
    unrolled_rows = sorted(tuple(r) for r in graph_kcore(spark, sf_dir).collect())
    assert rounds >= 1
    if rounds <= KCORE_ROUNDS:
        # fixpoint within the unroll: identical node set AND degrees
        assert conv_rows == unrolled_rows
    else:
        # extra rounds only remove nodes; survivors' degrees can only drop
        conv_nodes = {r[0] for r in conv_rows}
        unrolled = dict(unrolled_rows)
        assert conv_nodes <= set(unrolled)
        assert all(deg <= unrolled[n] for n, deg in conv_rows)


def test_kcore_converged_is_a_true_fixpoint(spark, sf_dir):
    """One more peel round after convergence changes nothing."""
    _, rounds = _kcore_peel(spark, sf_dir, rounds=None)
    at_fix, _ = _kcore_peel(spark, sf_dir, rounds=rounds)
    one_more, _ = _kcore_peel(spark, sf_dir, rounds=rounds + 1)
    assert sorted(map(tuple, at_fix.collect())) == sorted(
        map(tuple, one_more.collect())
    )


def test_kcore_registered_variant_is_converged(spark, sf_dir):
    a = sorted(tuple(r) for r in graph_kcore_converged(spark, sf_dir).collect())
    b, _ = _kcore_peel(spark, sf_dir, rounds=None)
    assert a == sorted(tuple(r) for r in b.collect())


def test_pagerank_driver_path_matches_distributed(spark, sf_dir):
    """The adaptive driver fixed-point (active whenever the pair graph
    fits _GRAPH_DRIVER_MAX_PAIRS) must be bit-identical to the
    distributed loop — every step is bigint div on positive operands in
    both, so any divergence is a bug, not rounding."""
    from barco_spark.operators.graph import pagerank_similarity_graph

    fast = sorted(
        map(tuple, pagerank_similarity_graph(spark, sf_dir).collect())
    )
    slow = sorted(
        map(
            tuple,
            pagerank_similarity_graph(
                spark, sf_dir, driver_max_pairs=0
            ).collect(),
        )
    )
    assert fast == slow
    assert len(fast) > 0


def test_kcore_driver_path_matches_distributed(spark, sf_dir):
    """Local peel == distributed peel, for both the fixed unroll and
    the run-to-convergence variant (same rounds count too)."""
    for rounds in (KCORE_ROUNDS, None):
        fast, rf = _kcore_peel(spark, sf_dir, rounds=rounds)
        slow, rs = _kcore_peel(
            spark, sf_dir, rounds=rounds, driver_max_pairs=0
        )
        assert rf == rs
        assert sorted(map(tuple, fast.collect())) == sorted(
            map(tuple, slow.collect())
        )


def test_pagerank_releases_iteration_caches(spark, sf_dir):
    """pagerank persists three iteration-invariant relations (edges,
    nodes, src+degree); a library caller must not leak them — after the
    call returns, the only live storage is the node-sized checkpoint
    backing the RESULT, and dropping that returns the session to its
    starting block set."""
    from barco_spark.operators.dedup import _lsh_pairs
    from barco_spark.operators.graph import pagerank_similarity_graph
    from barco_spark.session import persistent_rdd_ids, unpersist_rdds

    # prime the DELIBERATELY shared signature cache (_lsh_pairs persists
    # sig for reuse across the dedup family; the session sweep owns it)
    # so `before` includes it and the assertion isolates pagerank's own
    # iteration caches
    _lsh_pairs(spark, sf_dir).count()
    before = persistent_rdd_ids(spark)
    out = pagerank_similarity_graph(spark, sf_dir)
    assert out.count() > 0
    live = persistent_rdd_ids(spark) - before
    # the result checkpoint is the ONLY surviving persist; the three
    # iteration caches (edges / nodes / src_deg) were released in-op
    assert len(live) <= 1, f"leaked persisted RDDs: {sorted(live)}"
    unpersist_rdds(spark, live)
    assert persistent_rdd_ids(spark) - before == set()
