"""Randomized differential testing: Spark DataFrame plans vs DuckDB SQL.

tests/test_oracle_parity.py checks every registered query on FIXED
driver data; this fuzz layer checks the core relational building blocks
on RANDOM inputs (hypothesis-generated tables), so edge shapes the
fixtures never produce — empty groups, all-duplicate keys, one-row
sides, keys present on only one side of a join — are exercised on both
engines and must agree exactly.

Columns are ints and small-alphabet strings only (no floats): every
comparison is exact. A unique ``id`` column breaks all window ties so
both engines have a total order.

Examples are kept small (rows <= 60, max_examples <= 8 per property)
because each example runs real Spark jobs; the value is in the shapes,
not the volume.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

KEYS = st.integers(min_value=0, max_value=5)
VALS = st.integers(min_value=-100, max_value=100)
STRS = st.sampled_from(["a", "b", "c", "dd", ""])

ROWS = st.lists(st.tuples(KEYS, VALS, STRS), min_size=0, max_size=60)
# ROLLUP/GROUPING SETS require non-empty input for cross-engine
# equality — see test_rollup_empty_relation_divergence below
ROWS1 = st.lists(st.tuples(KEYS, VALS, STRS), min_size=1, max_size=60)

FUZZ = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _tables(spark, rows_a, rows_b):
    """Materialize the same two tables in Spark (temp views) and DuckDB."""
    import duckdb

    pa = pd.DataFrame(
        [(i, k, v, s) for i, (k, v, s) in enumerate(rows_a)],
        columns=["id", "k", "v", "s"],
    )
    pb = pd.DataFrame(
        [(i, k, v, s) for i, (k, v, s) in enumerate(rows_b)],
        columns=["id", "k", "v", "s"],
    )
    schema = "id long, k long, v long, s string"
    spark.createDataFrame(pa, schema=schema).createOrReplaceTempView("fz_a")
    spark.createDataFrame(pb, schema=schema).createOrReplaceTempView("fz_b")
    con = duckdb.connect()
    con.register("fz_a", pa)
    con.register("fz_b", pb)
    return con


def _key(row):
    # None-safe total order (rollup/outer-join rows carry NULLs)
    return tuple((x is None, str(x)) for x in row)


def _both(spark, con, spark_sql, duck_sql=None):
    duck_sql = duck_sql or spark_sql
    s = sorted((tuple(r) for r in spark.sql(spark_sql).collect()), key=_key)
    d = sorted((tuple(r) for r in con.execute(duck_sql).fetchall()), key=_key)
    assert s == d, f"spark={s[:5]}... duck={d[:5]}..."


@given(rows=ROWS)
@FUZZ
def test_fuzz_groupby_agg(spark, rows):
    con = _tables(spark, rows, [])
    try:
        _both(
            spark,
            con,
            """
            SELECT k, COUNT(*) AS n, SUM(v) AS sv, MIN(v) AS mn, MAX(v) AS mx,
                   COUNT(DISTINCT s) AS ds
            FROM fz_a GROUP BY k
            """,
        )
    finally:
        con.close()


@given(rows=ROWS1)
@FUZZ
def test_fuzz_rollup(spark, rows):
    con = _tables(spark, rows, [])
    try:
        _both(
            spark,
            con,
            "SELECT k, s, COUNT(*) AS n, SUM(v) AS sv FROM fz_a "
            "GROUP BY ROLLUP (k, s)",
        )
    finally:
        con.close()


@given(rows_a=ROWS, rows_b=ROWS)
@FUZZ
def test_fuzz_full_outer_join(spark, rows_a, rows_b):
    con = _tables(spark, rows_a, rows_b)
    try:
        _both(
            spark,
            con,
            """
            SELECT COALESCE(a.k, b.k) AS k, a.n AS na, b.n AS nb
            FROM (SELECT k, COUNT(*) AS n FROM fz_a GROUP BY k) a
            FULL OUTER JOIN (SELECT k, COUNT(*) AS n FROM fz_b GROUP BY k) b
            ON a.k = b.k
            """,
        )
    finally:
        con.close()


@given(rows_a=ROWS, rows_b=ROWS)
@FUZZ
def test_fuzz_setops_all(spark, rows_a, rows_b):
    con = _tables(spark, rows_a, rows_b)
    try:
        for op in ["INTERSECT ALL", "EXCEPT ALL", "UNION ALL"]:
            _both(
                spark,
                con,
                f"SELECT k, s FROM fz_a {op} SELECT k, s FROM fz_b",
            )
    finally:
        con.close()


@given(rows=ROWS)
@FUZZ
def test_fuzz_window_rank_and_dedup(spark, rows):
    con = _tables(spark, rows, [])
    try:
        # top-2 per key with a total order (v desc, id) — and
        # first-occurrence dedup as the rn=1 slice
        _both(
            spark,
            con,
            """
            SELECT k, v, id, rn FROM (
              SELECT k, v, id,
                     ROW_NUMBER() OVER (PARTITION BY k ORDER BY v DESC, id) AS rn
              FROM fz_a) t
            WHERE rn <= 2
            """,
        )
        _both(
            spark,
            con,
            """
            SELECT k, SUM(v) OVER (PARTITION BY k ORDER BY id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS running
            FROM fz_a
            """,
        )
    finally:
        con.close()


@given(rows=ROWS1)
@FUZZ
def test_fuzz_grouping_sets(spark, rows):
    con = _tables(spark, rows, [])
    try:
        _both(
            spark,
            con,
            "SELECT k, s, COUNT(*) AS n FROM fz_a "
            "GROUP BY GROUPING SETS ((k), (s), (k, s), ())",
        )
    finally:
        con.close()


def test_rollup_empty_relation_divergence(spark):
    """Pinned cross-engine divergence FOUND BY the fuzz layer: on an
    EMPTY relation, the SQL standard (and DuckDB/Postgres) emit the
    grand-total grouping-set row — `GROUP BY ROLLUP(k)` over zero rows
    yields one row with COUNT(*)=0 — while Spark's Expand-based
    rollup emits nothing. Registered rollup/cube/grouping-set queries
    all aggregate non-empty driver tables, so the oracle gate is
    unaffected; this test documents the edge and fails if either
    engine changes behavior."""
    import duckdb

    pdf = pd.DataFrame({"k": pd.Series(dtype="int64"), "v": pd.Series(dtype="int64")})
    spark.createDataFrame(pdf, schema="k long, v long").createOrReplaceTempView(
        "fz_empty"
    )
    s = spark.sql(
        "SELECT k, COUNT(*) AS n FROM fz_empty GROUP BY ROLLUP (k)"
    ).collect()
    con = duckdb.connect()
    try:
        con.register("fz_empty", pdf)
        d = con.execute(
            "SELECT k, COUNT(*) AS n FROM fz_empty GROUP BY ROLLUP (k)"
        ).fetchall()
    finally:
        con.close()
    assert s == []  # Spark: no groups -> no rows at all
    assert d == [(None, 0)]  # DuckDB: standard grand-total row


@given(rows_a=ROWS, rows_b=ROWS)
@FUZZ
def test_fuzz_semi_anti_join(spark, rows_a, rows_b):
    """SEMI/ANTI against a side that may be empty, may repeat keys, or
    may cover every key — existence semantics must agree exactly
    (multiplicity of the right side must never leak into the output)."""
    con = _tables(spark, rows_a, rows_b)
    try:
        for op in ["SEMI", "ANTI"]:
            _both(
                spark,
                con,
                f"SELECT id, k, v FROM fz_a {op} JOIN fz_b USING (k)",
                f"SELECT id, k, v FROM fz_a {op} JOIN fz_b USING (k)",
            )
    finally:
        con.close()


@given(rows=ROWS)
@FUZZ
def test_fuzz_running_and_lead_lag_windows(spark, rows):
    """Running sums and lead/lag over a tie-free total order (id):
    frame edges — single-row partitions, first/last row NULL handling —
    must agree exactly."""
    con = _tables(spark, rows, [])
    try:
        _both(
            spark,
            con,
            """
            SELECT id, k,
                   SUM(v) OVER (PARTITION BY k ORDER BY id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS rsum,
                   LAG(v, 1) OVER (PARTITION BY k ORDER BY id) AS pv,
                   LEAD(v, 2) OVER (PARTITION BY k ORDER BY id) AS nv2,
                   ROW_NUMBER() OVER (PARTITION BY k ORDER BY id) AS rn
            FROM fz_a
            """,
        )
    finally:
        con.close()


@given(rows=ROWS)
@FUZZ
def test_fuzz_range_frame_window(spark, rows):
    """Value-based RANGE frame (v +/- 10) with duplicate order keys:
    peers must enter the frame together on both engines (all-integer,
    so equality is exact)."""
    con = _tables(spark, rows, [])
    try:
        _both(
            spark,
            con,
            """
            SELECT id, k, v,
                   SUM(v) OVER (PARTITION BY k ORDER BY v
                                RANGE BETWEEN 10 PRECEDING AND 10 FOLLOWING)
                     AS nearby,
                   COUNT(*) OVER (PARTITION BY k ORDER BY v
                                  RANGE BETWEEN 10 PRECEDING AND 10 FOLLOWING)
                     AS n_nearby
            FROM fz_a
            """,
        )
    finally:
        con.close()


TS_US = st.integers(  # 2000-01-01 .. 2030-01-01, microsecond precision
    min_value=946_684_800_000_000, max_value=1_893_456_000_000_000
)
CENTS = st.integers(min_value=-10**7, max_value=10**7)


@given(rows=st.lists(st.tuples(TS_US, CENTS), min_size=0, max_size=60))
@FUZZ
def test_fuzz_timestamp_truncation_and_extraction(spark, rows):
    """date_trunc / extract over arbitrary microsecond timestamps: hour
    truncation, ISO weekday, hour-of-day, and epoch round-trips must
    agree exactly (timestamps are where engines classically diverge)."""
    import duckdb

    pdf = pd.DataFrame(
        [(i, ts) for i, (ts, _) in enumerate(rows)], columns=["id", "ts_us"]
    )
    spark.createDataFrame(pdf, schema="id long, ts_us long").createOrReplaceTempView(
        "fz_ts"
    )
    con = duckdb.connect()
    con.register("fz_ts", pdf)
    try:
        _both(
            spark,
            con,
            """
            SELECT id,
                   unix_micros(date_trunc('HOUR', timestamp_micros(ts_us)))
                     AS hour_start_us,
                   CAST(extract(hour FROM timestamp_micros(ts_us)) AS BIGINT)
                     AS hr,
                   CAST(extract(dayofweek_iso FROM timestamp_micros(ts_us))
                        AS BIGINT) AS wd
            FROM fz_ts
            """,
            """
            SELECT id,
                   epoch_us(date_trunc('hour', make_timestamp(ts_us)))
                     AS hour_start_us,
                   CAST(extract(hour FROM make_timestamp(ts_us)) AS BIGINT)
                     AS hr,
                   CAST(extract(isodow FROM make_timestamp(ts_us)) AS BIGINT)
                     AS wd
            FROM fz_ts
            """,
        )
    finally:
        con.close()


@given(rows=st.lists(st.tuples(KEYS, CENTS), min_size=0, max_size=60))
@FUZZ
def test_fuzz_decimal_aggregation(spark, rows):
    """The registry's money-math convention, fuzzed: sum exact DECIMAL
    cents FIRST, divide the sum ONCE, ROUND(2) before the DOUBLE cast.
    This property originally asserted the naive divide-then-sum shape
    (SUM(cents::DECIMAL / 100)) and hypothesis immediately found a
    1-ulp divergence at rows=[(0,1),(0,-3)] — decimal division widens
    the scale and the engines round the widened sum differently on the
    double cast. That finding IS the reason the convention exists
    (registry docstring; /verify gotchas); the safe shape below must
    agree to the bit on any input."""
    import duckdb

    pdf = pd.DataFrame(
        [(i, k, c) for i, (k, c) in enumerate(rows)],
        columns=["id", "k", "cents"],
    )
    spark.createDataFrame(
        pdf, schema="id long, k long, cents long"
    ).createOrReplaceTempView("fz_dec")
    con = duckdb.connect()
    con.register("fz_dec", pdf)
    try:
        _both(
            spark,
            con,
            """
            SELECT k,
                   CAST(ROUND(SUM(CAST(cents AS DECIMAL(18,2))) / 100, 2)
                        AS DOUBLE) AS total,
                   CAST(MIN(CAST(cents AS DECIMAL(18,2))) AS DOUBLE) AS mn,
                   CAST(MAX(CAST(cents AS DECIMAL(18,2))) AS DOUBLE) AS mx
            FROM fz_dec GROUP BY k
            """,
        )
    finally:
        con.close()


WORDS = st.sampled_from(["a", "bb", "ccc", "the", "quick", "", "zz9", "x"])
TEXTS = st.lists(
    st.lists(WORDS, min_size=0, max_size=40).map(" ".join),
    min_size=1,
    max_size=6,
)


@given(texts=TEXTS)
@FUZZ
def test_fuzz_cdc_chunker(spark, texts):
    """The in-row aggregate() fold chunker and the DuckDB positional
    chunker (cumulative boundary count + ordered string_agg) must cut
    IDENTICAL chunks on arbitrary texts — including empty words from
    repeated spaces, empty texts, and boundary words in first/last
    position."""
    import duckdb

    from barco_spark.operators.quality import CDC_CHUNKS_SQL, cdc_chunk_array

    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    sdf = spark.createDataFrame(pdf, schema="doc_id long, text string")
    s = sorted(
        (r["doc_id"], r["chunk"])
        for r in sdf.select(
            "doc_id", F.explode(cdc_chunk_array()).alias("chunk")
        ).collect()
    )
    con = duckdb.connect()
    try:
        con.register("fz_docs", pdf)
        d = sorted(
            con.execute(
                f"""
                WITH w AS (
                  SELECT doc_id, string_split(text, ' ') AS words
                  FROM fz_docs),
                {CDC_CHUNKS_SQL}
                SELECT doc_id, chunk FROM c
                """
            ).fetchall()
        )
    finally:
        con.close()
    assert s == d


EVT = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),          # user_id
        st.sampled_from(["click", "view"]),             # event_type
        st.integers(min_value=0, max_value=1200),       # seconds offset
    ),
    min_size=1,
    max_size=50,
)


@given(rows=EVT)
@FUZZ
def test_fuzz_debounce_tie_break(spark, rows, tmp_path_factory):
    """events_debounce vs its LAG oracle on adversarial streams:
    duplicate timestamps inside one (user, type) key (the tie the
    event_id ordering must break identically in both engines), gaps
    exactly AT the 300s threshold (strict-< boundary), and bursts."""
    import duckdb

    from barco_spark.registry import load_all

    tmp = tmp_path_factory.mktemp("dbfz")
    base = 1_700_000_000_000_000
    pdf = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": pd.to_datetime(
                [base + s * 1_000_000 for _u, _t, s in rows], unit="us"
            ),
            "user_id": [u for u, _t, _s in rows],
            "event_type": [t for _u, t, _s in rows],
            "value": [0.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )
    pdf.to_parquet(tmp / "events.parquet")
    spec = load_all()["events_debounce"]
    s = sorted(
        tuple(r) for r in spec.build(spark, str(tmp)).collect()
    )
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{tmp}/events.parquet'"
        )
        d = sorted(tuple(r) for r in con.execute(spec.oracle).fetchall())
    finally:
        con.close()
    assert s == d


TWAP_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),            # key
        st.integers(min_value=-100_000, max_value=100_000),  # cents
        st.integers(min_value=1, max_value=2_500_000_000_000),  # dur_us
    ),
    min_size=1,
    max_size=40,
)


@given(rows=TWAP_ROWS)
@FUZZ
def test_fuzz_twap_integer_areas(spark, rows):
    """events_twap's determinism shape, fuzzed AT TRAP MAGNITUDES: the
    first draft summed DECIMAL(18,2)*bigint areas and cast the
    DECIMAL(38,2) sum to DOUBLE — the engines disagreed by 1 ulp once
    the unscaled sum passed ~2^53 (seen on the real events table at
    ~1.5e16 units). The shipped shape keeps areas in int64
    (cents * dur_us, bounded by max_cents * time_range) and does two
    fixed-order double divisions; durations here go to 2.5e12 so the
    products land squarely in the zone that broke the decimal cast."""
    import duckdb

    pdf = pd.DataFrame(
        [(i, k, c, d) for i, (k, c, d) in enumerate(rows)],
        columns=["id", "k", "cents", "dur_us"],
    )
    spark.createDataFrame(
        pdf, schema="id long, k long, cents long, dur_us long"
    ).createOrReplaceTempView("fz_twap")
    con = duckdb.connect()
    con.register("fz_twap", pdf)
    try:
        _both(
            spark,
            con,
            """
            SELECT k,
                   CAST(SUM(dur_us) AS BIGINT) AS span_us,
                   (CAST(SUM(cents * dur_us) AS BIGINT)
                      / CAST(SUM(dur_us) AS BIGINT)) / 100.0 AS twap
            FROM fz_twap GROUP BY k
            """,
        )
    finally:
        con.close()


IDF_PAIRS = st.tuples(
    st.integers(min_value=1, max_value=10_000_000_000),  # N
    st.integers(min_value=1, max_value=10_000_000_000),  # df (clamped <= N)
)


@given(pairs=st.lists(IDF_PAIRS, min_size=1, max_size=40))
@FUZZ
def test_fuzz_bm25_idf_quantization(spark, pairs):
    """bm25's quantized idf: floor(log2(greatest(((N-df+1)<<20) div
    (df+1), 1))) must be cross-engine exact for ANY (N, df) — the
    GREATEST floor (the standard BM25 non-negative-idf convention)
    keeps the log argument a POSITIVE integer even when df ≈ N at
    ≥2^20 docs (the round-6 falsifier), the argument is an integer,
    and floor(log2(int)) is its bit length minus one (log2 of an int is
    only ever within an ulp of an integer when it IS that power of two,
    where log2 is exact). Includes exact powers of two by construction
    (N-df+1 = 1 cases) and values far past 2^53."""
    import duckdb

    rows = [(i, max(n, d), min(n, d)) for i, (n, d) in enumerate(pairs)]
    pdf = pd.DataFrame(rows, columns=["id", "n_docs", "df"])
    spark.createDataFrame(
        pdf, schema="id long, n_docs long, df long"
    ).createOrReplaceTempView("fz_idf")
    con = duckdb.connect()
    con.register("fz_idf", pdf)
    try:
        _both(
            spark,
            con,
            """
            SELECT id,
                   CAST(FLOOR(LOG2(GREATEST(((n_docs - df + 1) * 1048576)
                        div (df + 1), 1))) AS BIGINT) AS idf_q
            FROM fz_idf
            """,
            """
            SELECT id,
                   CAST(FLOOR(LOG2(GREATEST(((n_docs - df + 1) * 1048576)
                        // (df + 1), 1))) AS BIGINT) AS idf_q
            FROM fz_idf
            """,
        )
    finally:
        con.close()


# ---------------------------------------------------------------------------
# Ranking-operator fuzz: the embedding rankers on random integer vectors
# ---------------------------------------------------------------------------
# Integer-component embeddings keep every cosine a sequential double
# fold over EXACT values, so the fold-determinism convention (registry
# docstring) predicts bit-identical scores — and therefore identical
# rankings — on both engines for ANY input, not just the fixtures.
# These properties put that claim under random fire for the operators
# whose whole pairing rests on it (greedy MMR argmax chains, recall id
# sets, RRF fusion of two LIMIT boundaries).

VEC = st.lists(
    st.integers(min_value=-5, max_value=5), min_size=4, max_size=4
).filter(lambda v: any(v))
EMB_TABLES = st.lists(VEC, min_size=8, max_size=24)


def _emb_dir(spark, tmp_path_factory, vecs):
    import duckdb

    d = str(tmp_path_factory.mktemp("fz_emb"))
    rows = [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)]
    spark.createDataFrame(
        rows, "vec_id: bigint, embedding: array<float>, label: int"
    ).write.parquet(d + "/embeddings.parquet")
    # aligned documents table (doc_id == vec_id) for the hybrid ranker:
    # word bags derived from the vector ints, so lexical overlap varies
    # with the same generated data and ties occur often
    docs = [
        (
            i,
            " ".join(f"t{abs(x)}" for x in v) + f" u{i % 3}",
            "en",
            "s0",
            0,
        )
        for i, v in enumerate(vecs)
    ]
    spark.createDataFrame(
        docs,
        "doc_id: bigint, text: string, lang: string, source: string, "
        "n_chars: bigint",
    ).write.parquet(d + "/documents.parquet")
    con = duckdb.connect()
    for name in ("embeddings", "documents"):
        con.execute(
            # Spark writes a parquet DIRECTORY; DuckDB globs inside it
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"'{d}/{name}.parquet/*.parquet'"
        )
    return d, con


@pytest.mark.parametrize(
    "name",
    [
        "mmr_diverse_rerank",
        "ann_int8_recall",
        "ann_matryoshka_recall",
        "hybrid_rrf_retrieval",
    ],
)
@given(vecs=EMB_TABLES)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_embedding_rankers_agree_on_random_vectors(
    spark, tmp_path_factory, name, vecs
):
    from barco_spark.registry import load_all

    Q = load_all()
    if name == "ann_matryoshka_recall":
        # the truncation gate slices the first 16 dims: tile to 32 dims
        # so the slice genuinely DROPS half the signal (tiling to
        # exactly 16 would make truncation an identity and test nothing)
        vecs = [v * 8 for v in vecs]
    d, con = _emb_dir(spark, tmp_path_factory, vecs)
    try:
        sdf = Q[name].build(spark, d)
        srows = sorted(
            [tuple(r) for r in sdf.collect()], key=_key
        )
        drows = sorted(
            [tuple(r) for r in con.execute(Q[name].oracle).fetchall()],
            key=_key,
        )
        assert srows == drows
    finally:
        con.close()
