"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All candidate generation is blocking-based (LSH bands / hash blocks) so
the pairwise work is local to a bucket — the shape that survives 100 TB:
no global cross join, one shuffle per blocking key, and verification
joins are on pre-bucketed pairs.

Determinism contract: the base hash is the portable 28-bit md5 prefix
(operators/text.py:h28), MinHash permutations are (a*h+b) mod p with all
intermediates < 2^60 (no overflow in either engine, safe under Spark
ANSI mode), and Jaccard is a single integer division at the end.

Perf: tokens/shingles are hashed ONCE into an int array (`hs`), and the
8 MinHash permutations / 28 SimHash bit-votes fold over the ints — not
one md5 per permutation/bit (8-28x less hashing; same values).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from barco_spark.operators.text import (
    fingerprint5,
    h28,
    h28_spark_sql,
    h28_sql,
    shingles5_sql,
)
from barco_spark.registry import register
from barco_spark.tables import t

# MinHash permutation constants: sig_i = min_h (A[i]*h + B[i]) % P
MINHASH_A = [1000003, 1000033, 1000037, 1000039, 1000081, 1000099, 1000117, 1000121]
MINHASH_B = [12345 + 777 * i for i in range(8)]
MINHASH_P = 1_000_000_007
N_BANDS = 4  # 4 bands x 2 rows (k=8)

SIMHASH_BITS = 28


# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------
@register(
    "dedup_exact",
    """
    SELECT md5(text) AS text_hash,
           MIN(doc_id) AS keeper_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
    "dedup",
    doc="Exact dedup: hash-groupBy on content digest, keep min id.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "documents")
        .groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# --------------------------------------------------------------------------
# Shingles + hashed shingles + MinHash signatures
# --------------------------------------------------------------------------
def _shingles_col() -> Column:
    """Distinct 3-word shingles of `words` (docs with <3 words -> whole
    text). Built with the zip-slice kgrams helper — linear per doc, see
    text.kgrams."""
    from barco_spark.operators.text import kgrams

    return F.array_distinct(kgrams(F.col("words"), 3))


# sh: doc_id, shingles (distinct), hs (28-bit hash per shingle, hashed once)
_HASHED_SHINGLES_SQL = f"""
      SELECT doc_id, shingles,
             list_transform(shingles, s -> {h28_sql('s')}) AS hs
      FROM (
        SELECT doc_id,
               list_distinct(CASE WHEN len(words) >= 3
                 THEN list_transform(range(1, len(words) - 1),
                      i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
                 ELSE [array_to_string(words, ' ')] END) AS shingles
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents))
"""


def _hashed_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from barco_spark.tables import spread_rows

    # row-sized hash-spread below the shingle/minhash interpreted folds
    # (r12, guide §2.5): the raw text scan arrives 1-3 splits and the
    # folds are costed per row — see tables.spread_rows for the A/B
    # (8-way won every rep on every LSH-family query; 32-way washed)
    return (
        spread_rows(t(spark, sf_dir, "documents"), spark, sf_dir, "doc_id")
        .select("doc_id", F.split(F.col("text"), " ").alias("words"))
        .select("doc_id", _shingles_col().alias("shingles"))
        .select(
            "doc_id",
            "shingles",
            F.transform(F.col("shingles"), lambda s: h28(s)).alias("hs"),
        )
    )


def _perm_fn(i: int):
    # factory (not a default-arg lambda): a 2-arg lambda would make
    # pyspark pass the array index as the second argument
    def fn(h: Column) -> Column:
        return (MINHASH_A[i] * h + MINHASH_B[i]) % MINHASH_P

    return fn


def _minhash_cols() -> list[Column]:
    return [
        F.array_min(F.transform(F.col("hs"), _perm_fn(i))).alias(f"s{i}")
        for i in range(len(MINHASH_A))
    ]


def _minhash_sql_cols() -> str:
    return ",\n             ".join(
        f"list_min(list_transform(hs, h -> ({MINHASH_A[i]} * h + {MINHASH_B[i]}) "
        f"% {MINHASH_P})) AS s{i}"
        for i in range(len(MINHASH_A))
    )


@register(
    "minhash_signatures",
    f"""
    WITH sh AS ({_HASHED_SHINGLES_SQL})
    SELECT doc_id,
             {_minhash_sql_cols()}
    FROM sh
    """,
    "dedup",
    doc="k=8 MinHash signature per document over distinct 3-word shingles.",
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hashed_shingles(spark, sf_dir).select("doc_id", *_minhash_cols())


# --------------------------------------------------------------------------
# MinHash LSH candidate pairs + Jaccard verification
# --------------------------------------------------------------------------
def _band_sql(b: int) -> str:
    return f"(s{2*b}::VARCHAR || '_' || s{2*b+1}::VARCHAR)"


# Shared CTE block ending in `pairs(doc_a, doc_b, jaccard)`: the full
# LSH pipeline, reused by dedup_minhash_lsh and dedup_clusters oracles.
_LSH_PAIRS_CTES = f"""
    sh AS ({_HASHED_SHINGLES_SQL}),
    sig AS (
      SELECT doc_id, shingles,
             {_minhash_sql_cols()}
      FROM sh),
    bands AS (
      {" UNION ALL ".join(f"SELECT doc_id, {b} AS band_idx, {_band_sql(b)} AS band_val FROM sig" for b in range(N_BANDS))}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id),
    verified AS (
      SELECT c.doc_a, c.doc_b,
             len(list_intersect(x.shingles, y.shingles)) AS n_common,
             len(x.shingles) + len(y.shingles)
               - len(list_intersect(x.shingles, y.shingles)) AS n_union
      FROM cand c JOIN sig x ON c.doc_a = x.doc_id
                  JOIN sig y ON c.doc_b = y.doc_id),
    pairs AS (
      SELECT doc_a, doc_b,
             CAST(n_common AS DOUBLE) / n_union AS jaccard
      FROM verified
      WHERE CAST(n_common AS DOUBLE) / n_union >= 0.4)
"""


def _band_candidates(
    sig: DataFrame, bucket_cap: int | None, dedup_parts: int | None = None
) -> DataFrame:
    """Banded candidate pairs (doc_a < doc_b, distinct) from a minhash
    signature frame with columns doc_id, s0..s7. With a cap, buckets
    larger than `bucket_cap` are dropped before the self-join (window
    count over the band key, which co-partitions with the join — one
    shuffle serves both). Shared by the Jaccard/containment verifies
    and the fuzzy (edit-distance) verify so the blocking cannot drift.

    ``dedup_parts`` (r12, guide §2.4): when the caller's next step is a
    verify join keyed on doc_a at that width, key the pair dedup's
    exchange on doc_a too — hash-partitioning by doc_a alone already
    clusters (doc_a, doc_b), so ONE exchange serves both the distinct
    and the join's probe side (plan: Exchange(a,b) + Exchange(a) ->
    Exchange(a)). Identical row set either way."""
    from pyspark.sql import Window

    # one Generate over an array of (band_idx, band_val) structs instead
    # of a 4-way union (one pass over sig, one py4j call for the whole
    # expression; identical rows to the oracle's UNION ALL)
    band_arr = F.expr(
        "array("
        + ", ".join(
            f"struct({b} as band_idx, concat_ws('_', cast(s{2*b} as string),"
            f" cast(s{2*b+1} as string)) as band_val)"
            for b in range(N_BANDS)
        )
        + ")"
    )
    bands = sig.select("doc_id", F.explode(band_arr).alias("bd")).select(
        "doc_id", "bd.band_idx", "bd.band_val"
    )

    if bucket_cap is not None:
        wb = Window.partitionBy("band_idx", "band_val")
        bands = (
            bands.select(
                "doc_id",
                "band_idx",
                "band_val",
                F.count(F.lit(1)).over(wb).alias("bsz"),
            )
            .filter(F.col("bsz") <= bucket_cap)
            .drop("bsz")
        )

    a = bands.alias("a")
    # corpus-sized self-join side: SHUFFLE_HASH so a pruned-parquet
    # size estimate can never broadcast the whole band table (see the
    # verify-join comment in _lsh_pairs — the graph_kcore 500k
    # driver-OOM class)
    b_ = bands.alias("b").hint("shuffle_hash")
    joined = a.join(
        b_,
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_val") == F.col("b.band_val"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    if dedup_parts is None:
        return joined.distinct()
    return joined.repartition(dedup_parts, "doc_a").dropDuplicates(
        ["doc_a", "doc_b"]
    )


def _verify_join_parts(spark: SparkSession, sf_dir: str) -> int:
    """Partition count for the corpus-sided SHUFFLE_HASH verify joins.

    An SHJ build side must fit per-task execution memory, and at a
    FIXED partition count any per-partition build eventually outgrows
    it as the corpus grows — found empirically (r9 scale study):
    500k docs / 32 partitions built fine, 1M / 32 failed with "Can't
    acquire 67108864 bytes memory to build hash relation" on
    local[32]. Bound the build at ~16k shingle-array rows per
    partition (half the measured-good 500k/32 density); large corpora
    scale the exchange width with the data — exactly what a cluster
    operator does by raising spark.sql.shuffle.partitions with input
    size. The doc count is a parquet-footer read (metadata-cheap, the
    dsir/dedup_clusters adaptive-plan pattern).

    Row-sized LOWER bound (r12, guide §2.5 — the spread_rows density):
    at small corpora a session-width exchange launches parallelism-many
    tasks on KB-sized partitions, and the task-launch overhead swamps
    the work.  Clamp to ceil(rows/600) when that is below the session
    width (ABBA A/B at sf0.1, both orders: lsh 1.87 vs 2.13 /
    2.66 vs 3.66, clusters 1.78 vs 2.07 / 1.93 vs 2.38, leakage 2.10
    vs 2.51 / 1.93 vs 2.88, kcore + fuzzy small wins to wash).  At
    warehouse scale ceil(rows/600) >= the session width, so the clamp
    is inert and the SHJ-build bound governs as before."""
    n_docs = _corpus_count(spark, sf_dir)
    base = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return max(min(base, -(-n_docs // 600)), -(-n_docs // 16_000))


# (sf_dir -> documents row count): the count is a parquet-footer read,
# but still one Spark job's scheduling round trip per call — and every
# query in the dedup/graph family calls _verify_join_parts. A dataset
# path's count is constant for a session (test corpora are immutable;
# scale-study corpora live in unique temp dirs), so cache it — the
# same discipline as the shared signature cache.
_CORPUS_COUNT_CACHE: dict[str, int] = {}


def _corpus_count(spark: SparkSession, sf_dir: str) -> int:
    n = _CORPUS_COUNT_CACHE.get(sf_dir)
    if n is None:
        n = t(spark, sf_dir, "documents").count()
        _CORPUS_COUNT_CACHE[sf_dir] = n
    return n


def _lsh_pairs(
    spark: SparkSession,
    sf_dir: str,
    bucket_cap: int | None = None,
    metric: str = "jaccard",
    threshold: float = 0.4,
    pair_filter: Callable[[DataFrame], DataFrame] | None = None,
) -> DataFrame:
    """The full LSH pipeline: signatures -> bands -> (optional
    bucket-size cap) -> candidate self-join -> exact Jaccard verify.
    One implementation serves dedup_minhash_lsh (cap=None) and
    dedup_lsh_capped, so the variants cannot drift apart.

    ``pair_filter``, when given, is applied to the candidate frame
    (columns doc_a, doc_b) BEFORE the corpus-sized verify join.  Only
    predicates that are pure functions of the two ids are
    semantics-preserving here (the final pair set is filtered by the
    same predicate either way); for those, filtering early cuts the
    verify join's probe side — cross_split_leakage drops ~2/3 of
    candidates this way (P[same split] = .8^2+.1^2+.1^2 = .66)."""
    # materialize signatures once: the plan references sig three times
    # (bands + both sides of the verify join); without this Spark
    # recomputes the shingle/hash subtree each time. At warehouse scale
    # the same stage would persist to a signatures table.
    # persist, not localCheckpoint: both give single-computation reuse
    # across the three plan references, but checkpointing forces
    # physical planning at BUILD time (~0.3s of driver latency at
    # sf0.1); the cache is small (one row per doc: shingle hashes +
    # 8 ints) and LRU-evicted. At warehouse scale this stage is a
    # persisted signatures table instead.
    from barco_spark.session import eager_persist

    # EAGER (r12): the plan references sig 3-4x (bands + both verify
    # sides); an un-materialized cache under a multi-reference AQE plan
    # re-ran this interpreted-HOF pass up to 8x — see eager_persist.
    sig = eager_persist(
        _hashed_shingles(spark, sf_dir).select(
            "doc_id", "shingles", *_minhash_cols()
        )
    )

    # scale the verify join's exchange width with the corpus so the
    # per-partition SHJ build stays bounded (see _verify_join_parts;
    # identical plan at bench SFs where n_parts == shuffle.partitions)
    n_parts = _verify_join_parts(spark, sf_dir)
    cand = _band_candidates(sig, bucket_cap, dedup_parts=n_parts)
    if pair_filter is not None:
        cand = pair_filter(cand)
    x = sig.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")
    ).repartition(n_parts, "doc_a")
    y = sig.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")
    ).repartition(n_parts, "doc_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    # The verify-join sides are CORPUS-sized (one shingle-array row per
    # doc) and must never be broadcast: Catalyst's static estimate is
    # the pruned zstd parquet bytes, which understate the deserialized
    # array relation ~15x — measured at 500k synthetic docs, a "fits
    # 64 MB" estimate built a >1 GB driver HashedRelation and OOM'd the
    # 8g driver. SHUFFLE_HASH keeps the plan deterministic at every
    # scale: hash-partition both sides on doc id and build the hinted
    # signature side per partition (corpus/P rows — MBs, executor-
    # local) — no sort, no driver relation, and the build shrinks as
    # parallelism grows.
    joined = cand.join(x.hint("shuffle_hash"), "doc_a").join(
        y.hint("shuffle_hash"), "doc_b"
    )
    if metric == "containment":
        # asymmetric: how much of the SMALLER doc's shingle set the
        # other one covers — catches quotes/subsets that Jaccard misses
        # (a 10-line doc inside a 500-line doc has tiny Jaccard but
        # containment ~1)
        score = inter.cast("double") / F.least(F.size("sh_a"), F.size("sh_b"))
        name = "containment"
    else:
        union = F.size("sh_a") + F.size("sh_b") - inter
        score = inter.cast("double") / union
        name = "jaccard"
    return (
        joined.select("doc_a", "doc_b", score.alias(name))
        .filter(F.col(name) >= threshold)
    )


@register(
    "dedup_minhash_lsh",
    f"""
    WITH {_LSH_PAIRS_CTES}
    SELECT doc_a, doc_b, jaccard FROM pairs
    """,
    "dedup",
    doc=(
        "MinHash LSH near-dup pipeline: shingle -> k=8 signature -> 4 bands "
        "-> bucket-join candidates -> exact Jaccard verify >= 0.4. "
        "At scale the band join is the only shuffle; no cross join exists."
    ),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _lsh_pairs(spark, sf_dir)


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------
_HASHED_WORDS_SQL = f"""
      SELECT doc_id, list_transform(string_split(text, ' '), x -> {h28_sql('x')}) AS hs
      FROM documents
"""


def _simhash_sig_sql() -> str:
    bit_sums = ",\n             ".join(
        f"list_sum(list_transform(hs, h -> CASE WHEN (h >> {j}) & 1 = 1 "
        f"THEN 1 ELSE -1 END)) AS b{j}"
        for j in range(SIMHASH_BITS)
    )
    combine = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(SIMHASH_BITS)
    )
    return f"""
    WITH w AS ({_HASHED_WORDS_SQL}),
    bits AS (
      SELECT doc_id,
             {bit_sums}
      FROM w)
    SELECT doc_id, CAST({combine} AS BIGINT) AS simhash
    FROM bits
    """


@register(
    "simhash_signatures",
    _simhash_sig_sql(),
    "dedup",
    doc="28-bit SimHash per document (token-hash bit votes; tokens hashed once).",
)
def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    # explode + one hash aggregate with 28 conditional sums, instead of
    # 28 separate array folds per row: one pass over the token stream,
    # map-side partial aggregation, and a ~25% faster / much cheaper-to-
    # codegen plan (measured at sf0.1). The shuffle moves only
    # (doc_id, 28 ints) partials.
    # all expressions are rendered as SQL strings parsed JVM-side: the
    # 28 bit-vote aggregates + 28-term combine as per-element F.* trees
    # cost >1s of py4j round trips at plan-build time (the same driver-
    # latency fix as the LSH bucket expressions, see SCALING.md)
    h28_s = h28_spark_sql("x")
    from barco_spark.tables import spread_rows

    # row-sized spread below the per-token md5 explode (r12, guide
    # §2.5): A/B dedup_simhash_pairs 0.80 s vs 1.22 s plain — see
    # tables.spread_rows
    d = spread_rows(
        t(spark, sf_dir, "documents"), spark, sf_dir, "doc_id"
    ).select(
        "doc_id",
        F.expr(f"explode(transform(split(text, ' '), x -> {h28_s}))").alias("h"),
    )
    aggs = [
        F.expr(
            f"sum(case when (shiftright(h, {j}) & 1) = 1 then 1 else -1 end)"
        ).alias(f"b{j}")
        for j in range(SIMHASH_BITS)
    ]
    bits = d.groupBy("doc_id").agg(*aggs)
    combine = " + ".join(
        f"(case when b{j} > 0 then {1 << j} else 0 end)"
        for j in range(SIMHASH_BITS)
    )
    return bits.select(
        "doc_id", F.expr(f"cast(({combine}) as bigint)").alias("simhash")
    )


@register(
    "dedup_simhash_pairs",
    f"""
    WITH sig AS ({_simhash_sig_sql()})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
    """,
    "dedup",
    doc=(
        "SimHash near-dup pairs with Hamming distance <= 2, via banded "
        "blocking: the 28-bit simhash splits into 4 blocks of 7 bits; "
        "<= 2 bit flips can touch at most 2 blocks, so every qualifying "
        "pair shares at least one exact block (pigeonhole) — candidates "
        "come from 4 equi self-joins on (block_idx, block_val), then the "
        "exact Hamming check verifies. Identical results to the oracle's "
        "all-pairs scan with no N^2 join anywhere."
    ),
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from barco_spark.session import eager_persist

    # eager persist: both sides of the block join share this subtree —
    # materialize before the double-reference plan runs (eager_persist)
    sig = eager_persist(simhash_signatures(spark, sf_dir))
    n_blocks, block_bits = 4, 7
    mask = (1 << block_bits) - 1
    blocks = F.expr(
        "array("
        + ", ".join(
            f"shiftright(simhash, {block_bits * k}) & {mask}"
            for k in range(n_blocks)
        )
        + ")"
    )
    keyed = sig.select(
        "doc_id", "simhash", F.posexplode(blocks).alias("blk_idx", "blk_val")
    )
    a = keyed.select(
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("sh_a"),
        "blk_idx",
        "blk_val",
    )
    b = keyed.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("sh_b"),
        "blk_idx",
        "blk_val",
    )
    # a pair that matches in several blocks would appear once per match;
    # keep only the FIRST matching block (cheap filter on sh_a^sh_b, no
    # dropDuplicates shuffle needed)
    xor = F.expr("sh_a ^ sh_b")
    first_eq = F.expr(
        "case "
        + " ".join(
            f"when (shiftright(sh_a ^ sh_b, {block_bits * k}) & {mask}) = 0"
            f" then {k}"
            for k in range(n_blocks)
        )
        + " end"
    )
    cand = (
        # corpus-sized pigeonhole side: never broadcast (see _lsh_pairs)
        a.join(b.hint("shuffle_hash"), ["blk_idx", "blk_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(F.col("blk_idx") == first_eq)
    )
    pairs = cand.select(
        "doc_a",
        "doc_b",
        F.bit_count(xor).alias("hamming"),
    )
    return pairs.filter(F.col("hamming") <= 2)


# --------------------------------------------------------------------------
# N-gram Jaccard with prefix blocking
# --------------------------------------------------------------------------
_NGRAM_BLOCK_CAP = 64  # drop boilerplate-prefix hot blocks before the self-join


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH d0 AS (
      SELECT doc_id,
             list_distinct(string_split(text, ' ')) AS wset,
             string_split(text, ' ')[1] || ' ' || string_split(text, ' ')[2] AS block
      FROM documents
      WHERE len(string_split(text, ' ')) >= 2),
    d AS (
      SELECT doc_id, wset, block
      FROM (SELECT *, COUNT(*) OVER (PARTITION BY block) AS bsz FROM d0)
      WHERE bsz <= {_NGRAM_BLOCK_CAP})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(a.wset, b.wset)) AS DOUBLE)
             / (len(a.wset) + len(b.wset) - len(list_intersect(a.wset, b.wset))) AS jaccard
    FROM d a JOIN d b ON a.block = b.block AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.wset, b.wset)) AS DOUBLE)
             / (len(a.wset) + len(b.wset) - len(list_intersect(a.wset, b.wset))) >= 0.5
    """,
    "dedup",
    doc=(
        "Word-set Jaccard with 2-word-prefix blocking (no cross join). "
        "Blocks larger than the cap are dropped before the self-join — "
        "real corpora concentrate on boilerplate prefixes and an "
        "uncapped block is a quadratic hot spot at scale; the window "
        "count co-partitions with the join so the cap costs no extra "
        "shuffle (same pattern as dedup_lsh_capped)."
    ),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = F.split(F.col("text"), " ")
    wb = Window.partitionBy("block")
    d = (
        t(spark, sf_dir, "documents")
        .filter(F.size(w) >= 2)
        .select(
            "doc_id",
            F.array_distinct(w).alias("wset"),
            F.concat_ws(" ", w[0], w[1]).alias("block"),
        )
        .withColumn("bsz", F.count(F.lit(1)).over(wb))
        .filter(F.col("bsz") <= _NGRAM_BLOCK_CAP)
        .drop("bsz")
    )
    a = d.select(
        F.col("doc_id").alias("doc_a"),
        F.col("wset").alias("wset_a"),
        F.col("block"),
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"),
        F.col("wset").alias("wset_b"),
        F.col("block"),
    )
    inter = F.size(F.array_intersect("wset_a", "wset_b"))
    union = F.size("wset_a") + F.size("wset_b") - inter
    return (
        # word-set ARRAY payload on both sides — the worst deserialized/
        # parquet size ratio of the family; never broadcast (see
        # _lsh_pairs)
        a.join(b.hint("shuffle_hash"), "block")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            (inter.cast("double") / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
    )


# --------------------------------------------------------------------------
# Near-dup clusters: connected components over the LSH pair graph
# --------------------------------------------------------------------------
_CLUSTER_DRIVER_MAX_EDGES = 2_000_000  # ~32 MB of (long, long) pairs


@register(
    "dedup_clusters",
    f"""
    WITH RECURSIVE {_LSH_PAIRS_CTES},
    edges AS (
      SELECT doc_a AS s, doc_b AS d FROM pairs
      UNION
      SELECT doc_b AS s, doc_a AS d FROM pairs),
    reach AS (
      SELECT s, d FROM edges
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
      WHERE e.d <> r.s)
    SELECT s AS doc_id, LEAST(s, MIN(d)) AS cluster_id
    FROM reach GROUP BY s
    """,
    "dedup",
    doc=(
        "Duplicate-cluster assignment: transitive closure of the "
        "verified MinHash-LSH pairs. 'Keep one per cluster' needs the "
        "closure — pairwise keep-min drops documents inconsistently "
        "when A~B and B~C but A!~C. Spark side is adaptive: the pair "
        "graph (near-dup pairs only, tiny vs the corpus) is solved by "
        "driver union-find when it fits, else by iterative min-label "
        "propagation (O(cluster diameter) rounds, each one join + one "
        "groupBy on the edge list, lineage cut per round); "
        "the oracle is the same closure as a recursive CTE. At 100 TB "
        "the edge list is tiny relative to the corpus (only near-dup "
        "pairs), so the loop shuffles edges, never documents."
    ),
)
def dedup_clusters(
    spark: SparkSession, sf_dir: str, driver_max_edges: int | None = None
) -> DataFrame:
    from barco_spark.session import persistent_rdd_ids, unpersist_rdds

    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b").persist()
    cap = (
        _CLUSTER_DRIVER_MAX_EDGES if driver_max_edges is None else driver_max_edges
    )
    # Adaptive small-graph path, decided by ONE capped probe job on the
    # raw undirected pairs: the pair graph is the OUTPUT of LSH+verify —
    # near-dup pairs only, orders of magnitude smaller than the corpus —
    # so it usually fits on the driver even when the corpus is 100 TB.
    # Union-find there needs neither direction-doubling nor distinct
    # (duplicate unions are no-ops), so the fast path materializes the
    # LSH subtree exactly once and never builds the edge checkpoint.
    # The distributed loop below remains the fallback (and is forced in
    # tests via driver_max_edges=0). `cap` counts undirected pairs.
    head = pairs.limit(cap + 1).collect()
    if len(head) <= cap:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for r in head:
            a, b = r.doc_a, r.doc_b
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by min keeps the label = min(component) invariant
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        rows = [(n, find(n)) for n in parent]
        # the result is driver-local rows: nothing distributed survives
        pairs.unpersist()
        # Arrow path (r12): the plain-list createDataFrame spun 32
        # Python workers to unpickle 477 rows (0.6-4.3 s; see
        # session.local_rows_df)
        from barco_spark.session import local_rows_df

        return local_rows_df(spark, rows, "doc_id long, cluster_id long")

    before_edges = persistent_rdd_ids(spark)
    edges = (
        pairs.select(F.col("doc_a").alias("s"), F.col("doc_b").alias("d"))
        .union(pairs.select(F.col("doc_b").alias("s"), F.col("doc_a").alias("d")))
        .distinct()
        .localCheckpoint()  # eager: the loop re-reads edges every round
    )
    # blocks pinned by the edge checkpoint: freed below once the result
    # no longer depends on them — a long-lived session otherwise leaks
    # them per call (catalog.clearCache does not cover RDD blocks)
    edge_block_ids = persistent_rdd_ids(spark) - before_edges
    pairs.unpersist()  # edge checkpoint is materialized; cache done

    labels = edges.select("s").distinct().select("s", F.col("s").alias("lbl"))
    prev_round_ids: set[int] = set()
    prev_sum = None
    for _round in range(25):  # >= max cluster diameter at any sane scale
        nbr_min = (
            edges.join(
                labels.select(F.col("s").alias("d"), F.col("lbl").alias("dlbl")),
                "d",
            )
            .groupBy("s")
            .agg(F.min("dlbl").alias("nlbl"))
        )
        before_round = persistent_rdd_ids(spark)
        labels = (
            labels.join(nbr_min, "s", "left")
            .select(
                "s",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))
                ).alias("lbl"),
            )
            .localCheckpoint()  # cut the per-round lineage growth
        )
        # labels only ever decrease -> the sum is a convergence fixpoint
        cur_sum = labels.agg(F.sum("lbl")).collect()[0][0]
        # round N's checkpoint is materialized: round N-1's blocks are
        # unreachable from here on — free them instead of leaking one
        # checkpoint per round for the life of the session
        unpersist_rdds(spark, prev_round_ids)
        prev_round_ids = persistent_rdd_ids(spark) - before_round
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    # only the FINAL labels checkpoint (prev_round_ids) must survive —
    # the returned DataFrame reads it; edges are no longer reachable
    unpersist_rdds(spark, edge_block_ids)
    return labels.select(F.col("s").alias("doc_id"), F.col("lbl").alias("cluster_id"))


# --------------------------------------------------------------------------
# Keep-best canonicalization within fingerprint groups
# --------------------------------------------------------------------------
_FP5_SQL = f"""
    w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    f AS (
      SELECT doc_id,
             list_min(list_transform({shingles5_sql('words')},
               s -> {h28_sql('s')})) AS fingerprint,
             len(list_distinct(words)) AS quality
      FROM w)
"""


@register(
    "dedup_keep_best",
    f"""
    WITH {_FP5_SQL},
    r AS (
      SELECT fingerprint, doc_id, quality,
             ROW_NUMBER() OVER (PARTITION BY fingerprint
                                ORDER BY quality DESC, doc_id) AS rk,
             COUNT(*) OVER (PARTITION BY fingerprint) AS group_size
      FROM f)
    SELECT fingerprint, doc_id AS kept_doc, quality AS best_quality, group_size
    FROM r WHERE rk = 1
    """,
    "dedup",
    doc=(
        "Keep-best canonicalization: block documents by their winnowing "
        "fingerprint (min 28-bit hash over 5-gram shingles, same key as "
        "doc_fingerprint) and keep the highest-quality member per block "
        "(quality = distinct-word count; deterministic doc_id tie-break). "
        "This is the standard 'drop dupes but keep the best copy' "
        "curation step. One shuffle (window over fingerprint) — the "
        "irreducible dedup shuffle; everything before it is a per-row map."
    ),
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("words")
    )
    f = d.select(
        "doc_id",
        fingerprint5(F.col("words")).alias("fingerprint"),
        F.size(F.array_distinct("words")).alias("quality"),
    )
    w = Window.partitionBy("fingerprint").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    wc = Window.partitionBy("fingerprint")
    return (
        f.select(
            "fingerprint",
            "doc_id",
            "quality",
            F.row_number().over(w).alias("rk"),
            F.count(F.lit(1)).over(wc).alias("group_size"),
        )
        .filter(F.col("rk") == 1)
        .select(
            "fingerprint",
            F.col("doc_id").alias("kept_doc"),
            F.col("quality").alias("best_quality"),
            "group_size",
        )
    )


# --------------------------------------------------------------------------
# LSH with hot-bucket capping (the petabyte-scale guard)
# --------------------------------------------------------------------------
# Band buckets larger than the cap are dropped before the self-join: a
# bucket of size s yields s^2/2 candidates, so one boilerplate-heavy
# bucket (same header on millions of pages) can dominate the whole
# join. Oversized buckets carry no dedup signal — their members match
# on a band by construction, and true near-dups still collide in the
# other bands. The cap here is sized to the tiny test corpus (max
# bucket = 3); production uses hundreds.
_LSH_BUCKET_CAP = 2


@register(
    "dedup_lsh_capped",
    f"""
    WITH {_LSH_PAIRS_CTES},
    sized AS (
      SELECT doc_id, band_idx, band_val,
             COUNT(*) OVER (PARTITION BY band_idx, band_val) AS bsz
      FROM bands),
    kept AS (SELECT doc_id, band_idx, band_val FROM sized
             WHERE bsz <= {_LSH_BUCKET_CAP}),
    cand2 AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM kept a JOIN kept b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id),
    v2 AS (
      SELECT c.doc_a, c.doc_b,
             len(list_intersect(x.shingles, y.shingles)) AS n_common,
             len(x.shingles) + len(y.shingles)
               - len(list_intersect(x.shingles, y.shingles)) AS n_union
      FROM cand2 c JOIN sig x ON c.doc_a = x.doc_id
                   JOIN sig y ON c.doc_b = y.doc_id)
    SELECT doc_a, doc_b, CAST(n_common AS DOUBLE) / n_union AS jaccard
    FROM v2 WHERE CAST(n_common AS DOUBLE) / n_union >= 0.4
    """,
    "dedup",
    doc=(
        "dedup_minhash_lsh with mega-band capping: band buckets above "
        "the size cap are dropped before the candidate self-join (window "
        "count over the band key, which co-partitions with the join that "
        "follows — one shuffle serves both). This is the guard that keeps "
        "LSH near-linear at 100 TB, where a single boilerplate bucket "
        "would otherwise produce O(s^2) candidates (SCALING.md)."
    ),
)
def dedup_lsh_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _lsh_pairs(spark, sf_dir, bucket_cap=_LSH_BUCKET_CAP)


# --------------------------------------------------------------------------
# Blocked fuzzy matching (edit distance)
# --------------------------------------------------------------------------
_FUZZY_PREFIX = 200
_FUZZY_MAX_DIST = 10


@register(
    "fuzzy_match_blocked",
    f"""
    WITH {_LSH_PAIRS_CTES},
    sized AS (
      SELECT doc_id, band_idx, band_val,
             COUNT(*) OVER (PARTITION BY band_idx, band_val) AS bsz
      FROM bands),
    kept AS (SELECT doc_id, band_idx, band_val FROM sized
             WHERE bsz <= {_LSH_BUCKET_CAP}),
    fcand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM kept a JOIN kept b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id),
    p AS (SELECT doc_id, substr(text, 1, {_FUZZY_PREFIX}) AS prefix
          FROM documents)
    SELECT c.doc_a, c.doc_b, levenshtein(x.prefix, y.prefix) AS dist
    FROM fcand c JOIN p x ON c.doc_a = x.doc_id
                 JOIN p y ON c.doc_b = y.doc_id
    WHERE levenshtein(x.prefix, y.prefix) <= {_FUZZY_MAX_DIST}
    """,
    "dedup",
    doc=(
        "Blocked fuzzy matching: document-prefix edit distance over "
        "capped MinHash-band candidates (same fingerprint blocking as "
        "dedup_lsh_capped, shared _band_candidates builder). The old "
        "(source, lang) metadata block grew ~quadratically with corpus "
        "size — sum(|block|^2) pairs over a fixed-cardinality key; band "
        "blocking keys on content, so candidate count tracks true "
        "near-dup density and oversized boilerplate buckets are dropped "
        "by the cap before the self-join: near-linear at 100 TB "
        "(SCALING.md). Distance is an exact integer in both engines "
        "(JVM levenshtein = DuckDB levenshtein on ASCII); Spark's "
        "thresholded variant aborts the DP early (O(threshold*n) per "
        "pair, returns -1 above the cap), exact for every kept pair."
    ),
)
def fuzzy_match_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    # persist: the band self-join references the signature subtree on
    # both sides; without this the shingle/minhash work runs twice
    # (same rationale as _lsh_pairs)
    from barco_spark.session import eager_persist

    sig = eager_persist(
        _hashed_shingles(spark, sf_dir).select("doc_id", *_minhash_cols())
    )
    # corpus-scaled exchange width, same SHJ-build bound as _lsh_pairs
    n_parts = _verify_join_parts(spark, sf_dir)
    cand = _band_candidates(sig, _LSH_BUCKET_CAP, dedup_parts=n_parts)
    p = t(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, _FUZZY_PREFIX).alias("prefix")
    )
    x = p.select(
        F.col("doc_id").alias("doc_a"), F.col("prefix").alias("pa")
    ).repartition(n_parts, "doc_a")
    y = p.select(
        F.col("doc_id").alias("doc_b"), F.col("prefix").alias("pb")
    ).repartition(n_parts, "doc_b")
    dist = F.levenshtein(F.col("pa"), F.col("pb"), _FUZZY_MAX_DIST)
    return (
        # text-prefix payload, corpus-sized sides: never broadcast
        # (see _lsh_pairs)
        cand.join(x.hint("shuffle_hash"), "doc_a")
        .join(y.hint("shuffle_hash"), "doc_b")
        .select("doc_a", "doc_b", dist.cast("bigint").alias("dist"))
        .filter(F.col("dist") >= 0)
    )


@register(
    "dedup_containment",
    f"""
    WITH {_LSH_PAIRS_CTES},
    scored AS (
      SELECT doc_a, doc_b,
             CAST(n_common AS DOUBLE)
               / LEAST(len((SELECT shingles FROM sig s WHERE s.doc_id = doc_a)),
                       len((SELECT shingles FROM sig s WHERE s.doc_id = doc_b)))
               AS containment
      FROM verified)
    SELECT doc_a, doc_b, containment
    FROM scored WHERE containment >= 0.6
    """,
    "dedup",
    doc=(
        "Containment near-dup detection over the same LSH candidates: "
        "|A int B| / min(|A|,|B|) — the asymmetric metric that catches "
        "a short document quoted inside a long one, which Jaccard "
        "dilutes toward 0. Same single band-join shuffle as "
        "dedup_minhash_lsh (shared _lsh_pairs builder)."
    ),
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _lsh_pairs(spark, sf_dir, metric="containment", threshold=0.6)


# -- exact-substring dedup (Lee et al. 2022, stride-anchored) ------------

_ESD_W = 50  # window width (Lee et al. use 50-token; chars here)
_ESD_S = 10  # anchor stride


@register(
    "dedup_exact_substring",
    f"""
    WITH anchors AS (
      SELECT doc_id, n_chars, CAST(i AS BIGINT) AS pos,
             (('0x' || substr(md5(substr(text, CAST(i AS INT), {_ESD_W})), 1, 7))::BIGINT) AS h
      FROM documents,
           LATERAL unnest(generate_series(1, length(text) - {_ESD_W - 1}, {_ESD_S})) AS t(i)
      WHERE length(text) >= {_ESD_W}
    ),
    dup AS (SELECT h FROM anchors GROUP BY h HAVING COUNT(*) > 1),
    hits AS (SELECT doc_id, n_chars, pos FROM anchors JOIN dup USING (h)),
    lagd AS (
      SELECT doc_id, n_chars, pos,
             LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS ppos
      FROM hits
    ),
    isl AS (
      SELECT doc_id, n_chars, pos,
             SUM(CASE WHEN ppos IS NULL OR pos > ppos + {_ESD_W} THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM lagd
    ),
    spans AS (
      SELECT doc_id, ANY_VALUE(n_chars) AS n_chars, island,
             MIN(pos) AS s, MAX(pos) + {_ESD_W - 1} AS e
      FROM isl GROUP BY doc_id, island
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(e - s + 1) AS BIGINT) AS dup_chars,
           CAST(SUM(e - s + 1) AS DOUBLE) / ANY_VALUE(n_chars) AS dup_ratio
    FROM spans
    GROUP BY doc_id
    """,
    "dedup",
    doc=(
        "Exact-substring duplicate spans (Lee et al. 2022's suffix-"
        "array dedup, re-expressed for a shuffle engine): every "
        f"{_ESD_W}-char window at stride {_ESD_S} is hash-anchored; "
        "windows occurring 2+ times corpus-wide mark their anchors as "
        "duplicated; per-document anchor runs merge into maximal spans "
        "(gaps-and-islands over one doc_id window). All-integer span "
        "arithmetic keeps the oracle exact. Position-strided anchors "
        "catch equal-alignment duplicates (whole-document copies, "
        "fixed-offset boilerplate); copies shifted by a non-multiple "
        "of the stride need content-defined anchors — "
        "doc_rolling_fingerprints' winnowing is that variant at word "
        "level. Scale: anchor volume is chars/stride (the known cost "
        "of substring dedup — Lee et al. materialize the full suffix "
        "array instead); one shuffle on the window hash, one on "
        "doc_id; the span merge is unchanged under any anchor rule."
    ),
)
def dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from barco_spark.operators.text import h28_spark_sql

    d = t(spark, sf_dir, "documents").filter(F.length("text") >= _ESD_W)
    # hash every window BEFORE exploding ((pos, h) structs): exploding
    # positions first would duplicate the full text into every anchor
    # row just to substr it — 5x the explode width, measured ~7% slower
    # at sf0.1 and far worse at real document sizes
    hexpr = h28_spark_sql(f"substr(text, i, {_ESD_W})")
    anchors = d.select(
        "doc_id",
        "n_chars",
        F.explode(
            F.expr(
                f"transform(sequence(1, length(text) - {_ESD_W - 1}, {_ESD_S}),"
                f" i -> named_struct('pos', cast(i as bigint), 'h', {hexpr}))"
            )
        ).alias("a"),
    ).select(
        "doc_id",
        "n_chars",
        F.col("a.pos").alias("pos"),
        F.col("a.h").alias("h"),
    )
    # duplicated anchors via ONE window count over the anchor hash
    # (r12, guide §1.2/§2.3): the agg+join form referenced `anchors`
    # twice, so the md5-per-window explode — the dominant pass — ran
    # TWICE (two sequential ~0.6 s single-task stages in the profile).
    # The window count co-partitions exactly like the join would (same
    # hash exchange on h), every rep measured faster (min 2.53 s vs
    # 3.74 s, ABBA interleaved same-JVM), and the row set is identical
    # (h kept iff its corpus-wide count > 1) — the _band_candidates
    # bucket-cap idiom applied to the dup test.
    wh = Window.partitionBy("h")
    hits = (
        anchors.withColumn("c", F.count(F.lit(1)).over(wh))
        .filter(F.col("c") > 1)
        .select("doc_id", "n_chars", "pos")
    )
    worder = Window.partitionBy("doc_id").orderBy("pos")
    lagd = hits.withColumn("ppos", F.lag("pos").over(worder))
    isl = lagd.withColumn(
        "island",
        F.sum(
            F.when(
                F.col("ppos").isNull() | (F.col("pos") > F.col("ppos") + _ESD_W),
                1,
            ).otherwise(0)
        ).over(worder),
    )
    spans = isl.groupBy("doc_id", "island").agg(
        F.any_value("n_chars").alias("n_chars"),
        F.min("pos").alias("s"),
        (F.max("pos") + F.lit(_ESD_W - 1)).alias("e"),
    )
    return spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("bigint").alias("dup_chars"),
        (
            F.sum(F.col("e") - F.col("s") + 1).cast("double")
            / F.any_value("n_chars")
        ).alias("dup_ratio"),
    )


# -- incremental dedup: today's batch vs the existing index ---------------


def _melt_dup_keys(df: DataFrame) -> DataFrame:
    """(kind, key) rows: each document's exact digest and its minfp
    fingerprint as ONE uniform key stream, so the index is scanned and
    fingerprinted ONCE for both key types (separate per-kind probe
    joins re-ran the md5/shingle work per kind: measured 36 s -> 20 s
    at a 100k-doc index, and the gap is the whole index-side cost at
    petabyte scale)."""
    return df.select(
        F.explode(
            F.expr(
                "array(named_struct('kind','fp','key',fp),"
                " named_struct('kind','minfp','key',cast(minfp as string)))"
            )
        ).alias("kk")
    ).select("kk.kind", "kk.key")


@register(
    "dedup_incremental",
    f"""
    WITH fp AS (
      SELECT doc_id, md5(text) AS fp,
             list_min(list_transform(
               {shingles5_sql('words')}, s -> {h28_sql('s')})) AS minfp
      FROM (SELECT doc_id, text, string_split(text, ' ') AS words
            FROM documents)
    ),
    existing AS (SELECT * FROM fp WHERE doc_id % 2 = 0),
    incoming AS (SELECT * FROM fp WHERE doc_id % 2 = 1)
    SELECT i.doc_id,
           EXISTS (SELECT 1 FROM existing e WHERE e.fp = i.fp) AS exact_dup,
           EXISTS (SELECT 1 FROM existing e WHERE e.minfp = i.minfp)
             AS near_dup,
           NOT (EXISTS (SELECT 1 FROM existing e WHERE e.fp = i.fp)
                OR EXISTS (SELECT 1 FROM existing e WHERE e.minfp = i.minfp))
             AS kept
    FROM incoming i
    """,
    "dedup",
    doc=(
        "Incremental dedup — the daily-crawl shape: flag each INCOMING "
        "document (doc_id odd here; date-partitioned in production) "
        "that exactly (content digest) or nearly (winnowing min-shingle "
        "fingerprint, shared with doc_fingerprint) duplicates the "
        "EXISTING index (doc_id even). The incoming batch is tiny "
        "relative to the index, so its key set is BROADCAST into two "
        "semi-join probes over the index scan — the index is scanned "
        "once per key type and NEVER shuffled, which is the only "
        "posture that survives a petabyte index with a daily batch."
    ),
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from barco_spark.operators.text import fingerprint5
    from barco_spark.tables import spread_rows

    d = spread_rows(
        t(spark, sf_dir, "documents"), spark, sf_dir, "doc_id"
    ).select(
        "doc_id",
        F.md5(F.col("text")).alias("fp"),
        fingerprint5(F.split(F.col("text"), " ")).alias("minfp"),
    )
    existing = d.filter(F.col("doc_id") % 2 == 0)
    # the batch side is small and referenced twice (key probe + flag
    # join): persist it, never the index
    from barco_spark.session import eager_persist

    incoming = eager_persist(d.filter(F.col("doc_id") % 2 == 1))
    # ONE index pass: both key kinds melted to a uniform stream and
    # probed against the broadcast batch keys in a single equi-join;
    # .distinct() keeps the matched set bounded by the batch size
    # matched is referenced twice (exact + near splits) and is bounded
    # by the BATCH key count — eager-persist it so the index-side melt
    # join (the query's dominant pass at a petabyte index) runs ONCE,
    # not once per broadcast build.  r12 A/B: wall-neutral at sf0.1
    # (the two ~0.6 s duplicate builds overlap on idle cores) but the
    # event log shows 2 index passes -> 1, which is the whole point of
    # this operator's "index scanned once" posture (guide §5/§2.4)
    matched = eager_persist(
        _melt_dup_keys(existing)
        .join(F.broadcast(_melt_dup_keys(incoming).distinct()), ["kind", "key"])
        .distinct()
    )
    hit_exact = (
        matched.filter(F.col("kind") == "fp")
        .select(F.col("key").alias("fp"))
        .withColumn("x", F.lit(True))
    )
    hit_near = (
        matched.filter(F.col("kind") == "minfp")
        .select(F.col("key").alias("minfp_s"))
        .withColumn("nx", F.lit(True))
    )
    out = (
        incoming.withColumn("minfp_s", F.col("minfp").cast("string"))
        .join(F.broadcast(hit_exact), "fp", "left")
        .join(F.broadcast(hit_near), "minfp_s", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("x"), F.lit(False)).alias("exact_dup"),
            F.coalesce(F.col("nx"), F.lit(False)).alias("near_dup"),
        )
    )
    return out.withColumn(
        "kept", ~(F.col("exact_dup") | F.col("near_dup"))
    )


@register(
    "cross_source_dup_matrix",
    f"""
    WITH {_LSH_PAIRS_CTES},
    src AS (SELECT doc_id, source FROM documents)
    SELECT LEAST(a.source, b.source) AS source_x,
           GREATEST(a.source, b.source) AS source_y,
           COUNT(*) AS n_pairs,
           CAST(SUM(CASE WHEN a.source = b.source THEN 1 ELSE 0 END)
                AS BIGINT) AS n_within
    FROM pairs p
    JOIN src a ON p.doc_a = a.doc_id
    JOIN src b ON p.doc_b = b.doc_id
    GROUP BY 1, 2
    ORDER BY source_x, source_y
    """,
    "dedup",
    doc=(
        "Cross-source duplication matrix: the verified near-duplicate "
        "pairs (dedup_minhash_lsh's shared LSH pipeline) attributed to "
        "unordered provenance pairs — which sources copy from which, "
        "the readout that drives source-level dedup policy and "
        "licensing review. The doc->source lookup is two broadcast "
        "joins of a 2-column table onto the (tiny) pair graph; the "
        "matrix is |sources|^2-bounded."
    ),
)
def cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    src = t(spark, sf_dir, "documents").select("doc_id", "source")
    a = src.selectExpr("doc_id AS doc_a", "source AS source_a")
    b = src.selectExpr("doc_id AS doc_b", "source AS source_b")
    joined = pairs.join(F.broadcast(a), "doc_a").join(F.broadcast(b), "doc_b")
    return (
        joined.groupBy(
            F.least("source_a", "source_b").alias("source_x"),
            F.greatest("source_a", "source_b").alias("source_y"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(
                F.when(F.col("source_a") == F.col("source_b"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_within"),
        )
        .orderBy("source_x", "source_y")
    )


@register(
    "minhash_estimator_calibration",
    f"""
    WITH {_LSH_PAIRS_CTES},
    est AS (
      SELECT p.doc_a, p.doc_b, p.jaccard,
             ({" + ".join(f"CASE WHEN x.s{i} = y.s{i} THEN 1 ELSE 0 END" for i in range(8))})
               AS n_agree
      FROM pairs p
      JOIN sig x ON p.doc_a = x.doc_id
      JOIN sig y ON p.doc_b = y.doc_id
    )
    SELECT COUNT(*) AS n_pairs,
           CAST(SUM(n_agree) AS BIGINT) AS total_agreements,
           CAST(SUM(n_agree) AS DOUBLE) / (8 * COUNT(*)) AS mean_est_jaccard,
           CAST(SUM(CAST(jaccard AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
             AS mean_exact_jaccard
    FROM est
    """,
    "dedup",
    doc=(
        "MinHash estimator calibration: per verified pair, the "
        "signature-agreement estimate of Jaccard (matching components "
        "/ k=8) pooled against the exact shingle Jaccard — the "
        "diagnostic that tells you whether k is large enough before "
        "trusting LSH candidate thresholds at scale. Both estimator "
        "and truth are deterministic, so even the estimator's error "
        "is oracle-exact. Signature lookups are two joins of the "
        "(tiny) pair graph against the signature table."
    ),
)
def minhash_estimator_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from barco_spark.session import eager_persist

    sig = eager_persist(
        _hashed_shingles(spark, sf_dir).select(
            "doc_id", "shingles", *_minhash_cols()
        )
    )
    pairs = _lsh_pairs(spark, sf_dir).select("doc_a", "doc_b", "jaccard")
    x = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"s{i}").alias(f"xa{i}") for i in range(8)],
    )
    y = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"s{i}").alias(f"yb{i}") for i in range(8)],
    )
    agree = sum(
        F.when(F.col(f"xa{i}") == F.col(f"yb{i}"), 1).otherwise(0)
        for i in range(8)
    )
    # broadcast the PAIR side (banding-bounded), stream the signature
    # table both times — the opposite direction would broadcast a
    # corpus-sized frame
    j1 = x.join(F.broadcast(pairs), "doc_a")
    est = y.join(F.broadcast(j1), "doc_b").select(
        "jaccard", agree.alias("n_agree")
    )
    return est.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("n_agree").cast("bigint").alias("total_agreements"),
        (F.sum("n_agree").cast("double") / (8 * F.count(F.lit(1)))).alias(
            "mean_est_jaccard"
        ),
        (
            F.sum(F.col("jaccard").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_exact_jaccard"),
    )


@register(
    "dedup_cluster_size_histogram",
    f"""
    WITH RECURSIVE {_LSH_PAIRS_CTES},
    edges AS (
      SELECT doc_a AS s, doc_b AS d FROM pairs
      UNION
      SELECT doc_b AS s, doc_a AS d FROM pairs),
    reach AS (
      SELECT s, d FROM edges
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
      WHERE e.d <> r.s),
    cl AS (
      SELECT s AS doc_id, LEAST(s, MIN(d)) AS cluster_id
      FROM reach GROUP BY s),
    sizes AS (SELECT cluster_id, COUNT(*) AS csize FROM cl GROUP BY cluster_id)
    SELECT CAST(csize AS BIGINT) AS cluster_size,
           COUNT(*) AS n_clusters,
           CAST(csize * COUNT(*) AS BIGINT) AS n_docs
    FROM sizes GROUP BY csize ORDER BY cluster_size
    """,
    "dedup",
    doc=(
        "Cluster-size distribution of the near-duplicate graph: how "
        "many components of each size (docs with no near-dup pair are "
        "not in the graph — singletons are the corpus minus these "
        "rows). THE go/no-go readout before a dedup rewrite: a long "
        "tail of 2-3-doc clusters means keep-one-per-cluster is cheap; "
        "a few giant components mean a template family where "
        "keep-best selection and the hot-bucket caps matter. Built on "
        "dedup_clusters' adaptive closure (driver union-find under a "
        "probe cap, distributed min-label propagation above it), then "
        "two tiny hash aggregates over (doc, cluster) labels."
    ),
)
def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    cl = dedup_clusters(spark, sf_dir)
    sizes = cl.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("csize"))
    return (
        sizes.groupBy(F.col("csize").cast("bigint").alias("cluster_size"))
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("bigint")
            .alias("n_docs"),
        )
        .orderBy("cluster_size")
    )


@register(
    "dedup_threshold_sweep",
    f"""
    WITH {_LSH_PAIRS_CTES},
    b AS (
      SELECT LEAST(CAST(floor(jaccard * 10) AS BIGINT), 9) AS bucket,
             COUNT(*) AS n,
             SUM(CAST(jaccard AS DECIMAL(18,6))) AS sj
      FROM pairs GROUP BY 1)
    SELECT CAST(bucket * 10 AS BIGINT) AS threshold_pct,
           CAST(SUM(n) OVER (ORDER BY bucket DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS pairs_at_or_above,
           CAST(SUM(sj) OVER (ORDER BY bucket DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE)
             / SUM(n) OVER (ORDER BY bucket DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS mean_jaccard_above
    FROM b ORDER BY threshold_pct
    """,
    "dedup",
    doc=(
        "Dedup-threshold tuning sweep: for every 0.1-wide Jaccard "
        "band, how many verified near-dup pairs sit at-or-above it and "
        "their mean similarity — the one-pass readout that prices "
        "'how much does the corpus shrink if we dedup at 0.6 vs 0.8' "
        "BEFORE committing to a rewrite. Pairs are bucketed by "
        "floor(jaccard*10) (identical doubles on both engines, so "
        "bucketing is consistent), then a 10-row descending cumulative "
        "window turns the histogram into at-or-above counts — no "
        "per-threshold re-scan, no threshold join. Decimal similarity "
        "sums, one double division per row (the registry's exactness "
        "convention). All work after the shared LSH pipeline is a "
        "10-row aggregate."
    ),
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _lsh_pairs(spark, sf_dir).select("jaccard")
    b = pairs.groupBy(
        F.least(F.floor(F.col("jaccard") * 10).cast("bigint"), F.lit(9)).alias(
            "bucket"
        )
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("jaccard").cast("decimal(18,6)")).alias("sj"),
    )
    w = Window.orderBy(F.col("bucket").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        b.select(
            (F.col("bucket") * 10).cast("bigint").alias("threshold_pct"),
            F.sum("n").over(w).cast("bigint").alias("pairs_at_or_above"),
            (
                F.sum("sj").over(w).cast("double") / F.sum("n").over(w)
            ).alias("mean_jaccard_above"),
        )
        .orderBy("threshold_pct")
    )


# --------------------------------------------------------------------------
# Cross-split leakage (train/eval contamination at document granularity)
# --------------------------------------------------------------------------
_SPLIT_CASE_SQL = (
    "CASE WHEN {h} % 100 < 80 THEN 'train' "
    "WHEN {h} % 100 < 90 THEN 'val' ELSE 'test' END"
)


def _split_col(doc_id: str) -> Column:
    """train/val/test from a doc id — the SAME 80/10/10 hash split
    train_split_assign uses (operators/sampling.py), so 'split' means
    one thing engine-wide. A pure function of the id: no split table,
    no join, no shuffle."""
    b = h28(F.col(doc_id).cast("string")) % 100
    return (
        F.when(b < 80, F.lit("train"))
        .when(b < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )


@register(
    "cross_split_leakage",
    f"""
    WITH {_LSH_PAIRS_CTES}
    SELECT * FROM (
      SELECT doc_a, doc_b,
             {_SPLIT_CASE_SQL.format(h=h28_sql("CAST(doc_a AS VARCHAR)"))} AS split_a,
             {_SPLIT_CASE_SQL.format(h=h28_sql("CAST(doc_b AS VARCHAR)"))} AS split_b,
             jaccard
      FROM pairs)
    WHERE split_a <> split_b
    """,
    "dedup",
    doc=(
        "Train/eval leakage detector: MinHash-LSH near-dup pairs whose "
        "endpoints land in DIFFERENT splits of the 80/10/10 hash split "
        "(train_split_assign's exact bucketing) — each row is an eval "
        "document whose near-duplicate leaked into training, the "
        "doc-level complement of decontaminate_ngram_overlap's n-gram "
        "check (ref: the reference's dedup surface has no split "
        "awareness; this is the curation step every pretraining corpus "
        "runs before freezing an eval set). Inherits dedup_minhash_lsh's "
        "machinery unchanged — banded candidates, UNCAPPED buckets "
        "(bucket_cap=None, matching the oracle's CTEs: a leakage check "
        "must not drop candidates from hot buckets, so completeness "
        "wins over the dedup_lsh_capped scale guard; at corpus scale "
        "run the capped variant first and this one on the survivors), "
        "SHJ-pinned verify — and the split is a pure function of the "
        "doc id, so the plan adds two codegen'd hash columns and a "
        "filter to the proven pair plan: zero extra joins or shuffles "
        "at any scale. r10: that filter is PUSHED BELOW the verify "
        "join (pair_filter on the candidate frame) — same-split "
        "candidates, ~2/3 of the stream under 80/10/10, never reach "
        "the shingle-intersection work; identical result set since "
        "the predicate depends only on the ids."
    ),
)
def cross_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the split predicate is a pure function of the two ids, so it is
    # pushed BELOW the corpus-sized verify join (r10): same-split
    # candidate pairs (~2/3 of all candidates under 80/10/10) never
    # reach the shingle-intersection work. Result set is identical —
    # the post-verify filter below would drop exactly those pairs.
    pairs = _lsh_pairs(
        spark,
        sf_dir,
        pair_filter=lambda c: c.filter(
            _split_col("doc_a") != _split_col("doc_b")
        ),
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        _split_col("doc_a").alias("split_a"),
        _split_col("doc_b").alias("split_b"),
        "jaccard",
    ).filter(F.col("split_a") != F.col("split_b"))
