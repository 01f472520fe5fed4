"""Importance-driven data selection + tokenizer-prep operators.

Three pretraining-corpus operators the reference has no analogue for
(barco/PolarStreams has zero text processing — SURVEY.md §2 marks the
relational/text categories ABSENT); all follow public method papers:

- ``dsir_importance_weights``: DSIR-style data selection (Xie et al.
  2023, "Data Selection for Language Models via Importance Resampling")
  — every document is scored by the log-likelihood ratio of its hashed
  n-gram features under a *target* bag-of-ngrams model (here: the
  ``lang='en'`` slice) versus the *raw* corpus model, and the top band
  is kept.  To stay bit-identical with the DuckDB oracle the per-bucket
  log counts are quantized to integers ``floor(log2(c+1))`` (exact in
  IEEE for every int; the cross-row per-doc sum is an integer sum), so
  the only double is the final length-normalizing division and the
  exact-rational ``percent_rank``.
- ``weighted_sample_priority``: priority sampling (Duffield, Lund,
  Thorup 2007) — a deterministic weighted sample without replacement:
  priority ``w / u`` with ``u`` a (0,1] uniform derived from the
  portable 28-bit hash of the key; take the top-k priorities.  Kept
  fully integer (``w * 2^28 div (h28+1)``) so both engines rank the
  same order with zero float folklore.
- ``bpe_merge_pairs``: the statistics pass of one BPE merge iteration
  (Sennrich et al. 2016) — count adjacent symbol pairs across the
  corpus, weighted by word frequency.  The pair generation runs over
  the *distinct word vocabulary* (Zipf-bounded), not the corpus: the
  corpus-sized pass is a single word-count hash aggregation, exactly
  how production BPE trainers structure the first scan.

Scale notes (100 TB posture):
- DSIR: the two feature-count tables are bounded by the hash-bucket
  space (``N_BUCKETS``), not the corpus — the per-bucket score table is
  a broadcast back onto the exploded corpus, so scoring is map-only
  after two hash aggregations that share one explode.  This is the
  whole point of DSIR's hashed features: model size is O(buckets).
  The global percent_rank is exact here (what the oracle can check);
  at petabyte scale the band threshold comes from ``approxQuantile``
  and the window disappears — selection semantics unchanged.
- Priority sampling: one scan, one ``TakeOrderedAndProject`` (top-k
  never globally sorts).  The sample is reproducible under retries and
  independent of partitioning — the estimator's variance guarantees
  come from the cited paper.
- BPE pairs: per-word pair expansion costs O(word_len) per *distinct*
  word (words are bounded-short tokens, not documents, so the
  substring loop is constant-bounded); the shuffle carries (pair,
  partial count) — vocabulary-sized, map-side combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from barco_spark.operators.text import h28, h28_sql, words_col
from barco_spark.registry import register
from barco_spark.tables import t

N_BUCKETS = 8192  # hashed-ngram feature space (DSIR uses 10k)
KEEP_TOP = 0.2  # keep the top-20% importance band
TARGET_LANG = "en"  # the "target distribution" slice
_POW28 = 268435456  # 2^28, the h28 value space


def _feats(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, b): every unigram + word-bigram feature occurrence,
    hashed into ``N_BUCKETS`` buckets.  A UNION of two explodes, NOT one
    explode of ``concat(ws, bigrams)``: the concat materializes a
    second combined array per row before exploding, and measures ~40%
    slower at sf0.1 (3.6 s vs 2.6 s) despite scanning twice — explode
    of a direct column stays inside codegen with no array copy."""
    from barco_spark.operators.text import kgrams

    w = docs.select("doc_id", "lang", words_col().alias("ws"))
    uni = w.select("doc_id", "lang", F.explode("ws").alias("f"))
    bi = w.select(
        "doc_id", "lang", F.explode(kgrams(F.col("ws"), 2)).alias("f")
    )
    return uni.unionByName(bi).select(
        "doc_id", "lang", (h28(F.col("f")) % N_BUCKETS).alias("b")
    )


def _bigrams_sql(ws: str) -> str:
    """DuckDB rendering of kgrams(ws, 2) (1-based list indexing, <2-word
    docs fall back to the whole text — text.kgrams' CASE contract)."""
    return (
        f"CASE WHEN len({ws}) >= 2"
        f" THEN list_transform(range(1, len({ws})),"
        f" i -> {ws}[i] || ' ' || {ws}[i+1])"
        f" ELSE [array_to_string({ws}, ' ')] END"
    )


@register(
    "dsir_importance_weights",
    f"""
    WITH w AS (
      SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents
    ),
    feats AS (
      SELECT doc_id, lang, unnest(ws) AS f FROM w
      UNION ALL
      SELECT doc_id, lang, unnest({_bigrams_sql('ws')}) AS f FROM w
    ),
    fb AS (
      SELECT doc_id, lang, {h28_sql('f')} % {N_BUCKETS} AS b FROM feats
    ),
    cr AS (SELECT b, COUNT(*) AS c FROM fb GROUP BY b),
    ct AS (SELECT b, COUNT(*) AS c FROM fb
           WHERE lang = '{TARGET_LANG}' GROUP BY b),
    sc AS (
      SELECT cr.b,
             CAST(FLOOR(LOG2(COALESCE(ct.c, 0) + 1)) AS BIGINT)
             - CAST(FLOOR(LOG2(cr.c + 1)) AS BIGINT) AS s
      FROM cr LEFT JOIN ct ON cr.b = ct.b
    ),
    doc AS (
      SELECT fb.doc_id,
             any_value(fb.lang) AS lang,
             COUNT(*) AS n_feats,
             CAST(SUM(sc.s) AS BIGINT) AS weight_q
      FROM fb JOIN sc ON fb.b = sc.b
      GROUP BY fb.doc_id
    ),
    ranked AS (
      SELECT doc_id, lang, n_feats, weight_q,
             CAST(weight_q AS DOUBLE) / n_feats AS avg_logratio,
             PERCENT_RANK() OVER (
               ORDER BY CAST(weight_q AS DOUBLE) / n_feats, doc_id
             ) AS pct
      FROM doc
    )
    SELECT doc_id, lang, n_feats, weight_q, avg_logratio, pct,
           pct >= {1 - KEEP_TOP} AS kept
    FROM ranked
    """,
    "text",
    doc=(
        "DSIR-style importance weighting: hashed unigram+bigram bag "
        "features, per-bucket integer-quantized log-likelihood ratio "
        "of the target (lang='en') model vs the raw corpus model, "
        "length-normalized per-doc score, top-20% band kept. Feature "
        "tables are bucket-space-bounded and broadcast; scoring is "
        "map-only after one shared explode."
    ),
)
def dsir_importance_weights(
    spark: SparkSession, sf_dir: str, small_max_docs: int | None = None
) -> DataFrame:
    # Adaptive plan, decided by one metadata-cheap count (the
    # dedup_clusters pattern). Both shapes produce identical integers:
    #
    # - SMALL corpora: re-explode per pass with the raw+target counts
    #   fused into one aggregation (count_if). Re-exploding twice is
    #   cheaper than materializing anything at this size.
    # - LARGE corpora: ONE explode+hash pass reduced to per-(doc,
    #   bucket) counts and persisted; the model agg and the scoring
    #   join both read the reduced frame, so the per-occurrence md5 —
    #   the dominant cost — runs once (24 s -> 15 s at 50k synthetic
    #   docs, 228 s -> 198 s at 500k; but 2x SLOWER under ~20k docs,
    #   where the persist round-trip outweighs a second explode). The
    #   persisted frame is |docs| x |distinct buckets per doc| rows,
    #   Zipf-compressed far below occurrence count; at 100 TB use
    #   MEMORY_AND_DISK or accept the recompute.
    from barco_spark.tables import scan_rows, spread_rows

    # row-sized spread below the unigram+bigram explode + md5 bucket
    # hash (r12, guide §2.5): A/B 1.12 s vs 1.87 s plain at sf0.1 —
    # see tables.spread_rows.  Applied to the _feats feeder in BOTH
    # adaptive paths; the path decision reads the cached footer count
    # (scan_rows), never the spread frame (a count() on the
    # repartitioned frame would execute the exchange).
    docs = spread_rows(
        t(spark, sf_dir, "documents"), spark, sf_dir, "doc_id"
    )
    qlog = lambda c: F.floor(F.log2(c + F.lit(1))).cast("bigint")  # noqa: E731
    fbd = None
    cutoff = 20_000 if small_max_docs is None else small_max_docs
    if scan_rows(spark, sf_dir, "documents") < cutoff:
        fb = _feats(docs)
        sc = (
            fb.groupBy("b")
            .agg(
                F.count(F.lit(1)).alias("c"),
                F.count_if(F.col("lang") == TARGET_LANG).alias("c_t"),
            )
            .select("b", (qlog(F.col("c_t")) - qlog(F.col("c"))).alias("s"))
        )
        doc = (
            fb.join(F.broadcast(sc), "b")
            .groupBy("doc_id")
            .agg(
                F.any_value("lang").alias("lang"),
                F.count(F.lit(1)).alias("n_feats"),
                F.sum("s").alias("weight_q"),
            )
        )
    else:
        from barco_spark.session import eager_persist

        fbd = eager_persist(
            _feats(docs)
            .groupBy("doc_id", "lang", "b")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        sc = (
            fbd.groupBy("b")
            .agg(
                F.sum("cnt").alias("c"),
                F.sum(
                    F.when(
                        F.col("lang") == TARGET_LANG, F.col("cnt")
                    ).otherwise(0)
                ).alias("c_t"),
            )
            .select("b", (qlog(F.col("c_t")) - qlog(F.col("c"))).alias("s"))
        )
        doc = (
            fbd.join(F.broadcast(sc), "b")
            .groupBy("doc_id")
            .agg(
                F.any_value("lang").alias("lang"),
                F.sum("cnt").alias("n_feats"),
                F.sum(F.col("s") * F.col("cnt")).alias("weight_q"),
            )
        )
    avg = F.col("weight_q").cast("double") / F.col("n_feats")
    win = Window.orderBy(avg, "doc_id")
    out = doc.select(
        "doc_id",
        "lang",
        "n_feats",
        "weight_q",
        avg.alias("avg_logratio"),
        F.percent_rank().over(win).alias("pct"),
    ).withColumn("kept", F.col("pct") >= F.lit(1 - KEEP_TOP))
    if fbd is not None:
        # pagerank/_kcore_peel cache discipline (r8): checkpoint the
        # doc-level result (7 narrow columns — pagerank's "node-sized"
        # class) and release the WIDER per-(doc, bucket) counts cache
        # at the call boundary instead of leaking it for the session
        # (r9 scale study: 1 persisted RDD after every call at 500k-1M)
        out = out.localCheckpoint()
        fbd.unpersist()
    return out


@register(
    "weighted_sample_priority",
    f"""
    WITH pr AS (
      SELECT doc_id, source, n_chars,
             (n_chars * {_POW28}) // ({h28_sql('CAST(doc_id AS VARCHAR)')} + 1)
               AS priority
      FROM documents
    )
    SELECT doc_id, source, n_chars, priority
    FROM pr
    ORDER BY priority DESC, doc_id
    LIMIT 100
    """,
    "sampling",
    doc=(
        "Priority sampling (Duffield-Lund-Thorup): deterministic "
        "weighted sample without replacement — priority = weight / "
        "hash-uniform, take the global top-k. All-integer priorities "
        "(w * 2^28 div (h28+1)) make the rank order engine-exact; the "
        "plan is one scan + TakeOrderedAndProject (no global sort), "
        "reproducible under retries and partitioning changes."
    ),
)
def weighted_sample_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from barco_spark.operators.text import h28_spark_sql

    d = t(spark, sf_dir, "documents")
    pr = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.expr(
            f"(n_chars * cast({_POW28} as bigint)) div "
            f"({h28_spark_sql('cast(doc_id as string)')} + 1)"
        ).alias("priority"),
    )
    return pr.orderBy(F.col("priority").desc(), "doc_id").limit(100)


@register(
    "bpe_merge_pairs",
    """
    WITH wc AS (
      SELECT w, COUNT(*) AS wcount
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE length(w) >= 2
      GROUP BY w
    ),
    pairs AS (
      SELECT substr(w, CAST(i AS INT), 2) AS pair, wcount
      FROM wc, LATERAL unnest(generate_series(1, length(w) - 1)) AS t(i)
    )
    SELECT pair, CAST(SUM(wcount) AS BIGINT) AS pair_count
    FROM pairs
    GROUP BY pair
    ORDER BY pair_count DESC, pair
    LIMIT 20
    """,
    "text",
    doc=(
        "BPE merge statistics (one Sennrich-2016 iteration): adjacent "
        "character-pair counts weighted by word frequency. The "
        "corpus-sized pass is ONE word-count hash aggregation; pair "
        "expansion runs over the distinct vocabulary only "
        "(Zipf-bounded), exactly how production BPE trainers scan."
    ),
)
def bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(words_col()).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wcount"))
    )
    pairs = wc.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))")
        ).alias("pair"),
        "wcount",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wcount").cast("bigint").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "pair")
        .limit(20)
    )
