"""Corpus language-model / IR operators for LLM training-data pipelines.

Round-4 additions beyond quality.py: the statistical-LM and
information-retrieval primitives a 100 TB curation pipeline runs after
the heuristic filters:

- ``unigram_logprob_quality``: CCNet-style LM quality scoring — train a
  corpus unigram model (one hash aggregation), score every document by
  its mean token log-probability, and band-filter per language the way
  CCNet keeps the middle perplexity band.  To stay bit-identical with
  the DuckDB oracle the log-prob is quantized to integer ``floor(log2
  (count))`` per token (exact in IEEE for every int, and a cross-row
  *integer* sum), so the only doubles are one final division and the
  exact-rational ``percent_rank``.
- ``dedup_chunk_rewrite``: the C4 dedup *transform* (quality.py's
  ``dedup_chunk_share`` is the diagnostic): every fixed-width chunk
  that occurs more than once corpus-wide is dropped except its first
  occurrence (min ``(doc_id, position)``), and documents are
  reassembled from their surviving chunks.
- ``inverted_index_topdocs``: search-shard build — token -> document
  frequency + top-k posting list ranked by term frequency.
- ``bigram_lift_top``: collocation mining; ranks bigrams by lift
  ``P(w1 w2) / (P(w1) P(w2))`` (monotone to PMI, but computable as one
  division of exact integer products — ln() is not cross-engine exact).
- ``doc_chunk_overlap``: RAG chunking — overlapping sliding windows of
  ``CHUNK_W`` tokens with stride ``CHUNK_S``, the standard
  retrieval-corpus prep step.

Scale notes (100 TB posture):
- The unigram model is a (token, count) table bounded by vocabulary
  size, not corpus size — it is broadcast back to the exploded corpus,
  so the scoring pass is map-only after one hash aggregation.  The
  per-language band filter uses a partitioned window here (exact, and
  what the oracle can check); at petabyte scale the two thresholds per
  language come from ``approxQuantile`` and the window disappears —
  the band semantics are unchanged.
- ``dedup_chunk_rewrite`` shuffles (chunk-hash, doc, pos) rows — the
  exact-dedup shape; the rebuild groups by doc_id, co-partitioned with
  the explode's natural key.  No all-pairs anything.
- ``bigram_lift_top`` aggregates to vocabulary² worst-case but
  real-corpus bigram tables are Zipf-bounded; the total-token scalar
  joins in as a broadcast single-row table (never ``.collect()``).
  The integer products ``c12*T`` overflow int64 only past ~10^18
  token-pairs; at that scale flip the two product columns to
  DECIMAL(38,0) — the ranking is unchanged.
- ``inverted_index_topdocs``'s top-k-per-token is a rank-1..k window
  partitioned by token (WindowGroupLimit pushes the limit before the
  sort at scale), never a global sort.

No reference analogue: barco/PolarStreams has no text processing
(SURVEY.md §2 marks relational/text categories ABSENT); these follow
the public C4 (Raffel et al. 2020) and CCNet (Wenzek et al. 2020)
pipeline descriptions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from barco_spark.operators.quality import CHUNK
from barco_spark.operators.text import h28, h28_sql, words_col
from barco_spark.registry import register
from barco_spark.tables import t

# CCNet-style band filter: keep the middle of the per-language
# mean-log-probability distribution, drop the extreme tails.
KEEP_LO = 0.05
KEEP_HI = 0.95

# inverted index: only tokens seen in >= MIN_DF docs; top TOP_DOCS postings
MIN_DF = 3
TOP_DOCS = 3

# collocations: global top-k by lift
TOP_BIGRAMS = 20

# RAG chunking: window of CHUNK_W tokens advancing by CHUNK_S
CHUNK_W = 16
CHUNK_S = 8


def unigram_scores(docs: DataFrame) -> DataFrame:
    """Composable core of ``unigram_logprob_quality``: score the GIVEN
    corpus slice (the unigram model is trained on exactly these docs).
    Returns doc_id, lang, n_tokens, sum_log2, mean_log2, lang_pct."""
    tok = docs.select("doc_id", "lang", F.explode(words_col()).alias("w"))
    cnt = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    scored = (
        tok.join(F.broadcast(cnt), "w")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.floor(F.log2("c")).cast("bigint")).alias("sum_log2"),
        )
    )
    mean = F.col("sum_log2").cast("double") / F.col("n_tokens")
    win = Window.partitionBy("lang").orderBy(mean, "doc_id")
    return scored.select(
        "doc_id",
        "lang",
        "n_tokens",
        "sum_log2",
        mean.alias("mean_log2"),
        F.percent_rank().over(win).alias("lang_pct"),
    )


@register(
    "unigram_logprob_quality",
    f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    cnt AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
    scored AS (
      SELECT doc_id, lang, COUNT(*) AS n_tokens,
             CAST(SUM(CAST(FLOOR(LOG2(c)) AS BIGINT)) AS BIGINT) AS sum_log2
      FROM tok JOIN cnt USING (w)
      GROUP BY doc_id, lang
    ),
    ranked AS (
      SELECT doc_id, lang, n_tokens, sum_log2,
             CAST(sum_log2 AS DOUBLE) / n_tokens AS mean_log2,
             PERCENT_RANK() OVER (
               PARTITION BY lang
               ORDER BY CAST(sum_log2 AS DOUBLE) / n_tokens, doc_id
             ) AS lang_pct
      FROM scored
    )
    SELECT doc_id, lang, n_tokens, sum_log2, mean_log2, lang_pct,
           lang_pct >= {KEEP_LO} AND lang_pct <= {KEEP_HI} AS kept
    FROM ranked
    """,
    "text",
    doc=(
        "CCNet-style unigram-LM quality scoring: corpus token counts -> "
        "per-doc mean floor(log2(count)) -> per-language percent_rank "
        "band filter keeping the middle of the distribution. Integer "
        "log-quantization keeps every cross-row aggregate exact."
    ),
)
def unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranked = unigram_scores(t(spark, sf_dir, "documents"))
    return ranked.withColumn(
        "kept",
        (F.col("lang_pct") >= KEEP_LO) & (F.col("lang_pct") <= KEEP_HI),
    )


def chunk_rewrite_frame(docs: DataFrame) -> DataFrame:
    """Composable core of ``dedup_chunk_rewrite``: first-occurrence
    chunk dedup over the GIVEN corpus slice. Returns doc_id, n_chunks,
    n_kept, n_dropped, new_text."""
    w = words_col()
    n_chunks = F.expr(f"(size(split(text, ' ')) + {CHUNK - 1}) div {CHUNK}")
    chunk_structs = F.transform(
        F.sequence(F.lit(0), (n_chunks - 1).cast("int")),
        lambda j: F.struct(
            j.alias("j"),
            F.concat_ws(" ", F.slice(w, j * CHUNK + 1, CHUNK)).alias("chunk"),
        ),
    )
    c = (
        docs.select("doc_id", F.explode(chunk_structs).alias("s"))
        .select("doc_id", F.col("s.j").alias("j"), F.col("s.chunk").alias("chunk"))
    )
    # JOIN-FREE shape (round 6, same rewrite as boilerplate_strip): the
    # old totals-join-rebuilt plan re-executed the chunk explode on the
    # totals side and joined it back; keeping every row through the one
    # rank window and folding kept/total/rebuild into a single doc_id
    # aggregation runs the explode once and removes the join entirely
    # (measured 56 s -> 49 s at 500k docs — the h-window carrying the
    # chunk text dominates, so the win is smaller than
    # boilerplate_strip's 2.1x, but the explode now runs once and the
    # doc rollup rides the rebuild's own shuffle; SCALING.md round 6).
    rn = F.row_number().over(
        Window.partitionBy(h28(F.col("chunk"))).orderBy("doc_id", "j")
    )
    flagged = c.select(
        "doc_id",
        F.when(rn == 1, F.struct(F.col("j"), F.col("chunk"))).alias("kept_s"),
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.count("kept_s").alias("n_kept"),
        (F.count(F.lit(1)) - F.count("kept_s")).alias("n_dropped"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("kept_s")),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("new_text"),
    )


@register(
    "dedup_chunk_rewrite",
    f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ),
    c AS (
      SELECT doc_id, j,
             array_to_string(
               list_slice(words, j*{CHUNK}+1, j*{CHUNK}+{CHUNK}), ' ') AS chunk
      FROM w, unnest(range(0, (len(words) + {CHUNK - 1}) // {CHUNK})) AS u(j)
    ),
    flagged AS (
      SELECT doc_id, j, chunk,
             ROW_NUMBER() OVER (
               PARTITION BY {h28_sql('chunk')} ORDER BY doc_id, j
             ) AS rn
      FROM c
    ),
    totals AS (SELECT doc_id, COUNT(*) AS n_chunks FROM c GROUP BY doc_id),
    rebuilt AS (
      SELECT doc_id,
             COUNT(*) AS n_kept,
             array_to_string(list(chunk ORDER BY j), ' ') AS new_text
      FROM flagged WHERE rn = 1 GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_chunks,
           COALESCE(r.n_kept, 0) AS n_kept,
           t.n_chunks - COALESCE(r.n_kept, 0) AS n_dropped,
           COALESCE(r.new_text, '') AS new_text
    FROM totals t LEFT JOIN rebuilt r USING (doc_id)
    """,
    "dedup",
    doc=(
        "C4 dedup transform: fixed-width chunks duplicated corpus-wide "
        "are dropped except the first occurrence (min (doc_id, pos)); "
        "documents are reassembled from surviving chunks in order. "
        "Shuffle = exact-dedup shape on the chunk hash."
    ),
)
def dedup_chunk_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from barco_spark.tables import spread_rows

    # row-sized spread below the chunk explode (r12, guide §2.5): A/B
    # 0.41 s vs 0.54 s plain.  Applied at THIS call site, not inside
    # chunk_rewrite_frame: pretrain_corpus_pipeline feeds the shared
    # frame from a join output and measured as a wash with the spread.
    return chunk_rewrite_frame(
        spread_rows(t(spark, sf_dir, "documents"), spark, sf_dir, "doc_id")
    )


@register(
    "inverted_index_topdocs",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    tf AS (SELECT w, doc_id, COUNT(*) AS tf FROM tok GROUP BY w, doc_id),
    df AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
    ranked AS (
      SELECT tf.w, tf.doc_id, tf.tf, df.df,
             ROW_NUMBER() OVER (
               PARTITION BY tf.w ORDER BY tf.tf DESC, tf.doc_id
             ) AS rn
      FROM tf JOIN df USING (w)
      WHERE df.df >= {MIN_DF}
    )
    SELECT w AS token, df,
           array_to_string(list(doc_id ORDER BY rn), ',') AS top_docs,
           array_to_string(list(tf ORDER BY rn), ',') AS top_tfs
    FROM ranked WHERE rn <= {TOP_DOCS}
    GROUP BY w, df
    """,
    "text",
    doc=(
        "Inverted-index shard build: token -> document frequency + "
        "top-k posting list by term frequency (ties broken by doc_id). "
        "Top-k is a per-token window (WindowGroupLimit), never a "
        "global sort; posting lists serialized to CSV for hashability."
    ),
)
def inverted_index_topdocs(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(words_col()).alias("w")
    )
    tf = tok.groupBy("w", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    # df = rows per token OF THE tf TABLE — a window over the same
    # partitioning the rank window needs anyway, so it rides the one
    # w-shuffle for free; the former tf-join-df plan re-executed the
    # explode+first-aggregate subtree for the df side (measured 1.5x
    # at sf0.1, same re-execution trap as the chunk-dedup family)
    tfw = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("w"))
    )
    rn = F.row_number().over(
        Window.partitionBy("w").orderBy(F.col("tf").desc(), "doc_id")
    )
    ranked = (
        tfw.where(F.col("df") >= MIN_DF)
        .withColumn("rn", rn)
        .where(F.col("rn") <= TOP_DOCS)
    )
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("rn"), F.col("doc_id"), F.col("tf")))
    )
    return (
        ranked.groupBy(F.col("w").alias("token"), "df")
        .agg(
            F.array_join(
                F.transform(ordered, lambda s: s["doc_id"].cast("string")), ","
            ).alias("top_docs"),
            F.array_join(
                F.transform(ordered, lambda s: s["tf"].cast("string")), ","
            ).alias("top_tfs"),
        )
    )


@register(
    "bigram_lift_top",
    f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ),
    big AS (
      SELECT words[j+1] AS w1, words[j+2] AS w2
      FROM w, unnest(range(0, len(words) - 1)) AS u(j)
    ),
    tok AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    uni AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
    pair AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2),
    total AS (SELECT COUNT(*) AS t FROM tok)
    SELECT w1, w2, c12, u1.c AS c1, u2.c AS c2,
           CAST(c12 * total.t AS DOUBLE) / (u1.c * u2.c) AS lift
    FROM pair
    JOIN uni u1 ON pair.w1 = u1.w
    JOIN uni u2 ON pair.w2 = u2.w
    CROSS JOIN total
    ORDER BY lift DESC, w1, w2
    LIMIT {TOP_BIGRAMS}
    """,
    "text",
    doc=(
        "Collocation mining: top bigrams by lift P(w1 w2)/(P(w1)P(w2)) "
        "— monotone to PMI but exact across engines (one division of "
        "integer products). Unigram table broadcast; total-token scalar "
        "joins as a broadcast single-row table, never collected."
    ),
)
def bigram_lift_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    w = words_col()
    # bigrams = zip(words[:-1], words[1:]) via two slices. NOT
    # transform(sequence, element_at(w, j)): element_at with a computed
    # index has no random access in codegen, making that plan O(len^2)
    # per document (measured 18x slower at 50k docs).
    bigrams = F.arrays_zip(
        F.slice(w, 1, F.size(w) - 1), F.slice(w, 2, F.size(w) - 1)
    )
    # guard: slice(w, 1, -1) on single-token docs would error; such docs
    # contribute no bigrams on either engine
    big = (
        docs.where(F.size(w) >= 2)
        .select(F.explode(bigrams).alias("b"))
        .select(
            F.col("b").getField("0").alias("w1"),
            F.col("b").getField("1").alias("w2"),
        )
    )
    tok = docs.select(F.explode(w).alias("w"))
    uni = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    pair = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    # total token count folds the vocabulary-sized unigram table, not a
    # third scan of the corpus
    total = uni.agg(F.sum("c").alias("t"))
    scored = (
        pair.join(F.broadcast(uni.withColumnRenamed("w", "w1")
                              .withColumnRenamed("c", "c1")), "w1")
        .join(F.broadcast(uni.withColumnRenamed("w", "w2")
                          .withColumnRenamed("c", "c2")), "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            "c2",
            (
                (F.col("c12") * F.col("t")).cast("double")
                / (F.col("c1") * F.col("c2"))
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.col("lift").desc(), "w1", "w2").limit(TOP_BIGRAMS)


@register(
    "doc_chunk_overlap",
    f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words,
             len(string_split(text, ' ')) AS n
      FROM documents
    )
    SELECT doc_id, j AS chunk_id,
           array_to_string(
             list_slice(words, j*{CHUNK_S}+1, j*{CHUNK_S}+{CHUNK_W}), ' ')
             AS chunk_text,
           len(list_slice(words, j*{CHUNK_S}+1, j*{CHUNK_S}+{CHUNK_W}))
             AS n_chunk_tokens
    FROM w, unnest(range(0,
      (GREATEST(n - {CHUNK_W}, 0) + {CHUNK_S - 1}) // {CHUNK_S} + 1)) AS u(j)
    """,
    "text",
    doc=(
        f"RAG chunking: overlapping sliding windows of {CHUNK_W} tokens "
        f"with stride {CHUNK_S} (last window clamps to the doc tail). "
        "Pure per-row explode — map-only at any scale."
    ),
)
def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = words_col()
    n = F.size(w)
    n_windows = (
        (F.greatest(n - CHUNK_W, F.lit(0)) + (CHUNK_S - 1)) / CHUNK_S
    ).cast("int") + 1
    chunks = F.transform(
        F.sequence(F.lit(0), n_windows - 1),
        lambda j: F.struct(
            j.alias("chunk_id"),
            F.concat_ws(" ", F.slice(w, j * CHUNK_S + 1, CHUNK_W)).alias(
                "chunk_text"
            ),
            F.size(F.slice(w, j * CHUNK_S + 1, CHUNK_W)).alias(
                "n_chunk_tokens"
            ),
        ),
    )
    return (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(chunks).alias("c"))
        .select("doc_id", "c.chunk_id", "c.chunk_text", "c.n_chunk_tokens")
    )


@register(
    "token_entropy_per_source",
    """
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
    cnt AS (SELECT source, w, COUNT(*) AS c FROM tok GROUP BY source, w),
    agg AS (
      SELECT source,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             COUNT(*) AS n_types,
             CAST(SUM(c * CAST(FLOOR(LOG2(c)) AS BIGINT)) AS BIGINT)
               AS sum_c_log2c
      FROM cnt GROUP BY source)
    SELECT source, n_tokens, n_types, sum_c_log2c,
           CAST(FLOOR(LOG2(n_tokens)) AS DOUBLE)
             - CAST(sum_c_log2c AS DOUBLE) / n_tokens AS entropy_proxy_bits
    FROM agg ORDER BY source
    """,
    "text",
    doc=(
        "Token-distribution entropy per source (quantized): H = "
        "log2(N) - (1/N) sum c*log2(c), with every log2 floor-"
        "quantized to its integer bit length — the same determinism "
        "trick as unigram_logprob_quality, because raw libm log2 "
        "differs in ulps across engines while floor(log2(int)) never "
        "does. Low entropy = templated/repetitive source, high = "
        "diverse vocabulary — the corpus-diversity signal that "
        "complements type-token ratio (vocab_growth_stats) by "
        "weighting HOW skewed the type distribution is, not just its "
        "size. One explode, one (source,type) count (map-side "
        "combined), one per-source rollup — shuffle volume is "
        "vocabulary-sized."
    ),
)
def token_entropy_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = t(spark, sf_dir, "documents").select(
        "source", F.explode(words_col()).alias("w")
    )
    cnt = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    agg = cnt.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.col("c") * F.floor(F.log2("c")).cast("bigint"))
        .cast("bigint")
        .alias("sum_c_log2c"),
    )
    return agg.select(
        "source",
        "n_tokens",
        "n_types",
        "sum_c_log2c",
        (
            F.floor(F.log2("n_tokens")).cast("double")
            - F.col("sum_c_log2c").cast("double") / F.col("n_tokens")
        ).alias("entropy_proxy_bits"),
    ).orderBy("source")


# BM25 ranking: fixed query terms (lexical order fixes the score-sum
# fold order), Robertson k1=1.2 (6/5) and b=0.75 (3/4) as exact
# rationals. Quantized idf keeps cross-engine bit-exactness: libm ln()
# differs in ulps between engines, but floor(log2(int)) never does
# (an integer k only has log2(k) within 2^-52 of an integer when k IS
# that power of two, where log2 is exact).
BM25_QUERY = ("hash", "merge", "scan")
BM25_TOP = 20
_IDF_SCALE = 1 << 20


def _bm25_idf_sql(n: str, df: str) -> str:
    # GREATEST(..., 1) is the standard BM25 idf floor: when df ≈ N at
    # ≥2^20 docs the integer quotient underflows to 0 and LOG2(0) would
    # error (DuckDB) / NULL (Spark).  Flooring at 1 gives idf_q = 0 for
    # corpus-saturating terms — they contribute nothing to the score,
    # which is exactly Robertson's non-negative idf convention.
    return (
        f"CAST(FLOOR(LOG2(GREATEST((({n} - {df} + 1) * {_IDF_SCALE})"
        f" // ({df} + 1), 1))) AS BIGINT)"
    )


@register(
    "bm25_topdocs",
    f"""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    d AS (SELECT doc_id, len(ws) AS dl, ws FROM base),
    scal AS (
      SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_tokens
      FROM d
    ),
    tok AS (SELECT doc_id, dl, unnest(ws) AS term FROM d),
    tf AS (
      SELECT doc_id, dl, term, COUNT(*) AS tf
      FROM tok WHERE term IN ('hash', 'merge', 'scan')
      GROUP BY doc_id, dl, term
    ),
    dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    sc AS (
      SELECT f.doc_id, f.dl, f.term, f.tf,
             ({_bm25_idf_sql('s.n_docs', 'd.df')} * (44 * s.total_tokens * f.tf))
               / (20 * s.total_tokens * f.tf + 6 * s.total_tokens
                  + 18 * f.dl * s.n_docs) AS score_t
      FROM tf f JOIN dft d USING (term) CROSS JOIN scal s
    ),
    piv AS (
      SELECT doc_id, dl,
             CAST(COALESCE(SUM(CASE WHEN term = 'hash' THEN tf END), 0)
                  AS BIGINT) AS tf_hash,
             CAST(COALESCE(SUM(CASE WHEN term = 'merge' THEN tf END), 0)
                  AS BIGINT) AS tf_merge,
             CAST(COALESCE(SUM(CASE WHEN term = 'scan' THEN tf END), 0)
                  AS BIGINT) AS tf_scan,
             COALESCE(SUM(CASE WHEN term = 'hash' THEN score_t END), 0.0)
               AS s_hash,
             COALESCE(SUM(CASE WHEN term = 'merge' THEN score_t END), 0.0)
               AS s_merge,
             COALESCE(SUM(CASE WHEN term = 'scan' THEN score_t END), 0.0)
               AS s_scan
      FROM sc GROUP BY doc_id, dl
    )
    SELECT doc_id, dl, tf_hash, tf_merge, tf_scan,
           (s_hash + s_merge) + s_scan AS bm25
    FROM piv ORDER BY bm25 DESC, doc_id LIMIT {BM25_TOP}
    """,
    "text",
    doc=(
        "BM25 ranked retrieval for a fixed 3-term query: idf quantized "
        "to floor(log2(((N-df+1)<<20) div (df+1))) (exact integer bit "
        "length, never a cross-engine ulp), the tf normalization "
        "tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl)) cleared of fractions "
        "by multiplying through by 20*total_tokens so each per-term "
        "score is ONE division of exact int64 products, and the "
        "per-document score summed in fixed lexical term order (both "
        "engines fold the identical expression tree). Plan: doc "
        "lengths are map-only size(split(..)), the corpus-scalar "
        "(N, T) table is a one-row broadcast, tf rows exist only for "
        "query-term hits, and the top-20 is TakeOrderedAndProject — "
        "never a global sort. At 100 TB the int64 products flip to "
        "DECIMAL(38,0) like bigram_lift_top; the ranking is unchanged."
    ),
)
def bm25_topdocs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.size(words_col()).alias("dl"), words_col().alias("ws")
    )
    scal = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_tokens"),
    )
    tok = d.select("doc_id", "dl", F.explode("ws").alias("term")).where(
        F.col("term").isin(*BM25_QUERY)
    )
    tf = tok.groupBy("doc_id", "dl", "term").agg(F.count(F.lit(1)).alias("tf"))
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # exact integer quotient ((N-df+1)<<20) div (df+1), floored at 1
    # (the BM25 idf floor — see _bm25_idf_sql), then bit length
    q = F.expr(f"((n_docs - df + 1) * {_IDF_SCALE}) div (df + 1)")
    idf = F.floor(F.log2(F.greatest(q, F.lit(1)))).cast("bigint")
    score_t = (
        idf * (F.lit(44) * F.col("total_tokens") * F.col("tf"))
    ) / (
        F.lit(20) * F.col("total_tokens") * F.col("tf")
        + F.lit(6) * F.col("total_tokens")
        + F.lit(18) * F.col("dl") * F.col("n_docs")
    )
    sc = (
        tf.join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(scal))
        .select("doc_id", "dl", "term", "tf", score_t.alias("score_t"))
    )

    def _tf(term: str) -> F.Column:
        return (
            F.coalesce(
                F.sum(F.when(F.col("term") == term, F.col("tf"))), F.lit(0)
            )
            .cast("bigint")
            .alias(f"tf_{term}")
        )

    def _s(term: str) -> F.Column:
        return F.coalesce(
            F.sum(F.when(F.col("term") == term, F.col("score_t"))), F.lit(0.0)
        ).alias(f"s_{term}")

    piv = sc.groupBy("doc_id", "dl").agg(
        _tf("hash"), _tf("merge"), _tf("scan"), _s("hash"), _s("merge"), _s("scan")
    )
    return (
        piv.select(
            "doc_id",
            "dl",
            "tf_hash",
            "tf_merge",
            "tf_scan",
            ((F.col("s_hash") + F.col("s_merge")) + F.col("s_scan")).alias("bm25"),
        )
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(BM25_TOP)
    )


# Boilerplate: a chunk whose DISTINCT-document frequency reaches
# BOILER_MIN_DDF is template text (headers, footers, licence blocks)
# and is stripped from EVERY document — unlike dedup_chunk_rewrite,
# which keeps the first occurrence.
BOILER_MIN_DDF = 2


@register(
    "boilerplate_strip",
    f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ),
    c AS (
      SELECT doc_id, j,
             array_to_string(
               list_slice(words, j*{CHUNK}+1, j*{CHUNK}+{CHUNK}), ' ') AS chunk
      FROM w, unnest(range(0, (len(words) + {CHUNK - 1}) // {CHUNK})) AS u(j)
    ),
    ddf AS (
      SELECT {h28_sql('chunk')} AS h, COUNT(DISTINCT doc_id) AS ddf
      FROM c GROUP BY 1
    ),
    totals AS (SELECT doc_id, COUNT(*) AS n_chunks FROM c GROUP BY doc_id),
    kept AS (
      SELECT doc_id, j, chunk
      FROM c JOIN ddf ON {h28_sql('chunk')} = ddf.h
      WHERE ddf < {BOILER_MIN_DDF}
    ),
    rebuilt AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             array_to_string(list(chunk ORDER BY j), ' ') AS new_text
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_chunks,
           COALESCE(r.n_kept, 0) AS n_kept,
           t.n_chunks - COALESCE(r.n_kept, 0) AS n_boiler,
           COALESCE(r.new_text, '') AS new_text
    FROM totals t LEFT JOIN rebuilt r USING (doc_id)
    """,
    "dedup",
    doc=(
        "Boilerplate removal transform: fixed-width chunks whose "
        "DISTINCT-document frequency reaches BOILER_MIN_DDF (template "
        "text — headers, footers, licence blocks) are stripped from "
        "every document, and documents are reassembled from the "
        "surviving chunks in order. Complements dedup_chunk_rewrite "
        "(first-occurrence dedup): boilerplate keeps NO copy. Plan "
        "shape (JOIN-FREE): the chunk explode runs ONCE into a single "
        "chunk-hash shuffle where two stacked windows compute the "
        "distinct-doc count (a lag(doc_id) first-in-doc mark summed "
        "over the hash partition — COUNT(DISTINCT) OVER isn't "
        "supported, and both windows share the h-only partitioning so "
        "there is no second exchange), then ONE doc_id aggregation "
        "emits totals, kept counts, and the rebuilt text together. "
        "The naive agg-then-join-back plan re-executed the explode on "
        "all three consumers: 110 s -> 52 s at 500k docs (SCALING.md "
        "round 6). Two shuffles total, no all-pairs anything."
    ),
)
def boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = words_col()
    n_chunks = F.expr(f"(size(split(text, ' ')) + {CHUNK - 1}) div {CHUNK}")
    chunk_structs = F.transform(
        F.sequence(F.lit(0), (n_chunks - 1).cast("int")),
        lambda j: F.struct(
            j.alias("j"),
            F.concat_ws(" ", F.slice(w, j * CHUNK + 1, CHUNK)).alias("chunk"),
        ),
    )
    from barco_spark.tables import spread_rows

    # row-sized spread below the chunk slice/concat explode + md5
    # (r12, guide §2.5): A/B 0.45 s vs 0.55 s plain — see
    # tables.spread_rows
    c = (
        spread_rows(t(spark, sf_dir, "documents"), spark, sf_dir, "doc_id")
        .select("doc_id", F.explode(chunk_structs).alias("s"))
        .select("doc_id", F.col("s.j").alias("j"), F.col("s.chunk").alias("chunk"))
        .withColumn("h", h28(F.col("chunk")))
    )
    # first occurrence of each doc within its hash partition (ordered
    # by doc then position, so the mark is deterministic)
    w_h = Window.partitionBy("h").orderBy("doc_id", "j")
    fid = F.when(
        F.lag("doc_id").over(w_h).isNull()
        | (F.lag("doc_id").over(w_h) != F.col("doc_id")),
        1,
    ).otherwise(0)
    ddf = F.sum(fid).over(Window.partitionBy("h"))
    keep = ddf < BOILER_MIN_DDF
    flagged = c.select(
        "doc_id",
        F.when(keep, F.struct(F.col("j"), F.col("chunk"))).alias("kept_s"),
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.count("kept_s").alias("n_kept"),
        (F.count(F.lit(1)) - F.count("kept_s")).alias("n_boiler"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("kept_s")),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("new_text"),
    )
