"""Text-analysis operators for LLM training-data pipelines.

Language-ID (marker-word heuristic), quality scoring, token counting
(whitespace + regex), and document fingerprinting (shingle-hash
winnowing) over the `documents` table.

Determinism contract with the DuckDB oracle: all cross-row aggregates
are integer sums (exact in any order); doubles only appear in final
single divisions. The portable 28-bit hash is
`int(md5(s)[:7 hex], 16)` on both engines, so fingerprints match
bit-for-bit.

Scale notes: everything is per-row narrow work + one hash aggregation —
no shuffle besides the final groupBy; at 100 TB this is the ideal
map-heavy shape. No Python UDFs anywhere: split/transform/aggregate are
JVM higher-order functions inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from barco_spark.registry import register
from barco_spark.tables import t

STOPWORDS = ["the", "a", "of", "and", "to"]

# language marker words for the heuristic language-ID
LANG_MARKERS = {
    "en": ["the", "a", "and"],
    "es": ["el", "la", "que"],
    "de": ["der", "die", "und"],
    "fr": ["le", "la", "et"],
    "zh": ["de", "shi", "bu"],
}


def h28(col: Column) -> Column:
    """Portable 28-bit hash: first 7 hex chars of md5, as bigint."""
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("bigint")


def h28_sql(expr: str) -> str:
    """DuckDB rendering of the same 28-bit hash."""
    return f"(('0x' || substr(md5({expr}), 1, 7))::BIGINT)"


def h28_spark_sql(expr: str) -> str:
    """Spark-SQL-string rendering of the same 28-bit hash (for builders
    that assemble expressions as parsed SQL to avoid py4j latency).
    MUST stay equivalent to h28()."""
    return f"cast(conv(substring(md5({expr}), 1, 7), 16, 10) as bigint)"


def words_col() -> Column:
    return F.split(F.col("text"), " ")


def kgrams(words: Column, k: int) -> Column:
    """Overlapping k-word shingles via ZIPPED SLICES, the linear plan.

    NOT ``transform(sequence, i -> words[i] ...)``: indexed array access
    (GetArrayItem or element_at) with a computed index has no random
    access in codegen, so that shape walks the array per element —
    O(len^2) per document (measured 16x slower than this plan at
    ~90-word docs, SCALING.md round-4b; at 10k-token documents it is
    catastrophic). Docs with < k words yield the whole text, matching
    every oracle's CASE fallback."""
    n = F.size(words)
    m = n - (k - 1)  # number of k-grams
    z = F.arrays_zip(*[F.slice(words, i + 1, m) for i in range(k)])
    grams = F.transform(
        z, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(k)])
    )
    return F.when(n >= k, grams).otherwise(F.array(F.concat_ws(" ", words)))


def shingles5(words: Column) -> Column:
    """Distinct-free 5-word shingles (docs with <5 words -> whole text).
    The ONE blocking key shared by doc_fingerprint and dedup_keep_best —
    change it here and both stay in sync."""
    return kgrams(words, 5)


def fingerprint5(words: Column) -> Column:
    """Winnowing-lite fingerprint: min h28 over the 5-gram shingles."""
    return F.array_min(F.transform(shingles5(words), lambda s: h28(s)))


def shingles5_sql(words: str) -> str:
    """DuckDB rendering of shingles5 (1-based list indexing)."""
    return (
        f"CASE WHEN len({words}) >= 5"
        f" THEN list_transform(range(1, len({words}) - 3),"
        f" i -> {words}[i] || ' ' || {words}[i+1] || ' ' || {words}[i+2]"
        f" || ' ' || {words}[i+3] || ' ' || {words}[i+4])"
        f" ELSE [array_to_string({words}, ' ')] END"
    )


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append n_tokens / n_stopwords / stopword_ratio / quality_score.

    The exact expressions of `text_metrics`, factored so batch queries
    and streaming pipelines score documents identically.
    """
    w = F.split(F.col(text_col), " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    df = df.withColumn("n_tokens", F.size(w)).withColumn(
        "n_stopwords",
        F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x))),
    )
    return df.withColumn(
        "stopword_ratio",
        F.col("n_stopwords").cast("double") / F.col("n_tokens"),
    ).withColumn(
        "quality_score",
        (F.col("n_tokens").cast("double") / (F.col("n_tokens") + 20))
        * (F.lit(1) - F.col("n_stopwords").cast("double") / F.col("n_tokens")),
    )


@register(
    "text_metrics",
    """
    WITH w AS (
      SELECT doc_id, lang, n_chars, string_split(text, ' ') AS words,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_filter(string_split(text, ' '),
                             x -> x IN ('the','a','of','and','to'))) AS n_stopwords
      FROM documents)
    SELECT doc_id, lang, n_tokens, n_stopwords,
           CAST(n_stopwords AS DOUBLE) / n_tokens AS stopword_ratio,
           CAST(n_chars AS DOUBLE) / n_tokens AS avg_token_span,
           (CAST(n_tokens AS DOUBLE) / (n_tokens + 20))
             * (1 - CAST(n_stopwords AS DOUBLE) / n_tokens) AS quality_score
    FROM w
    """,
    "text",
    doc="Per-document quality metrics; single divisions only (deterministic).",
)
def text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(words_col()).alias("n_tokens"),
        F.size(F.filter(words_col(), lambda x: F.array_contains(stop_arr, x))).alias(
            "n_stopwords"
        ),
    )
    return d.select(
        "doc_id",
        "lang",
        "n_tokens",
        "n_stopwords",
        (F.col("n_stopwords").cast("double") / F.col("n_tokens")).alias(
            "stopword_ratio"
        ),
        (F.col("n_chars").cast("double") / F.col("n_tokens")).alias("avg_token_span"),
        (
            (F.col("n_tokens").cast("double") / (F.col("n_tokens") + 20))
            * (
                F.lit(1)
                - F.col("n_stopwords").cast("double") / F.col("n_tokens")
            )
        ).alias("quality_score"),
    )


def _marker_count_sql(markers: list[str]) -> str:
    lst = ",".join(f"'{m}'" for m in markers)
    return f"len(list_filter(string_split(text, ' '), x -> x IN ({lst})))"


@register(
    "lang_id_confusion",
    f"""
    WITH scored AS (
      SELECT lang,
             {_marker_count_sql(LANG_MARKERS['en'])} AS s_en,
             {_marker_count_sql(LANG_MARKERS['es'])} AS s_es,
             {_marker_count_sql(LANG_MARKERS['de'])} AS s_de,
             {_marker_count_sql(LANG_MARKERS['fr'])} AS s_fr,
             {_marker_count_sql(LANG_MARKERS['zh'])} AS s_zh
      FROM documents),
    pred AS (
      SELECT lang,
             CASE
               WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
               WHEN s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
               WHEN s_de >= s_fr AND s_de >= s_zh THEN 'de'
               WHEN s_fr >= s_zh THEN 'fr'
               ELSE 'zh' END AS predicted_lang
      FROM scored)
    SELECT lang, predicted_lang, COUNT(*) AS n
    FROM pred GROUP BY lang, predicted_lang
    """,
    "text",
    doc="Heuristic n-gram/marker language ID -> confusion matrix vs labels.",
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")

    def score(markers: list[str]) -> Column:
        arr = F.array(*[F.lit(m) for m in markers])
        return F.size(F.filter(words_col(), lambda x: F.array_contains(arr, x)))

    scored = d.select(
        "lang",
        score(LANG_MARKERS["en"]).alias("s_en"),
        score(LANG_MARKERS["es"]).alias("s_es"),
        score(LANG_MARKERS["de"]).alias("s_de"),
        score(LANG_MARKERS["fr"]).alias("s_fr"),
        score(LANG_MARKERS["zh"]).alias("s_zh"),
    )
    pred = scored.select(
        "lang",
        F.when(
            (F.col("s_en") >= F.col("s_es"))
            & (F.col("s_en") >= F.col("s_de"))
            & (F.col("s_en") >= F.col("s_fr"))
            & (F.col("s_en") >= F.col("s_zh")),
            F.lit("en"),
        )
        .when(
            (F.col("s_es") >= F.col("s_de"))
            & (F.col("s_es") >= F.col("s_fr"))
            & (F.col("s_es") >= F.col("s_zh")),
            F.lit("es"),
        )
        .when(
            (F.col("s_de") >= F.col("s_fr")) & (F.col("s_de") >= F.col("s_zh")),
            F.lit("de"),
        )
        .when(F.col("s_fr") >= F.col("s_zh"), F.lit("fr"))
        .otherwise(F.lit("zh"))
        .alias("predicted_lang"),
    )
    return pred.groupBy("lang", "predicted_lang").agg(F.count(F.lit(1)).alias("n"))


@register(
    "token_count_regex",
    """
    SELECT source,
           CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+'))) AS BIGINT) AS total_tokens,
           CAST(SUM(len(list_distinct(regexp_extract_all(text, '[a-z]+|[0-9]+')))) AS BIGINT) AS total_distinct_tokens,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY source
    """,
    "text",
    doc="BPE-ish regex token counting aggregated per source (integer-exact).",
)
def token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.regexp_extract_all(F.col("text"), F.lit("[a-z]+|[0-9]+"), 0)
    return (
        t(spark, sf_dir, "documents")
        .select("source", toks.alias("toks"))
        .groupBy("source")
        .agg(
            F.sum(F.size(F.col("toks"))).alias("total_tokens"),
            F.sum(F.size(F.array_distinct(F.col("toks")))).alias(
                "total_distinct_tokens"
            ),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


SPAN_RATE_MOD = 20  # 1 in 20 token positions starts a corruption span
SPAN_MAX = 5  # span length 1..SPAN_MAX (mean 3, the T5 default)


@register(
    "span_corruption_stats",
    f"""
    WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS words
               FROM documents),
    pos AS (
      SELECT doc_id, source, t.i AS pos,
             {h28_sql("CAST(doc_id AS VARCHAR) || ':' || CAST(t.i AS VARCHAR)")} AS hv
      FROM w, unnest(range(1, len(words) + 1)) AS t(i)),
    spans AS (
      SELECT doc_id, source, pos,
             CASE WHEN hv % {SPAN_RATE_MOD} = 0 THEN 1 ELSE 0 END AS is_start,
             CASE WHEN hv % {SPAN_RATE_MOD} = 0
                  THEN pos + ((hv // {SPAN_RATE_MOD}) % {SPAN_MAX}) END AS cover_end
      FROM pos),
    masked AS (
      SELECT doc_id, source, is_start,
             CASE WHEN MAX(cover_end) OVER (
                    PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN {SPAN_MAX - 1} PRECEDING AND CURRENT ROW)
                  >= pos THEN 1 ELSE 0 END AS is_masked
      FROM spans)
    SELECT source,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS total_tokens,
           CAST(SUM(is_start) AS BIGINT) AS n_spans,
           CAST(SUM(is_masked) AS BIGINT) AS masked_tokens,
           CAST(SUM(is_masked) AS DOUBLE) / COUNT(*) AS mask_pct
    FROM masked
    GROUP BY source ORDER BY source
    """,
    "text",
    doc=(
        "T5/UL2-style span-corruption preprocessing stats: every token "
        f"position deterministically starts a span with probability "
        f"1/{SPAN_RATE_MOD} (28-bit md5 of doc_id:pos — reproducible "
        f"across runs and engines, no RNG), spans run 1..{SPAN_MAX} "
        "tokens (mean 3, the T5 default), overlaps union. Per-source "
        "readout: span count, masked-token count and the realized mask "
        "ratio — the knob check before launching a denoising-objective "
        "pretrain. The coverage test is a bounded window (a span "
        f"reaches at most {SPAN_MAX - 1} positions forward, so "
        "masked(p) = max cover-end over the last "
        f"{SPAN_MAX} rows >= p), keeping the whole query one explode + "
        "one window + one aggregation — shuffle volume is token "
        "positions, integer-exact end to end."
    ),
)
def span_corruption_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "source", words_col().alias("words")
    )
    pos = d.select(
        "doc_id", "source", F.posexplode("words").alias("pos0", "tok")
    ).select(
        "doc_id",
        "source",
        (F.col("pos0") + 1).alias("pos"),  # 1-based like the oracle's range()
    )
    hv = h28(
        F.concat(
            F.col("doc_id").cast("string"),
            F.lit(":"),
            F.col("pos").cast("string"),
        )
    )
    is_start = (hv % SPAN_RATE_MOD == 0).cast("int")
    cover_end = F.when(
        hv % SPAN_RATE_MOD == 0,
        F.col("pos") + (F.floor(hv / SPAN_RATE_MOD) % SPAN_MAX),
    )
    spans = pos.select(
        "doc_id",
        "source",
        "pos",
        is_start.alias("is_start"),
        cover_end.alias("cover_end"),
    )
    wnd = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(SPAN_MAX - 1), 0)
    )
    masked = spans.select(
        "doc_id",
        "source",
        "is_start",
        (F.max("cover_end").over(wnd) >= F.col("pos"))
        .cast("int")
        .alias("is_masked"),
    )
    return (
        masked.groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("total_tokens"),
            F.sum("is_start").cast("bigint").alias("n_spans"),
            F.sum("is_masked").cast("bigint").alias("masked_tokens"),
            (
                F.sum("is_masked").cast("double") / F.count(F.lit(1))
            ).alias("mask_pct"),
        )
        .orderBy("source")
    )


@register(
    "doc_fingerprint",
    f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    sh AS (SELECT doc_id, {shingles5_sql('words')} AS shingles FROM w)
    SELECT doc_id,
           list_min(list_transform(shingles, s -> {h28_sql('s')})) AS fingerprint,
           len(list_distinct(shingles)) AS n_shingles
    FROM sh
    """,
    "text",
    doc="Winnowing-lite fingerprint: min 28-bit hash over 5-gram shingles.",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id", words_col().alias("words"))
    sh = d.select("doc_id", shingles5(F.col("words")).alias("shingles"))
    return sh.select(
        "doc_id",
        F.array_min(F.transform(F.col("shingles"), lambda s: h28(s))).alias(
            "fingerprint"
        ),
        F.size(F.array_distinct(F.col("shingles"))).alias("n_shingles"),
    )


@register(
    "top_terms",
    """
    SELECT term, COUNT(*) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
    GROUP BY term
    ORDER BY freq DESC, term
    LIMIT 20
    """,
    "text",
    doc="Explode + count + top-k: vocabulary head (map-side combine then one shuffle).",
)
def top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "documents")
        .select(F.explode(words_col()).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("term"))
        .limit(20)
    )


ROLL_B = 31
ROLL_P = 1_000_000_007
_B_POWS = [ROLL_B**k for k in range(5)]  # B^0..B^4


@register(
    "doc_rolling_fingerprints",
    f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    h AS (SELECT doc_id, list_transform(words, x -> {h28_sql('x')}) AS hs FROM w),
    r AS (
      SELECT doc_id,
             CASE WHEN len(hs) >= 5
               THEN list_transform(range(1, len(hs) - 3),
                    s -> (hs[s] * {_B_POWS[4]} + hs[s+1] * {_B_POWS[3]}
                        + hs[s+2] * {_B_POWS[2]} + hs[s+3] * {_B_POWS[1]}
                        + hs[s+4]) % {ROLL_P})
               ELSE [hs[1] % {ROLL_P}] END AS rolls
      FROM h)
    SELECT doc_id,
           list_min(rolls) AS min_fp,
           list_max(rolls) AS max_fp,
           len(list_distinct(rolls)) AS n_windows
    FROM r
    """,
    "text",
    doc=(
        "Rabin-Karp rolling hash over 5-word windows (polynomial base 31 "
        "mod 1e9+7, all intermediates < 2^63); min/max fingerprint + "
        "distinct window count per document."
    ),
)
def doc_rolling_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.transform(F.split(F.col("text"), " "), lambda x: h28(x)).alias("hs"),
    )
    hs = F.col("hs")

    def window_hash(s: Column) -> Column:
        acc = None
        for k in range(5):
            term = hs[s + k] * F.lit(_B_POWS[4 - k])
            acc = term if acc is None else acc + term
        return acc % ROLL_P

    rolls = F.when(
        F.size(hs) >= 5,
        F.transform(F.sequence(F.lit(0), F.size(hs) - 5), window_hash),
    ).otherwise(F.array(hs[0] % ROLL_P))
    r = d.select("doc_id", rolls.alias("rolls"))
    return r.select(
        "doc_id",
        F.array_min("rolls").alias("min_fp"),
        F.array_max("rolls").alias("max_fp"),
        F.size(F.array_distinct("rolls")).alias("n_windows"),
    )


@register(
    "repetition_stats",
    """
    WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS words
               FROM documents),
    bg AS (
      SELECT doc_id, source,
             unnest(CASE WHEN len(words) >= 2
               THEN list_transform(range(1, len(words)),
                    i -> words[i] || ' ' || words[i+1])
               ELSE [array_to_string(words, ' ')] END) AS b
      FROM w),
    per_bigram AS (
      SELECT doc_id, source, b, COUNT(*) AS cnt
      FROM bg GROUP BY doc_id, source, b),
    per_doc AS (
      SELECT doc_id, source,
             CAST(MAX(cnt) AS BIGINT) AS max_bigram_cnt,
             CAST(SUM(cnt) AS BIGINT) AS n_bigrams
      FROM per_bigram GROUP BY doc_id, source)
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(max_bigram_cnt) AS BIGINT) AS sum_top_bigram,
           CAST(SUM(n_bigrams) AS BIGINT) AS sum_bigrams,
           CAST(SUM(max_bigram_cnt) AS DOUBLE) / SUM(n_bigrams)
             AS pooled_rep_share
    FROM per_doc GROUP BY source
    """,
    "text",
    doc=(
        "Gopher-style repetition signal: the most-frequent bigram's "
        "share of each document, pooled per source as a ratio of "
        "integer sums (order-independent, so the double division is "
        "deterministic cross-engine — per-doc double shares averaged "
        "naively would not be). Boilerplate-heavy sources float to the "
        "top. The per-doc top-bigram count is computed INSIDE the row "
        "(sort the bigram array, max equal-run via one fold), so the "
        "only shuffle is the final per-source aggregation — the "
        "explode-then-groupBy(doc, bigram) plan it replaces built hash "
        "tables with one group per corpus bigram occurrence "
        "(~O(tokens) groups) and fell back to spilling sort-aggregation "
        "at 500k docs (9.8 s -> 148 s per 10x, measured in SCALING.md); "
        "this plan is ~linear because group cardinality is bounded by "
        "source count, not token count."
    ),
)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = F.col("words")
    bigrams = kgrams(w, 2)
    # max run length over the SORTED bigram array == max bigram count;
    # one parsed-SQL fold (single py4j call, JVM-evaluated) per row.
    max_run = F.expr(
        """
        aggregate(
          array_sort(bg),
          struct(cast(null as string) as prev, 0L as run, 0L as best),
          (acc, x) -> struct(
            x as prev,
            if(x <=> acc.prev, acc.run + 1, 1L) as run,
            greatest(acc.best, if(x <=> acc.prev, acc.run + 1, 1L)) as best),
          acc -> acc.best)
        """
    )
    per_doc = (
        t(spark, sf_dir, "documents")
        .select("doc_id", "source", F.split(F.col("text"), " ").alias("words"))
        .select("doc_id", "source", bigrams.alias("bg"))
        .select(
            "doc_id",
            "source",
            max_run.alias("max_bigram_cnt"),
            F.size("bg").cast("bigint").alias("n_bigrams"),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("max_bigram_cnt").cast("bigint").alias("sum_top_bigram"),
        F.sum("n_bigrams").cast("bigint").alias("sum_bigrams"),
        (
            F.sum("max_bigram_cnt").cast("double") / F.sum("n_bigrams")
        ).alias("pooled_rep_share"),
    )


# -- sentiment-lexicon scoring (SURVEY §7 step 6) -------------------------

# Demo lexicon over the synthetic vocabulary; production swaps in a real
# lexicon table (AFINN/VADER-style) broadcast the same way.
SENT_POS = ["fast", "big"]
SENT_NEG = ["slow", "small"]


@register(
    "sentiment_lexicon_score",
    f"""
    WITH s AS (
      SELECT doc_id,
             len(list_filter(string_split(text, ' '),
                 w -> list_contains({SENT_POS!r}, w))) AS n_pos,
             len(list_filter(string_split(text, ' '),
                 w -> list_contains({SENT_NEG!r}, w))) AS n_neg
      FROM documents
    )
    SELECT doc_id, n_pos, n_neg,
           CAST(n_pos - n_neg AS BIGINT) AS polarity,
           CASE WHEN n_pos + n_neg > 0
                THEN CAST(n_pos - n_neg AS DOUBLE) / (n_pos + n_neg)
                ELSE 0.0 END AS sentiment
    FROM s
    """,
    "text",
    doc=(
        "Lexicon-based sentiment scoring: positive/negative word "
        "counts against a broadcast lexicon (array literals compiled "
        "into codegen — no join, no UDF), integer polarity and one "
        "final ratio. The classic curation signal for tone filtering; "
        "per-row map work only, so at 100 TB it rides the same scan "
        "as the other text metrics."
    ),
)
def sentiment_lexicon_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = F.split(F.col("text"), " ")
    pos_arr = F.array(*[F.lit(s) for s in SENT_POS])
    neg_arr = F.array(*[F.lit(s) for s in SENT_NEG])
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.filter(w, lambda x: F.array_contains(pos_arr, x))).alias(
            "n_pos"
        ),
        F.size(F.filter(w, lambda x: F.array_contains(neg_arr, x))).alias(
            "n_neg"
        ),
    )
    pol = (F.col("n_pos") - F.col("n_neg")).cast("bigint")
    denom = F.col("n_pos") + F.col("n_neg")
    return d.select(
        "doc_id",
        "n_pos",
        "n_neg",
        pol.alias("polarity"),
        F.when(denom > 0, pol.cast("double") / denom)
        .otherwise(F.lit(0.0))
        .alias("sentiment"),
    )


# --------------------------------------------------------------------------
# Retrieval chunking (RAG / training-context preparation)
# --------------------------------------------------------------------------
RAG_CHUNK = 16  # words per chunk
RAG_STRIDE = 12  # chunk start stride (overlap = CHUNK - STRIDE = 4 words)


@register(
    "chunk_for_retrieval",
    f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    m AS (
      SELECT doc_id, w, len(w) AS n,
             CASE WHEN len(w) <= {RAG_CHUNK} THEN 1
                  ELSE (len(w) - {RAG_CHUNK} + {RAG_STRIDE} - 1)
                       // {RAG_STRIDE} + 1 END AS n_chunks
      FROM d),
    c AS (
      SELECT doc_id, w,
             unnest(generate_series(0, n_chunks - 1)) AS j
      FROM m)
    SELECT doc_id,
           j AS chunk_idx,
           CAST(len(list_slice(w, j*{RAG_STRIDE}+1,
                               j*{RAG_STRIDE}+{RAG_CHUNK})) AS BIGINT)
             AS n_words,
           {h28_sql(f"array_to_string(list_slice(w, j*{RAG_STRIDE}+1, j*{RAG_STRIDE}+{RAG_CHUNK}), ' ')")}
             AS chunk_hash
    FROM c
    ORDER BY doc_id, chunk_idx
    """,
    "text",
    doc=(
        "Overlapping word-window chunking for retrieval / context "
        f"packing: {RAG_CHUNK}-word chunks every {RAG_STRIDE} words "
        f"({RAG_CHUNK - RAG_STRIDE}-word overlap so no boundary "
        "sentence is ever split away from both neighbors), each chunk "
        "carrying its h28 content hash — the primitive RAG ingestion "
        "and long-context training-example prep both start from, and "
        "the hash feeds the same exact-dedup machinery as documents. "
        "Pure per-row map work (split once, slice per chunk index, no "
        "joins): at 100 TB this is one scan riding whole-stage "
        "codegen, output partitionable by chunk_hash for dedup."
    ),
)
def chunk_for_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = F.col("w")
    n = F.size(w)
    n_chunks = F.when(n <= RAG_CHUNK, F.lit(1)).otherwise(
        ((n - RAG_CHUNK + RAG_STRIDE - 1) / RAG_STRIDE).cast("int") + 1
    )
    d = (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.split(F.col("text"), " ").alias("w"))
        .select(
            "doc_id",
            "w",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
    )
    chunk = F.slice(w, F.col("chunk_idx") * RAG_STRIDE + 1, RAG_CHUNK)
    return (
        d.select(
            "doc_id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.size(chunk).cast("bigint").alias("n_words"),
            h28(F.concat_ws(" ", chunk)).alias("chunk_hash"),
        )
        .orderBy("doc_id", "chunk_idx")
    )
