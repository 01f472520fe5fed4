"""Corpus-quality operators for LLM training-data pipelines, round 4.

First-class curation primitives the 100 TB pipeline needs beyond
the round-1..3 set (text.py, dedup.py, pipeline.py):

- C4-style duplicate-chunk statistics (the "remove repeated lines
  across the corpus" signal from the C4 paper, on fixed-width word
  chunks since the synthetic corpus has no newlines),
- tf-idf top terms per source (integer-exact scoring: rank by
  ``tf * N / df`` as ONE double division of exact integers, so the
  ordering is bit-identical across engines — ln()-based idf is not),
- vocabulary growth / hapax statistics (type-token ratio per source,
  the classic corpus-diversity signal),
- PII pseudonymization over identifier-bearing columns (digit-run
  masking with redaction counts; the e-mail/phone regex rules are
  exercised on constructed strings in tests/test_operators_lib.py
  since the synthetic corpus contains no organic PII),
- C4-style heuristic quality filtering reported as per-source
  retention,
- out-of-vocabulary rate against the corpus head vocabulary (the
  integer-exact stand-in for LM-perplexity scoring).

Determinism contract with the DuckDB oracle (same as text.py): all
cross-row aggregates are integer sums; doubles appear only in final
single divisions of integers (IEEE-identical in both engines). The
portable hash is h28 (md5-prefix) shared with text.py.

Scale notes per operator are in each docstring; none of these shuffle
anything wider than (key, counters) rows, and the only join
(duplicate-chunk) is an equi-join on the chunk hash — the same shape
as exact dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from barco_spark.registry import register
from barco_spark.operators.text import h28, h28_sql, words_col
from barco_spark.tables import t

CHUNK = 10  # words per chunk for the C4-style duplicate-chunk pass


@register(
    "dedup_chunk_share",
    f"""
    WITH w AS (
      SELECT doc_id, source, string_split(text, ' ') AS words FROM documents
    ),
    c AS (
      SELECT doc_id, source,
             unnest(list_transform(
               range(0, (len(words) + {CHUNK - 1}) // {CHUNK}),
               j -> {h28_sql(f"array_to_string(list_slice(words, j*{CHUNK}+1, j*{CHUNK}+{CHUNK}), ' ')")}
             )) AS ch
      FROM w
    ),
    cnt AS (SELECT ch, COUNT(*) AS n FROM c GROUP BY ch)
    SELECT c.source,
           COUNT(DISTINCT c.doc_id) AS n_docs,
           COUNT(*) AS total_chunks,
           CAST(SUM(CASE WHEN cnt.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS dup_chunks,
           CAST(SUM(CASE WHEN cnt.n > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS dup_share
    FROM c JOIN cnt USING (ch)
    GROUP BY c.source
    """,
    "text",
    doc=(
        "C4-style duplicate-chunk statistics: documents are cut into "
        f"fixed {CHUNK}-word chunks (the corpus has no newlines, so "
        "fixed-width chunks stand in for C4's line split), each chunk "
        "h28-hashed, counted corpus-wide, and every occurrence of a "
        "chunk seen more than once is flagged. Per-source duplicated-"
        "chunk share is THE boilerplate signal C4 filters on. Plan: "
        "one explode, one hash-aggregate on chunk hash (map-side "
        "combinable), one equi-join back on the hash — the exact-dedup "
        "shuffle shape; nothing wider than (hash, count) moves twice."
    ),
)
def dedup_chunk_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = words_col()
    n_chunks = F.expr(f"(size(split(text, ' ')) + {CHUNK - 1}) div {CHUNK}")
    chunks = F.transform(
        F.sequence(F.lit(0), (n_chunks - 1).cast("int")),
        lambda j: h28(F.concat_ws(" ", F.slice(w, j * CHUNK + 1, CHUNK))),
    )
    c = (
        t(spark, sf_dir, "documents")
        .select("doc_id", "source", F.explode(chunks).alias("ch"))
    )
    # window count over the chunk hash, not agg + self-join: the join
    # re-executes the chunking explode on both sides; the window
    # shuffles the chunk stream once (measured 1.8x at sf0.1)
    cw = c.withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("ch"))
    )
    dup = F.when(F.col("n") > 1, F.lit(1)).otherwise(F.lit(0))
    return (
        cw.groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("total_chunks"),
            F.sum(dup).cast("bigint").alias("dup_chunks"),
            (F.sum(dup).cast("double") / F.count(F.lit(1))).alias("dup_share"),
        )
    )


@register(
    "tfidf_top_terms",
    """
    WITH terms AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    tf AS (SELECT source, term, COUNT(*) AS tf FROM terms GROUP BY source, term),
    df AS (
      SELECT term, COUNT(*) AS df
      FROM (SELECT DISTINCT doc_id, term FROM terms)
      GROUP BY term
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.source, tf.term, tf.tf, df.df,
             CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS score
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT source, term, tf, df, score
    FROM (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY score DESC, term ASC
             ) AS rn
      FROM scored
    )
    WHERE rn <= 5
    """,
    "text",
    doc=(
        "tf-idf top-5 terms per source, integer-exact: score = "
        "tf * N / df as ONE double division of exact integer products, "
        "so ranking (score desc, term asc) is bit-identical across "
        "engines — ln()-based idf would differ in ulps and flip "
        "near-ties. Plan: one explode feeds both the tf aggregate and "
        "the distinct-doc df aggregate; N is a 1-row broadcast cross "
        "join; rank <= 5 compiles to WindowGroupLimit (map-side top-k "
        "per source before the window shuffle)."
    ),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    terms = docs.select("doc_id", "source", F.explode(words_col()).alias("term"))
    # NOTE on plan shape: tf and df both derive from the explode, so
    # the join re-executes it — the same re-execution the chunk-dedup
    # family eliminated with a window over the count key. Here the
    # window variant was MEASURED a wash at sf0.1 (0.98 vs 1.06 s) and
    # 2.7x WORSE at sf0.01: df's window must shuffle the full
    # (doc,term) stream by term, while this plan shuffles only the
    # vocab-sized df table and pays a second (embarrassingly parallel)
    # scan — the shuffle-minimizing trade, kept deliberately.
    tf = terms.groupBy("source", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = (
        terms.select("doc_id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            "term",
            "tf",
            "df",
            ((F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy("source").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )


@register(
    "vocab_growth_stats",
    """
    WITH terms AS (
      SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tc AS (SELECT source, term, COUNT(*) AS cnt FROM terms GROUP BY source, term)
    SELECT source,
           CAST(SUM(cnt) AS BIGINT) AS total_tokens,
           COUNT(*) AS distinct_terms,
           CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS hapax_terms,
           CAST(COUNT(*) AS DOUBLE) / SUM(cnt) AS type_token_ratio
    FROM tc
    GROUP BY source
    """,
    "text",
    doc=(
        "Vocabulary growth per source: total tokens, distinct terms, "
        "hapax legomena (terms seen once), and the type-token ratio — "
        "the corpus-diversity / Zipf-head signal used to spot template-"
        "generated sources. Two cascaded hash aggregations on the same "
        "(source, term) partitioning (the second is map-side local); "
        "shuffle volume is vocabulary size, not token count."
    ),
)
def vocab_growth_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    tc = (
        t(spark, sf_dir, "documents")
        .select("source", F.explode(words_col()).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    hapax = F.when(F.col("cnt") == 1, F.lit(1)).otherwise(F.lit(0))
    return tc.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("total_tokens"),
        F.count(F.lit(1)).alias("distinct_terms"),
        F.sum(hapax).cast("bigint").alias("hapax_terms"),
        (F.count(F.lit(1)).cast("double") / F.sum("cnt")).alias("type_token_ratio"),
    )


VOCAB_KS = (100, 1000, 10000)  # candidate tokenizer vocabulary sizes


@register(
    "vocab_coverage_report",
    f"""
    WITH terms AS (
      SELECT unnest(string_split(text, ' ')) AS term FROM documents),
    tc AS (SELECT term, COUNT(*) AS cnt FROM terms GROUP BY term),
    ranked AS (
      SELECT cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS rnk
      FROM tc)
    SELECT CAST(SUM(cnt) AS BIGINT) AS total_tokens,
           COUNT(*) AS n_types,
           {", ".join(
        f'''CAST(SUM(CASE WHEN rnk <= {k} THEN cnt ELSE 0 END) AS BIGINT)
             AS covered_{k},
           CAST(SUM(CASE WHEN rnk <= {k} THEN cnt ELSE 0 END) AS DOUBLE)
             / SUM(cnt) AS coverage_{k}''' for k in VOCAB_KS)}
    FROM ranked
    """,
    "text",
    doc=(
        "Tokenizer-vocabulary sizing readout: what fraction of ALL "
        "token occurrences the top-K most frequent types cover, at "
        f"K = {VOCAB_KS} — the cumulative-coverage curve every "
        "vocabulary-size decision reads (OOV rate at size K = "
        "1 - coverage_K). One token explode collapsing immediately to "
        "a VOCABULARY-sized count table (map-side combined, the "
        "vocab_growth_stats shape), then a frequency-rank window and "
        "one row of conditional sums. The global rank runs over the "
        "Zipf-bounded type table, never the corpus — at 100 TB the "
        "vocabulary is millions of rows where the corpus is trillions, "
        "so the single-partition rank window is vocabulary-priced by "
        "construction. Ties (equal counts) break on the term string "
        "in both engines, so coverage at each K is bit-exact."
    ),
)
def vocab_coverage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    tc = (
        t(spark, sf_dir, "documents")
        .select(F.explode(words_col()).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ranked = tc.select(
        "cnt",
        F.row_number()
        .over(Window.orderBy(F.col("cnt").desc(), "term"))
        .alias("rnk"),
    )
    in_k = lambda k: F.when(F.col("rnk") <= k, F.col("cnt")).otherwise(  # noqa: E731
        F.lit(0)
    )
    aggs = [
        F.sum("cnt").cast("bigint").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_types"),
    ]
    for k in VOCAB_KS:
        aggs.append(F.sum(in_k(k)).cast("bigint").alias(f"covered_{k}"))
        aggs.append(
            (F.sum(in_k(k)).cast("double") / F.sum("cnt")).alias(
                f"coverage_{k}"
            )
        )
    return ranked.agg(*aggs)


@register(
    "pii_pseudonymize",
    """
    WITH m AS (
      SELECT c_mktsegment,
             c_name,
             regexp_replace(c_name, '[0-9]+', '<ID>', 'g') AS masked,
             CAST(length(c_name)
               - length(regexp_replace(c_name, '[0-9]', '', 'g')) AS BIGINT)
               AS n_digits
      FROM customer
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_rows,
           CAST(SUM(n_digits) AS BIGINT) AS digits_masked,
           COUNT(DISTINCT masked) AS distinct_masked_forms
    FROM m
    GROUP BY c_mktsegment
    """,
    "pipeline",
    doc=(
        "PII pseudonymization: digit-run identifiers replaced with "
        "'<ID>' and redaction volume counted per market segment — the "
        "de-identification pass a training-data pipeline runs before "
        "release. The digit rule runs live on the customer table "
        "(names embed numeric ids); the e-mail/phone/IPv4 rules share "
        "the same regexp_replace machinery and are verified on "
        "constructed strings in tests/test_operators_lib.py (no "
        "organic PII exists in the synthetic corpus). Pure per-row "
        "regex inside codegen + one hash aggregation; at 100 TB this "
        "is one scan with shuffle bounded by segment cardinality."
    ),
)
def pii_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = t(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.regexp_replace("c_name", "[0-9]+", "<ID>").alias("masked"),
        (
            F.length("c_name") - F.length(F.regexp_replace("c_name", "[0-9]", ""))
        )
        .cast("bigint")
        .alias("n_digits"),
    )
    return m.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_digits").cast("bigint").alias("digits_masked"),
        F.countDistinct("masked").alias("distinct_masked_forms"),
    )


# Reusable PII masking rules (RE2-safe: no lookaround, portable to the
# DuckDB oracle and to any regex engine a downstream pipeline uses).
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?[0-9][0-9()\- ]{7,}[0-9]", "<PHONE>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("id_digits", r"[0-9]+", "<ID>"),
]


def mask_pii(col: Column, rules: list[str] | None = None) -> Column:
    """Apply the PII_RULES chain (or a named subset) to a string column.

    Rule order matters: e-mail/phone/IP run before the generic digit
    rule so structured identifiers keep their typed tags.
    """
    wanted = set(rules) if rules is not None else {n for n, _, _ in PII_RULES}
    out = col
    for name, pat, tag in PII_RULES:
        if name in wanted:
            out = F.regexp_replace(out, pat, tag)
    return out


@register(
    "quality_filter_c4",
    f"""
    WITH m AS (
      SELECT source,
             len(string_split(text, ' ')) AS n_words,
             CAST(length(replace(text, ' ', '')) AS DOUBLE)
               / len(string_split(text, ' ')) AS mean_word_len,
             (length(text) - length(replace(text, '{{', ''))) AS n_curly
      FROM documents
    ),
    flags AS (
      SELECT source,
             CASE WHEN n_words >= 50 AND n_words <= 100000
                   AND mean_word_len >= 2.0 AND mean_word_len <= 12.0
                   AND n_curly = 0
                  THEN 1 ELSE 0 END AS keep
      FROM m
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(keep) AS BIGINT) AS n_kept,
           CAST(SUM(keep) AS DOUBLE) / COUNT(*) AS retention
    FROM flags GROUP BY source
    """,
    "pipeline",
    doc=(
        "C4-style heuristic quality filter, reported as per-source "
        "retention: word-count bounds, mean-word-length bounds, and "
        "the no-curly-brace rule (code leakage), composed exactly like "
        "the C4 paper's line/document rules. The per-doc mean word "
        "length is one double division of exact integers, so keep "
        "flags match the oracle bit-for-bit. Pure per-row expressions "
        "inside codegen + one hash aggregation — a filter pass over "
        "100 TB is one scan with shuffle bounded by source count."
    ),
)
def quality_filter_c4(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = words_col()
    n_words = F.size(w)
    mean_wl = (
        F.length(F.regexp_replace(F.col("text"), " ", "")).cast("double") / n_words
    )
    n_curly = F.length(F.col("text")) - F.length(
        F.regexp_replace(F.col("text"), "\\{", "")
    )
    keep = (
        F.when(
            (n_words >= 50)
            & (n_words <= 100000)
            & (mean_wl >= 2.0)
            & (mean_wl <= 12.0)
            & (n_curly == 0),
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    return (
        t(spark, sf_dir, "documents")
        .select("source", keep.alias("keep"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("keep").cast("bigint").alias("n_kept"),
            (F.sum("keep").cast("double") / F.count(F.lit(1))).alias("retention"),
        )
    )


OOV_VOCAB_K = 25  # head-vocabulary size for the OOV-rate signal


@register(
    "oov_rate_stats",
    f"""
    WITH terms AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    vocab AS (
      SELECT term FROM (
        SELECT term, COUNT(*) AS freq FROM terms GROUP BY term
        ORDER BY freq DESC, term LIMIT {OOV_VOCAB_K}
      )
    ),
    flagged AS (
      SELECT t.source,
             CASE WHEN v.term IS NULL THEN 1 ELSE 0 END AS oov
      FROM terms t LEFT JOIN vocab v ON t.term = v.term
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(oov) AS BIGINT) AS n_oov,
           CAST(SUM(oov) AS DOUBLE) / COUNT(*) AS oov_rate
    FROM flagged GROUP BY source
    """,
    "text",
    doc=(
        "Out-of-vocabulary rate per source against the corpus's own "
        f"top-{OOV_VOCAB_K} head vocabulary — the integer-exact stand-"
        "in for LM-perplexity quality scoring (log-prob scoring would "
        "diverge from any oracle by ulps; OOV counting cannot). The "
        "head vocabulary is a tiny driver-side top-k broadcast into a "
        "left join, token flags partial-aggregate before the one "
        "shuffle — at 100 TB this is the standard broadcast-lookup "
        "scoring shape, with the vocab table swappable for a real "
        "tokenizer's."
    ),
)
def oov_rate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    terms = t(spark, sf_dir, "documents").select(
        "source", F.explode(words_col()).alias("term")
    )
    vocab = (
        terms.groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("term"))
        .limit(OOV_VOCAB_K)
        .select("term", F.lit(1).alias("_in_vocab"))
    )
    flagged = terms.join(F.broadcast(vocab), "term", "left").select(
        "source",
        F.when(F.col("_in_vocab").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("oov"),
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("oov").cast("bigint").alias("n_oov"),
        (F.sum("oov").cast("double") / F.count(F.lit(1))).alias("oov_rate"),
    )


_NOV_K = 8  # novelty n-gram width


def _nov_grams_sql() -> str:
    """DuckDB rendering of the distinct 8-gram list per document."""
    joined = " || ' ' || ".join(f"words[i+{j}]" for j in range(_NOV_K))
    return (
        f"list_distinct(CASE WHEN len(words) >= {_NOV_K}"
        f" THEN list_transform(range(1, len(words) - {_NOV_K - 2}),"
        f" i -> {joined})"
        f" ELSE [array_to_string(words, ' ')] END)"
    )


@register(
    "doc_novelty_score",
    f"""
    WITH g AS (
      SELECT doc_id, unnest({_nov_grams_sql()}) AS gram
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    ),
    gh AS (SELECT doc_id, {h28_sql('gram')} AS h FROM g),
    cnt AS (SELECT h, COUNT(*) AS n_docs FROM gh GROUP BY h)
    SELECT gh.doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN cnt.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared,
           1.0 - CAST(SUM(CASE WHEN cnt.n_docs > 1 THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*) AS novelty
    FROM gh JOIN cnt USING (h)
    GROUP BY gh.doc_id
    """,
    "text",
    doc=(
        "Per-document novelty: the share of a doc's DISTINCT 8-gram "
        "shingles that appear in no other document (each doc "
        "contributes a gram once, so the corpus-wide count equals "
        "containing-doc count). Low novelty flags boilerplate and "
        "memorization-risk content — the doc-granular twin of "
        "dedup_chunk_share's per-source diagnostic. One explode, one "
        "hash agg (map-side combined), then the count table joins "
        "back on the SAME hash key (no broadcast hint: the gram-count "
        "table is corpus-sized, so it must stay a partitioned hash "
        "join — AQE may still broadcast at small SF). The shuffles "
        "carry (gram-hash, count) pairs only, never text."
    ),
)
def doc_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from barco_spark.operators.text import kgrams

    w = t(spark, sf_dir, "documents").select(
        "doc_id", words_col().alias("words")
    )
    gh = w.select(
        "doc_id",
        F.explode(
            F.array_distinct(kgrams(F.col("words"), _NOV_K))
        ).alias("gram"),
    ).select("doc_id", h28(F.col("gram")).alias("h"))
    # window count over the gram hash, not agg + self-join: the join
    # re-executes the shingle explode on both sides (same finding as
    # dedup_cdc_chunks, measured 1.8x on the chunk-dedup family)
    ghw = gh.withColumn(
        "n_docs", F.count(F.lit(1)).over(Window.partitionBy("h"))
    )
    shared = F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)).cast("bigint")
    return (
        ghw.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            shared.alias("n_shared"),
            (
                F.lit(1.0)
                - shared.cast("double") / F.count(F.lit(1))
            ).alias("novelty"),
        )
    )


@register(
    "char_diversity_stats",
    """
    WITH ch AS (
      SELECT doc_id, unnest(regexp_split_to_array(text, '')) AS c
      FROM documents
    ),
    cc AS (SELECT doc_id, c, COUNT(*) AS n_c FROM ch GROUP BY doc_id, c)
    SELECT doc_id,
           CAST(SUM(n_c) AS BIGINT) AS n_chars_counted,
           COUNT(*) AS n_distinct_chars,
           CAST(SUM(n_c * CAST(FLOOR(LOG2(n_c)) AS BIGINT)) AS BIGINT)
             AS repeat_mass_q,
           CAST(SUM(n_c * CAST(FLOOR(LOG2(n_c)) AS BIGINT)) AS DOUBLE)
             / SUM(n_c) AS repeat_mass_per_char
    FROM cc GROUP BY doc_id
    """,
    "text",
    doc=(
        "Character-diversity profile — the gibberish/low-entropy "
        "detector: per-doc character counts reduced to an integer-"
        "quantized repeated-mass sum (n_c * floor(log2 n_c); the "
        "entropy complement, exact cross-engine unlike float Shannon "
        "entropy) plus distinct-char count. Degenerate docs (one char "
        "repeated, tiny alphabets) score high repeat mass / low "
        "distinct count. Per-row split + two hash aggs that share the "
        "doc_id key; no text ever shuffles (chars reduce to counts "
        "map-side)."
    ),
)
def char_diversity_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # '(?!^)' zero-width split -> per-char array; Java split keeps a
    # trailing zero-width match as '', dropped below (DuckDB's RE2
    # split produces no empties)
    ch = (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split(F.col("text"), "(?!^)")).alias("c"))
        .filter(F.col("c") != "")
    )
    cc = ch.groupBy("doc_id", "c").agg(F.count(F.lit(1)).alias("n_c"))
    mass = F.sum(
        F.col("n_c") * F.floor(F.log2("n_c")).cast("bigint")
    ).cast("bigint")
    return cc.groupBy("doc_id").agg(
        F.sum("n_c").cast("bigint").alias("n_chars_counted"),
        F.count(F.lit(1)).alias("n_distinct_chars"),
        mass.alias("repeat_mass_q"),
        (mass.cast("double") / F.sum("n_c")).alias("repeat_mass_per_char"),
    )


_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+?[0-9][0-9()\- ]{7,}[0-9]"
_PII_IPV4 = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"


@register(
    "pii_incidence_report",
    f"""
    WITH flags AS (
      SELECT source,
             CASE WHEN regexp_matches(text, '{_PII_EMAIL}') THEN 1 ELSE 0 END AS has_email,
             CASE WHEN regexp_matches(text, '{_PII_PHONE}') THEN 1 ELSE 0 END AS has_phone,
             CASE WHEN regexp_matches(text, '{_PII_IPV4}') THEN 1 ELSE 0 END AS has_ipv4
      FROM documents)
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(has_email) AS BIGINT) AS email_docs,
           CAST(SUM(has_phone) AS BIGINT) AS phone_docs,
           CAST(SUM(has_ipv4) AS BIGINT) AS ipv4_docs,
           CAST(SUM(CASE WHEN has_email + has_phone + has_ipv4 > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS pii_docs,
           CAST(SUM(CASE WHEN has_email + has_phone + has_ipv4 > 0
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS pii_rate
    FROM flags
    GROUP BY source
    ORDER BY source
    """,
    "text",
    doc=(
        "PII exposure audit before release/training: per source, how "
        "many documents contain e-mail / phone-shaped / IPv4 matches "
        "(the same rule patterns pii_pseudonymize scrubs with) and the "
        "any-PII document rate. The patterns are restricted to the "
        "regex subset Java and RE2 evaluate identically, so even the "
        "detector itself is oracle-exact. One narrow regex map + one "
        "hash aggregation; at 100 TB this is the audit you run FIRST — "
        "it prices the scrubbing pass (pii_pseudonymize) and flags "
        "sources whose PII density means exclusion beats masking."
    ),
)
def pii_incidence_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from barco_spark.tables import t

    docs = t(spark, sf_dir, "documents")
    has = lambda pat: F.col("text").rlike(pat).cast("int")  # noqa: E731
    flags = docs.select(
        "source",
        has(_PII_EMAIL).alias("has_email"),
        has(_PII_PHONE).alias("has_phone"),
        has(_PII_IPV4).alias("has_ipv4"),
    )
    any_pii = (
        F.col("has_email") + F.col("has_phone") + F.col("has_ipv4") > 0
    ).cast("int")
    return (
        flags.withColumn("any_pii", any_pii)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("has_email").cast("bigint").alias("email_docs"),
            F.sum("has_phone").cast("bigint").alias("phone_docs"),
            F.sum("has_ipv4").cast("bigint").alias("ipv4_docs"),
            F.sum("any_pii").cast("bigint").alias("pii_docs"),
            (F.sum("any_pii").cast("double") / F.count(F.lit(1))).alias(
                "pii_rate"
            ),
        )
        .orderBy("source")
    )


@register(
    "gopher_dup_ngram_chars",
    """
    WITH w AS (
      SELECT doc_id, source, string_split(text, ' ') AS words
      FROM documents),
    tg AS (
      SELECT doc_id, source,
             unnest(CASE WHEN len(words) >= 3
               THEN list_transform(range(1, len(words) - 1),
                    i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
               ELSE [array_to_string(words, ' ')] END) AS g
      FROM w),
    per_gram AS (
      SELECT doc_id, source, g, COUNT(*) AS cnt, length(g) AS glen
      FROM tg GROUP BY doc_id, source, g),
    per_doc AS (
      SELECT doc_id, source,
             CAST(SUM(cnt * glen) AS BIGINT) AS total_chars,
             CAST(SUM(CASE WHEN cnt >= 2 THEN cnt * glen ELSE 0 END)
                  AS BIGINT) AS dup_chars
      FROM per_gram GROUP BY doc_id, source)
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN dup_chars * 100 > 18 * total_chars
                         THEN 1 ELSE 0 END) AS BIGINT) AS flagged_docs,
           CAST(SUM(dup_chars) AS BIGINT) AS sum_dup_chars,
           CAST(SUM(total_chars) AS BIGINT) AS sum_total_chars,
           CAST(SUM(dup_chars) AS DOUBLE) / SUM(total_chars)
             AS pooled_dup_share
    FROM per_doc
    GROUP BY source
    ORDER BY source
    """,
    "text",
    doc=(
        "The Gopher repetition rule this suite was still missing: the "
        "fraction of characters inside DUPLICATED 3-grams per document "
        "(Rae et al. drop docs above 0.18 for n=3), pooled per source "
        "plus the flagged-document count (integer threshold compare: "
        "dup*100 > 18*total, no float boundary). Same scale posture as "
        "repetition_stats: the duplicate mass is computed INSIDE the "
        "row by folding the SORTED trigram array (equal grams are "
        "adjacent, so a run of length c >= 2 contributes c*len chars), "
        "making the only shuffle the per-source aggregation — no "
        "per-(doc, gram) hash table ever materializes, which is what "
        "kills the naive explode plan at corpus scale."
    ),
)
def gopher_dup_ngram_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from barco_spark.operators.text import kgrams
    from barco_spark.tables import spread_rows, t

    # row-sized spread below the trigram sort+fold — an interpreted
    # per-row aggregate over the whole trigram array (r12, guide §2.5):
    # A/B 0.39 s vs 0.69 s plain — see tables.spread_rows
    docs = spread_rows(
        t(spark, sf_dir, "documents"), spark, sf_dir, "doc_id"
    )
    tg = kgrams(F.split(F.col("text"), " "), 3)
    # fold over the sorted trigram array: total chars, and chars in
    # duplicated runs (on the 2nd occurrence the 1st retroactively
    # counts too, hence the 2*len step; 3rd+ add len each)
    stats = F.expr(
        """
        aggregate(
          array_sort(tg),
          struct(cast(null as string) as prev, 0L as run,
                 0L as total, 0L as dup),
          (acc, x) -> struct(
            x as prev,
            if(x <=> acc.prev, acc.run + 1, 1L) as run,
            acc.total + length(x) as total,
            acc.dup + if(x <=> acc.prev,
                         if(acc.run + 1 = 2L, 2L * length(x), length(x)),
                         0L) as dup),
          acc -> struct(acc.total as total, acc.dup as dup))
        """
    )
    per_doc = docs.select("doc_id", "source", tg.alias("tg")).select(
        "doc_id",
        "source",
        stats.alias("s"),
    ).select(
        "doc_id",
        "source",
        F.col("s.total").alias("total_chars"),
        F.col("s.dup").alias("dup_chars"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                (F.col("dup_chars") * 100 > F.col("total_chars") * 18).cast(
                    "long"
                )
            )
            .cast("bigint")
            .alias("flagged_docs"),
            F.sum("dup_chars").cast("bigint").alias("sum_dup_chars"),
            F.sum("total_chars").cast("bigint").alias("sum_total_chars"),
            (
                F.sum("dup_chars").cast("double") / F.sum("total_chars")
            ).alias("pooled_dup_share"),
        )
        .orderBy("source")
    )


_CDC_DIV = 16  # boundary when h28(word) % 16 == 0 -> ~16-word expected chunks


def cdc_chunk_array(text_col: str = "text") -> Column:
    """Content-defined chunks of `text_col` as an array<string>: a word
    CLOSES its chunk when h28(word) % _CDC_DIV == 0. Single in-row
    aggregate() fold; shared by dedup_cdc_chunks and the differential
    fuzz test so the Spark chunker and the DuckDB positional oracle
    cannot drift apart silently."""
    # r13 (guide §1.2 per-task work): the fold is interpreted
    # (CodegenFallback), and its original form evaluated the md5
    # boundary test AND the concat step TWICE per word (once in each
    # struct field).  Hash once per word in a preceding transform, and
    # branch with if(cond, struct_a, struct_b) so only the taken
    # branch's concat evaluates — same chunks bit-for-bit (pinned by
    # the differential fuzz test and the oracle pairing).
    step = "if(acc.cur is null, x.w, concat(acc.cur, ' ', x.w))"
    return F.expr(
        f"""
        aggregate(
          transform(split({text_col}, ' '), w -> struct(
            w as w,
            cast(conv(substring(md5(w), 1, 7), 16, 10) as bigint)
              % {_CDC_DIV} = 0 as b)),
          struct(cast(array() as array<string>) as done,
                 cast(null as string) as cur),
          (acc, x) -> if(x.b,
            struct(array_append(acc.done, {step}) as done,
                   cast(null as string) as cur),
            struct(acc.done as done, {step} as cur)),
          acc -> if(acc.cur is null, acc.done,
                    array_append(acc.done, acc.cur)))
        """
    )


CDC_CHUNKS_SQL = f"""
    pw AS (
      SELECT doc_id, t.i, words[t.i] AS word,
             CASE WHEN ('0x' || substr(md5(words[t.i]), 1, 7))::BIGINT
                       % {_CDC_DIV} = 0
                  THEN 1 ELSE 0 END AS b
      FROM w, unnest(range(1, len(words) + 1)) AS t(i)),
    cw AS (
      SELECT doc_id, i, word,
             COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS cid
      FROM pw),
    c AS (
      SELECT doc_id, cid, string_agg(word, ' ' ORDER BY i) AS chunk
      FROM cw GROUP BY doc_id, cid)
"""



@register(
    "dedup_cdc_chunks",
    f"""
    WITH w AS (
      SELECT doc_id, source, string_split(text, ' ') AS words FROM documents),
    pw AS (
      SELECT doc_id, source, t.i, words[t.i] AS word,
             CASE WHEN ('0x' || substr(md5(words[t.i]), 1, 7))::BIGINT
                       % {_CDC_DIV} = 0
                  THEN 1 ELSE 0 END AS b
      FROM w, unnest(range(1, len(words) + 1)) AS t(i)),
    cw AS (
      SELECT doc_id, source, i, word,
             COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS cid
      FROM pw),
    c AS (
      SELECT doc_id, source,
             ('0x' || substr(md5(string_agg(word, ' ' ORDER BY i)), 1, 7))::BIGINT
               AS ch,
             length(string_agg(word, ' ' ORDER BY i)) AS clen
      FROM cw GROUP BY doc_id, source, cid),
    cnt AS (SELECT ch, COUNT(*) AS n FROM c GROUP BY ch)
    SELECT c.source,
           COUNT(DISTINCT c.doc_id) AS n_docs,
           COUNT(*) AS total_chunks,
           CAST(SUM(CASE WHEN cnt.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS dup_chunks,
           CAST(SUM(c.clen) AS BIGINT) AS total_mass,
           CAST(SUM(CASE WHEN cnt.n > 1 THEN c.clen ELSE 0 END) AS BIGINT)
             AS dup_mass,
           CAST(SUM(CASE WHEN cnt.n > 1 THEN c.clen ELSE 0 END) AS DOUBLE)
             / SUM(c.clen) AS dup_mass_share
    FROM c JOIN cnt USING (ch)
    GROUP BY c.source
    ORDER BY c.source
    """,
    "dedup",
    doc=(
        "Content-defined chunking dedup (the rsync/LBFS rolling-"
        "boundary trick used by dataset dedup systems): a word ends a "
        "chunk when its h28 hash is 0 mod 16, so chunk boundaries are "
        "CONTENT-anchored — insert one word at the top of a copied "
        "document and every fixed-width chunk shifts (defeating "
        "dedup_chunk_share), but CDC boundaries re-synchronize within "
        "one chunk. Reports per-source duplicated-chunk count and "
        "character mass. Spark plan: the chunker is a single in-row "
        "aggregate() fold over the word array (cur resets at each "
        "boundary, so concat work is bounded by chunk length, total "
        "O(chars) per doc — no per-word explode ever materializes); "
        "then ONE explode of ~chars/16-word chunks, one map-side-"
        "combinable count on the chunk hash, one equi-join back — the "
        "exact-dedup shuffle shape at 1/16th the row volume of a "
        "word-level pass. The DuckDB oracle computes identical chunks "
        "positionally (cumulative boundary count + ordered string_agg)."
    ),
)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from barco_spark.tables import spread

    chunks = cdc_chunk_array()
    # spread the narrow scan below the Gear-hash chunker fold (r12,
    # guide §2.5): the fold is an interpreted per-row accumulator — the
    # query's dominant cost, ~1.1 s on ONE task at sf0.1 (profile) —
    # and parallelizing it wins every interleaved rep (min 0.99 s vs
    # 1.46 s plain, ABBA same-JVM).  No-op at warehouse scan widths;
    # the sibling text feeders measured as washes and stay unspread
    # (see OPTIMIZATION_r12.md).
    c = (
        spread(t(spark, sf_dir, "documents"), spark, sf_dir)
        .select("doc_id", "source", F.explode(chunks).alias("chunk"))
        .select(
            "doc_id",
            "source",
            h28(F.col("chunk")).alias("ch"),
            F.length("chunk").alias("clen"),
        )
    )
    # global occurrence count as a WINDOW over the chunk hash, not an
    # agg + self-join: the join plan re-executes the chunker fold on
    # BOTH sides (the fold dominates this query's cost), while the
    # window shuffles the chunk stream once and folds once — measured
    # 1.8x faster at sf0.1
    cw = c.withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("ch"))
    )
    dup = (F.col("n") > 1).cast("int")
    return (
        cw.groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("total_chunks"),
            F.sum(dup).cast("bigint").alias("dup_chunks"),
            F.sum("clen").cast("bigint").alias("total_mass"),
            F.sum(dup * F.col("clen")).cast("bigint").alias("dup_mass"),
            (
                F.sum(dup * F.col("clen")).cast("double") / F.sum("clen")
            ).alias("dup_mass_share"),
        )
        .orderBy("source")
    )


_VOCAB_KS = (100, 1000, 10000)


@register(
    "vocab_coverage_curve",
    f"""
    WITH counts AS (
      SELECT term, COUNT(*) AS c FROM (
        SELECT unnest(string_split(text, ' ')) AS term FROM documents)
      GROUP BY term),
    ranked AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, term) AS rn
      FROM counts),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM ranked)
    SELECT k,
           CAST(covered AS BIGINT) AS covered_tokens,
           tot.total AS total_tokens,
           CAST(covered AS DOUBLE) / tot.total AS coverage
    FROM (
      {" UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS k,"
        f" (SELECT SUM(c) FROM ranked WHERE rn <= {k}) AS covered"
        for k in _VOCAB_KS)}
    ) CROSS JOIN tot
    ORDER BY k
    """,
    "text",
    doc=(
        "Vocabulary coverage curve: the share of all token occurrences "
        "covered by the top-K most frequent types, for K in 100 / 1k / "
        "10k — THE readout for choosing a tokenizer vocab size or an "
        "OOV cutoff (Zipf corpora saturate fast; a flat curve means "
        "noisy/gibberish text). One map-side-combinable term count "
        "(shuffle volume = vocabulary, not tokens), then a rank over "
        "the VOCAB-sized count table and one conditional aggregate. "
        "The rank is a global window over the vocabulary — fine for a "
        "one-off analysis table even at 100 TB corpora (vocabularies "
        "are millions, not billions); the arithmetic-bucket two-phase "
        "rank (training_order_shard) is the drop-in if a vocabulary "
        "ever outgrows one task."
    ),
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = (
        t(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.col("text"), " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ranked = counts.withColumn(
        "rn",
        F.row_number().over(Window.orderBy(F.col("c").desc(), "term")),
    )
    agg = ranked.agg(
        F.sum("c").cast("bigint").alias("total"),
        *[
            F.sum(F.when(F.col("rn") <= k, F.col("c")).otherwise(0))
            .cast("bigint")
            .alias(f"cov_{k}")
            for k in _VOCAB_KS
        ],
    )
    stacked = agg.selectExpr(
        "total",
        "stack({}, {}) AS (k, covered_tokens)".format(
            len(_VOCAB_KS),
            ", ".join(
                f"CAST({k} AS BIGINT), cov_{k}" for k in _VOCAB_KS
            ),
        ),
    )
    return stacked.select(
        "k",
        "covered_tokens",
        F.col("total").alias("total_tokens"),
        (F.col("covered_tokens").cast("double") / F.col("total")).alias(
            "coverage"
        ),
    ).orderBy("k")
