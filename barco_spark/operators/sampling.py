"""Dataset-curation operators: splits, mixtures, profiling, quantiles.

The operations a training-data pipeline runs before/after dedup:
deterministic train/val/test assignment, source/language mixture
weighting, column profiling, and exact distribution quantiles — all
expressed as narrow maps + single hash aggregations (no collects, no
Python UDFs), so they scale linearly with input size.

Determinism contract with the DuckDB oracle: split assignment uses the
portable md5-based 28-bit hash (same convention as operators/text.py),
cross-row aggregates are integer sums, doubles appear only in final
single divisions or in identically-ordered interpolation expressions.

Reference parity note: the reference broker has no analytical surface
(SURVEY.md §2.7); these operators are part of the BASELINE.json north
star (LLM-data-pipeline coverage).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from barco_spark.registry import register
from barco_spark.tables import t


def _h28(col: Column) -> Column:
    """Portable 28-bit hash: first 7 hex chars of md5, as bigint."""
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("bigint")


def _h28_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 7))::BIGINT)"


@register(
    "train_split_assign",
    f"""
    WITH s AS (
      SELECT doc_id, source,
             {_h28_sql("CAST(doc_id AS VARCHAR)")} % 100 AS bucket,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents)
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           COUNT(DISTINCT source) AS n_sources
    FROM s GROUP BY 1
    """,
    "sampling",
    doc=(
        "Deterministic 80/10/10 train/val/test split: md5-hash bucket of "
        "doc_id (stable across runs and engines, unlike rand()), then one "
        "hash aggregation. At 100 TB the assignment is a pure per-row map."
    ),
)
def train_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "source",
        (_h28(F.col("doc_id").cast("string")) % 100).alias("bucket"),
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
    )
    split = (
        F.when(F.col("bucket") < 80, F.lit("train"))
        .when(F.col("bucket") < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        d.select(split.alias("split"), "n_tokens", "source")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.count_distinct("source").alias("n_sources"),
        )
    )


@register(
    "data_mixture_weights",
    """
    WITH g AS (
      SELECT source, lang, COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
      FROM documents GROUP BY source, lang)
    SELECT source, lang, n_docs, total_tokens,
           CAST(total_tokens AS DOUBLE) / SUM(total_tokens) OVER () AS token_share,
           CAST(total_tokens AS DOUBLE)
             / SUM(total_tokens) OVER (PARTITION BY source) AS share_within_source
    FROM g
    """,
    "sampling",
    doc=(
        "Data-mixture weighting: per (source, lang) token counts and their "
        "share of the global / per-source token budget. Integer window sums "
        "(exact in any order) + single divisions. The grouped table is tiny "
        "(|sources|x|langs|), so the windows cost nothing after the agg."
    ),
)
def data_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = (
        t(spark, sf_dir, "documents")
        .select(
            "source", "lang", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
        )
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )
    w_all = Window.partitionBy()
    w_src = Window.partitionBy("source")
    return g.select(
        "source",
        "lang",
        "n_docs",
        "total_tokens",
        (
            F.col("total_tokens").cast("double") / F.sum("total_tokens").over(w_all)
        ).alias("token_share"),
        (
            F.col("total_tokens").cast("double") / F.sum("total_tokens").over(w_src)
        ).alias("share_within_source"),
    )


@register(
    "data_profile_documents",
    """
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT lang) AS n_langs,
           COUNT(DISTINCT doc_id) AS n_distinct_ids,
           CAST(SUM(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
    FROM documents GROUP BY source
    """,
    "sampling",
    doc=(
        "Column profiling per source: cardinalities, empties, length "
        "stats. count_distinct expands via Expand+two-phase agg (exact); "
        "avg is exact-int-sum / count."
    ),
)
def data_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("lang").alias("n_langs"),
        F.count_distinct("doc_id").alias("n_distinct_ids"),
        F.sum(
            F.when(F.col("text").isNull() | (F.col("text") == ""), 1).otherwise(0)
        ).alias("n_empty"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
    )


_QUANTILES = [("p25", 0.25), ("p50", 0.5), ("p75", 0.75)]


def _quantile_oracle() -> str:
    picks = []
    exprs = []
    for tag, q in _QUANTILES:
        picks.append(
            f"floor((n - 1) * {q}) AS lo_{tag}, ceil((n - 1) * {q}) AS hi_{tag},"
            f" (n - 1) * {q} - floor((n - 1) * {q}) AS fr_{tag}"
        )
        exprs.append(
            f"MAX(CASE WHEN rn - 1 = lo_{tag} THEN value END)"
            f" + (MAX(CASE WHEN rn - 1 = hi_{tag} THEN value END)"
            f" - MAX(CASE WHEN rn - 1 = lo_{tag} THEN value END))"
            f" * MAX(fr_{tag}) AS {tag}"
        )
    return f"""
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events),
    marked AS (
      SELECT event_type, value, rn, n, {", ".join(picks)}
      FROM ranked)
    SELECT event_type, MAX(n) AS n, {", ".join(exprs)}
    FROM marked GROUP BY event_type
    """


@register(
    "quantile_stats",
    _quantile_oracle(),
    "sampling",
    doc=(
        "Exact linear-interpolated quantiles of events.value per type, "
        "without collecting: rank window + conditional aggregation picks "
        "the two straddling order statistics, interpolation is the same "
        "IEEE expression on both engines. One shuffle (the rank window); "
        "at 100 TB swap in approx_percentile for the t-digest scale path."
    ),
)
def quantile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("event_type", "value")
    w_rank = Window.partitionBy("event_type").orderBy("value")
    w_all = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    marked_cols = [F.col("event_type"), F.col("value"), F.col("rn"), F.col("n")]
    for tag, q in _QUANTILES:
        pos = (F.col("n") - 1) * F.lit(q)
        marked_cols += [
            F.floor(pos).alias(f"lo_{tag}"),
            F.ceil(pos).alias(f"hi_{tag}"),
            (pos - F.floor(pos)).alias(f"fr_{tag}"),
        ]
    marked = ranked.select(*marked_cols)
    aggs = [F.max("n").alias("n")]
    for tag, _q in _QUANTILES:
        v_lo = F.max(F.when(F.col("rn") - 1 == F.col(f"lo_{tag}"), F.col("value")))
        v_hi = F.max(F.when(F.col("rn") - 1 == F.col(f"hi_{tag}"), F.col("value")))
        aggs.append((v_lo + (v_hi - v_lo) * F.max(f"fr_{tag}")).alias(tag))
    return marked.groupBy("event_type").agg(*aggs)


@register(
    "embedding_norms",
    """
    SELECT vec_id, label,
           len(embedding) AS dim,
           sqrt(list_reduce(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                (acc, x) -> acc + x)) AS l2_norm
    FROM embeddings
    """,
    "sampling",
    doc=(
        "Per-row embedding L2 norms (pre-normalization audit): left-to-"
        "right IEEE fold on both engines, no cross-row float aggregation. "
        "Pure map — embarrassingly parallel at any scale."
    ),
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    sq_sum = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return t(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.sqrt(sq_sum).alias("l2_norm"),
    )


_MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@register(
    "lineitem_unpivot_stats",
    f"""
    WITH long AS (
      {" UNION ALL ".join(
          f"SELECT '{m}' AS measure, {m} AS value FROM lineitem "
          "WHERE l_shipdate >= TIMESTAMP '1997-01-01'" for m in _MEASURES)}
    )
    SELECT measure,
           COUNT(*) AS n,
           MIN(value) AS min_val,
           MAX(value) AS max_val,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_val
    FROM long GROUP BY measure
    """,
    "relational",
    doc=(
        "Unpivot/melt: wide measure columns -> long (measure, value) "
        "rows via df.unpivot (Expand node: one scan, no join/union of "
        "4 scans on the Spark side), then one hash aggregation. The "
        "oracle spells the same relation as UNION ALL. Decimal sums "
        "keep cross-engine determinism. The 4x Expand + decimal "
        "partial-agg is spread across the session when the scan is "
        "narrower than ceil(rows/20k) (r12: the 10.8 MB sf0.1 file is "
        "row-group-bound at 3 splits, so the whole expand ran on 3 of "
        "32 cores; the guard makes this a no-op at tiny SFs and at "
        "warehouse scan widths)."
    ),
)
def lineitem_unpivot_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from barco_spark.tables import spread

    li = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") >= "1997-01-01")
        .select(*_MEASURES)
    )
    # compact pre-expand rows cross the exchange once; the 4x Expand
    # and the decimal sums run at session width above it (guide §2.5
    # narrow-scan spread; A/B r12 session 6: 1.016 vs 1.286 and 1.056
    # vs 1.416 min on two sittings, wash on a contended third).
    # rows_per_task=20k reproduces the winning width (~32 at sf0.1's
    # 600k rows) and keeps the spread a NO-OP at the driver's
    # correctness SFs and at warehouse scan widths.
    li = spread(li, spark, sf_dir, "lineitem", rows_per_task=20_000)
    long = li.unpivot([], _MEASURES, "measure", "value")
    return long.groupBy("measure").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("min_val"),
        F.max("value").alias("max_val"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_val"),
    )


# Per-source document cap for stratified downsampling. At sf0.01 the
# synthetic corpus has ~25 docs/source, so a cap of 15 exercises both
# branches (some sources sampled down, none fully dropped).
_STRAT_CAP = 15
_STRAT_M = 1_000_000  # hash-uniform resolution


@register(
    "stratified_sample_hash",
    f"""
    WITH c AS (SELECT source, COUNT(*) AS n_src FROM documents GROUP BY source),
    s AS (
      SELECT d.source, c.n_src,
             CASE WHEN ({_h28_sql("CAST(d.doc_id AS VARCHAR) || ':strat'")}
                        % {_STRAT_M}) * c.n_src
                       < {_STRAT_CAP} * {_STRAT_M}
                  THEN 1 ELSE 0 END AS keep
      FROM documents d JOIN c ON d.source = c.source)
    SELECT source, MAX(n_src) AS n_before, CAST(SUM(keep) AS BIGINT) AS n_kept
    FROM s GROUP BY source
    """,
    "sampling",
    doc=(
        "Stratified downsampling to a per-source cap: keep a document iff "
        "hash_uniform(doc_id) < cap/|source| — deterministic (md5-based, "
        "reproducible across engines/runs, unlike rand()) and all-integer "
        "(keep iff (h %% M) * n_src < cap * M, no FP rate). The per-source "
        "count table is tiny and broadcast; the sample itself is a pure "
        "per-row map, so at 100 TB this costs one small agg + one scan. "
        "Reference parity: the broker has no sampling surface (SURVEY.md "
        "§2.7); this is BASELINE.json north-star curation tooling."
    ),
)
def stratified_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id", "source")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    h = _h28(F.concat(F.col("doc_id").cast("string"), F.lit(":strat")))
    keep = F.when(
        (h % _STRAT_M) * F.col("n_src") < F.lit(_STRAT_CAP * _STRAT_M), 1
    ).otherwise(0)
    return (
        d.join(F.broadcast(counts), "source")
        .select("source", "n_src", keep.alias("keep"))
        .groupBy("source")
        .agg(F.max("n_src").alias("n_before"), F.sum("keep").alias("n_kept"))
    )


@register(
    "median_mode_stats",
    """
    WITH cnt AS (
      SELECT lang, source, COUNT(*) AS n
      FROM documents GROUP BY lang, source),
    ranked AS (
      SELECT lang, source, n,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, source) AS rk
      FROM cnt),
    med AS (
      SELECT lang, COUNT(*) AS n_docs, median(n_chars) AS median_chars
      FROM documents GROUP BY lang)
    SELECT med.lang, med.n_docs, med.median_chars,
           ranked.source AS modal_source, ranked.n AS modal_n
    FROM med JOIN ranked ON med.lang = ranked.lang AND ranked.rk = 1
    """,
    "sampling",
    doc=(
        "Central-tendency profile per language: exact median of n_chars "
        "(interpolated; both engines average the two middles of an even "
        "run — exact for int inputs) and the modal source with a "
        "deterministic (count DESC, source ASC) tie-break, since bare "
        "mode() is unspecified-order in both engines. The mode is a "
        "two-level agg on a tiny grouped table; the median is the only "
        "sort and it is per-group."
    ),
)
def median_mode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    med = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.median("n_chars").alias("median_chars"),
    )
    cnt = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("source"))
    modal = (
        cnt.select("lang", "source", "n", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") == 1)
        .select("lang", F.col("source").alias("modal_source"), F.col("n").alias("modal_n"))
    )
    return med.join(modal, "lang")


_HIST_W = 50.0  # bin width over events.value (observed range ~[0, 500])


@register(
    "value_histogram",
    f"""
    WITH b AS (
      SELECT CAST(floor(value / {_HIST_W}) AS BIGINT) AS bin FROM events),
    g AS (SELECT bin, COUNT(*) AS n FROM b GROUP BY bin)
    SELECT bin, CAST(bin * {_HIST_W} AS DOUBLE) AS lo,
           CAST((bin + 1) * {_HIST_W} AS DOUBLE) AS hi, n,
           CAST(n AS DOUBLE) / SUM(n) OVER () AS share
    FROM g
    """,
    "sampling",
    doc=(
        "Fixed-width histogram of events.value: one per-row bin map "
        "(floor of an IEEE divide — deterministic cross-engine), one "
        "hash aggregation, then a window share over the tiny bin table. "
        "The classic distribution-profiling primitive; at 100 TB it is "
        "a single scan + map-side-combined agg over <=#bins groups."
    ),
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        F.floor(F.col("value") / _HIST_W).cast("bigint").alias("bin")
    )
    g = ev.groupBy("bin").agg(F.count(F.lit(1)).alias("n"))
    return g.select(
        "bin",
        (F.col("bin") * _HIST_W).alias("lo"),
        ((F.col("bin") + 1) * _HIST_W).alias("hi"),
        "n",
        (F.col("n").cast("double") / F.sum("n").over(Window.partitionBy())).alias(
            "share"
        ),
    )


_TOPN_PER_SOURCE = 5


@register(
    "hash_topn_sample",
    f"""
    WITH h AS (
      SELECT source, doc_id,
             {_h28_sql("CAST(doc_id AS VARCHAR) || ':topn'")} AS hv
      FROM documents),
    r AS (
      SELECT source, doc_id, hv,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rk
      FROM h)
    SELECT source, doc_id, rk FROM r WHERE rk <= {_TOPN_PER_SOURCE}
    """,
    "sampling",
    doc=(
        "Exact-count per-stratum sample: the n smallest hash values per "
        "source (hash order = uniform order, doc_id tie-break). Unlike "
        "the rate-based stratified sample this guarantees EXACTLY n per "
        "stratum — the reservoir-sampling shape, but deterministic and "
        "re-runnable. One window shuffle on source; at 100 TB a "
        "pre-aggregated per-partition top-n (min-heap) feeds the window "
        "so only n*partitions rows reach the shuffle (Spark does this "
        "itself for rank<=n filters via WindowGroupLimit)."
    ),
)
def hash_topn_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        _h28(F.concat(F.col("doc_id").cast("string"), F.lit(":topn"))).alias("hv"),
    )
    w = Window.partitionBy("source").orderBy("hv", "doc_id")
    return (
        d.select("source", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= _TOPN_PER_SOURCE)
    )


# --------------------------------------------------------------------------
# Sequence packing: concatenate-and-split batch construction
# --------------------------------------------------------------------------
_PACK_CONTEXT = 2048  # tokens per training context window


@register(
    "pack_sequences",
    f"""
    WITH d AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
      FROM documents),
    c AS (
      SELECT doc_id, source, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cum_before
      FROM d)
    SELECT source,
           CAST(cum_before // {_PACK_CONTEXT} AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM c
    GROUP BY source, bin_id
    """,
    "sampling",
    doc=(
        "Sequence packing, concatenate-and-split style: documents are "
        "laid out in deterministic (doc_id) order within each source "
        f"shard and split into {_PACK_CONTEXT}-token context windows "
        "(bin = running-token-count div context). The Megatron-style "
        "batch-construction primitive. One window partitioned by source "
        "— prefix sums parallelize across shards, never globally — then "
        "one hash aggregation; all-integer arithmetic, no FP rate."
    ),
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = d.select(
        "source",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("cum_before"),
    )
    return (
        c.select(
            "source",
            F.expr(f"cum_before div {_PACK_CONTEXT}").alias("bin_id"),
            "n_tokens",
        )
        .groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
    )


# --------------------------------------------------------------------------
# Temperature-based language rebalancing (multilingual mixture sampling)
# --------------------------------------------------------------------------
_MIX_ALPHA_SQL = "sqrt"  # alpha = 0.5 => weight ~ tokens^0.5
_MIX_BUDGET_FRAC = 0.5  # sample half the corpus' tokens


@register(
    "mixture_temperature_sample",
    f"""
    WITH d AS (
      SELECT lang, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             {_h28_sql("CAST(doc_id AS VARCHAR)")} AS h
      FROM documents),
    tl AS (SELECT lang, SUM(n_tokens) AS t_l FROM d GROUP BY lang),
    b AS (
      SELECT lang, t_l,
             CAST(FLOOR({_MIX_BUDGET_FRAC} * SUM(t_l) OVER ()
                        * sqrt(t_l) / SUM(sqrt(t_l)) OVER ()) AS BIGINT)
               AS budget_tokens
      FROM tl),
    c AS (
      SELECT d.lang, d.n_tokens, b.budget_tokens,
             SUM(d.n_tokens) OVER (PARTITION BY d.lang
                                   ORDER BY d.h, d.doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
      FROM d JOIN b USING (lang))
    SELECT lang, budget_tokens,
           COUNT(*) FILTER (WHERE cum - n_tokens < budget_tokens)
             AS n_selected,
           CAST(COALESCE(SUM(n_tokens)
                  FILTER (WHERE cum - n_tokens < budget_tokens), 0) AS BIGINT)
             AS tokens_selected
    FROM c GROUP BY lang, budget_tokens
    """,
    "sampling",
    doc=(
        "Temperature-based multilingual rebalancing (the XLM-R / mT5 "
        "alpha-sampling recipe, alpha=0.5): each language's token budget "
        "is proportional to sqrt(its token count), damping head languages "
        "and boosting the tail; documents fill the budget in deterministic "
        "hash order (stable across runs and engines, unlike rand()). Plan: "
        "one narrow map + tiny per-lang agg for the budgets (broadcast "
        "back), then ONE window cumsum per language partition — the corpus "
        "is scanned twice, shuffled once (by lang for the cumsum; at 100 "
        "TB you would pre-bucket by lang or 2-level the cumsum per "
        "(lang, shard) to avoid the single-reducer-per-lang skew)."
    ),
)
def mixture_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "lang",
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
        _h28(F.col("doc_id").cast("string")).alias("h"),
    )
    tl = d.groupBy("lang").agg(F.sum("n_tokens").alias("t_l"))
    w_all = Window.partitionBy()
    b = tl.select(
        "lang",
        F.floor(
            F.lit(_MIX_BUDGET_FRAC)
            * F.sum("t_l").over(w_all)
            * F.sqrt(F.col("t_l"))
            / F.sum(F.sqrt(F.col("t_l"))).over(w_all)
        )
        .cast("bigint")
        .alias("budget_tokens"),
    )
    w_cum = (
        Window.partitionBy("lang")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = d.join(F.broadcast(b), "lang").withColumn(
        "cum", F.sum("n_tokens").over(w_cum)
    )
    sel = F.col("cum") - F.col("n_tokens") < F.col("budget_tokens")
    return c.groupBy("lang", "budget_tokens").agg(
        F.count(F.when(sel, 1)).alias("n_selected"),
        F.coalesce(F.sum(F.when(sel, F.col("n_tokens"))), F.lit(0))
        .cast("bigint")
        .alias("tokens_selected"),
    )


@register(
    "leakage_safe_split",
    f"""
    WITH s AS (
      SELECT doc_id, source,
             {_h28_sql("source")} % 100 AS bucket,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents)
    SELECT source,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM s GROUP BY 1, 2
    ORDER BY source
    """,
    "sampling",
    doc=(
        "Leakage-safe GROUPED split: the hash bucket is computed on "
        "the GROUP key (source), not the document, so every document "
        "of a source lands in the same split — near-duplicates and "
        "templated variants inside one provenance can never straddle "
        "train/test (the contamination mode a per-doc split like "
        "train_split_assign cannot prevent). Per-row map + one hash "
        "aggregation; each source appears in exactly ONE split, "
        "asserted in tests."
    ),
)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "source",
        (_h28(F.col("source")) % 100).alias("bucket"),
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
    )
    split = (
        F.when(F.col("bucket") < 80, F.lit("train"))
        .when(F.col("bucket") < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        d.select("source", split.alias("split"), "n_tokens")
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
        .orderBy("source")
    )


@register(
    "training_order_shard",
    f"""
    WITH h AS (
      SELECT doc_id, source,
             {_h28_sql("'shuffle-42:' || CAST(doc_id AS VARCHAR)")} AS hk
      FROM documents),
    ordered AS (
      SELECT doc_id, source, hk,
             ROW_NUMBER() OVER (ORDER BY hk, doc_id) AS pos
      FROM h)
    SELECT CAST((pos - 1) % 8 AS BIGINT) AS shard,
           COUNT(*) AS n_docs,
           CAST(MIN(pos) AS BIGINT) AS min_pos,
           CAST(MAX(pos) AS BIGINT) AS max_pos,
           CAST(SUM(pos * (doc_id % 1000003)) AS BIGINT) AS order_checksum
    FROM ordered
    GROUP BY CAST((pos - 1) % 8 AS BIGINT)
    ORDER BY shard
    """,
    "sampling",
    doc=(
        "Seeded deterministic global shuffle for training order: every "
        "document gets a position from the md5-hash order (seed in the "
        "hash preimage) and a round-robin shard, the step that writes "
        "shuffled training shards. The order-SENSITIVE integer checksum "
        "(sum of pos x doc_id-residue per shard) proves both engines "
        "computed the same permutation, not just the same counts. At "
        "scale the hash order is a range exchange (Spark's sort "
        "machinery, no skew: hashes are uniform) and the shard writer "
        "is partitionBy(shard) on the SAME pass; re-running with a new "
        "seed is a new epoch permutation with zero state."
    ),
)
def training_order_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    hashed = docs.select(
        "doc_id",
        "source",
        _h28(F.concat(F.lit("shuffle-42:"), F.col("doc_id").cast("string"))).alias(
            "hk"
        ),
    )
    # Global positions WITHOUT a single-partition window (a bare
    # Window.orderBy moves the whole corpus to one task): hk is a
    # uniform 28-bit hash, so fixed-width value ranges of hk are
    # balanced buckets — bucket = hk * nparts / 2^28 by integer
    # arithmetic, fully deterministic (repartitionByRange would
    # re-SAMPLE boundaries on every execution, desyncing any
    # precomputed count matrix).  Per-bucket row_number gives local
    # order; each bucket's global base is a running sum over the tiny
    # (nparts-row) count table, broadcast-joined back.  Two shuffles
    # total (tiny count agg + the bucket window), no persist, no
    # collect — the same two-phase shape as EventLog's offset
    # assignment but with arithmetic ranges instead of sampled ones.
    nparts = max(int(spark.conf.get("spark.sql.shuffle.partitions")), 1)
    bucketed = hashed.withColumn(
        "_b", ((F.col("hk") * nparts) / F.lit(1 << 28)).cast("bigint")
    )
    counts = bucketed.groupBy("_b").agg(F.count(F.lit(1)).alias("_c"))
    w_base = (
        Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    )  # single-partition window over <= nparts rows — bounded by design
    bases = counts.select(
        "_b", F.coalesce(F.sum("_c").over(w_base), F.lit(0)).alias("_base")
    )
    w_local = Window.partitionBy("_b").orderBy("hk", "doc_id")
    ordered = bucketed.join(F.broadcast(bases), "_b").withColumn(
        "pos", F.col("_base") + F.row_number().over(w_local)
    )
    return (
        ordered.groupBy(((F.col("pos") - 1) % 8).cast("bigint").alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("pos").cast("bigint").alias("min_pos"),
            F.max("pos").cast("bigint").alias("max_pos"),
            F.sum(F.col("pos") * (F.col("doc_id") % 1000003))
            .cast("bigint")
            .alias("order_checksum"),
        )
        .orderBy("shard")
    )


@register(
    "packing_efficiency_report",
    """
    WITH toks AS (
      SELECT source,
             LEAST(CAST(len(string_split(text, ' ')) AS BIGINT), 256) AS tk
      FROM documents),
    per_source AS (
      SELECT source,
             COUNT(*) AS n_docs,
             CAST(SUM(tk) AS BIGINT) AS sum_tokens,
             CAST(SUM(256 - tk) AS BIGINT) AS pad_waste_naive
      FROM toks GROUP BY source)
    SELECT source, n_docs, sum_tokens, pad_waste_naive,
           CAST((sum_tokens + 255) // 256 AS BIGINT) AS packed_bins,
           CAST(((sum_tokens + 255) // 256) * 256 - sum_tokens AS BIGINT)
             AS pad_waste_packed,
           CAST(pad_waste_naive AS DOUBLE) / (n_docs * 256)
             AS naive_waste_share,
           CAST(((sum_tokens + 255) // 256) * 256 - sum_tokens AS DOUBLE)
             / (((sum_tokens + 255) // 256) * 256) AS packed_waste_share
    FROM per_source
    ORDER BY source
    """,
    "sampling",
    doc=(
        "Batch-construction economics: per source, the padding waste of "
        "naive one-doc-per-row batching at a 256-token context vs "
        "concatenate-and-split packing (pack_sequences). All-integer "
        "token accounting (whitespace tokens clipped at the context) "
        "with two final exact divisions, so the waste shares are "
        "cross-engine exact. The report is one narrow map + one "
        "hash aggregation — at 100 TB it is the cheap pre-flight that "
        "justifies running the packing transform at all (typical "
        "corpora waste 30-60% of naive batch slots)."
    ),
)
def packing_efficiency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    tk = F.least(F.size(F.split(F.col("text"), " ")).cast("bigint"), F.lit(256))
    per = (
        docs.select("source", tk.alias("tk"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tk").cast("bigint").alias("sum_tokens"),
            F.sum(F.lit(256) - F.col("tk")).cast("bigint").alias("pad_waste_naive"),
        )
    )
    bins = F.expr("(sum_tokens + 255) div 256")
    return per.select(
        "source",
        "n_docs",
        "sum_tokens",
        "pad_waste_naive",
        bins.cast("bigint").alias("packed_bins"),
        (bins * 256 - F.col("sum_tokens")).cast("bigint").alias("pad_waste_packed"),
        (
            F.col("pad_waste_naive").cast("double")
            / (F.col("n_docs") * 256)
        ).alias("naive_waste_share"),
        (
            (bins * 256 - F.col("sum_tokens")).cast("double") / (bins * 256)
        ).alias("packed_waste_share"),
    ).orderBy("source")


@register(
    "temporal_holdout_split",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS c FROM events GROUP BY 1),
    cum AS (
      SELECT d,
             SUM(c) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum,
             SUM(c) OVER () AS total
      FROM daily),
    cutoff AS (SELECT MIN(d) AS cd FROM cum WHERE cum * 5 >= total * 4),
    f AS (
      SELECT e.event_type, e.user_id,
             MAX(CASE WHEN CAST(e.ts AS DATE) < c.cd THEN 1 ELSE 0 END)
               AS has_train,
             MAX(CASE WHEN CAST(e.ts AS DATE) > c.cd THEN 1 ELSE 0 END)
               AS has_test,
             SUM(CASE WHEN CAST(e.ts AS DATE) < c.cd THEN 1 ELSE 0 END)
               AS train_events,
             SUM(CASE WHEN CAST(e.ts AS DATE) > c.cd THEN 1 ELSE 0 END)
               AS test_events,
             SUM(CASE WHEN CAST(e.ts AS DATE) = c.cd THEN 1 ELSE 0 END)
               AS embargo_events
      FROM events e CROSS JOIN cutoff c
      GROUP BY e.event_type, e.user_id)
    SELECT event_type,
           CAST(SUM(train_events) AS BIGINT) AS train_events,
           CAST(SUM(test_events) AS BIGINT) AS test_events,
           CAST(SUM(embargo_events) AS BIGINT) AS embargo_events,
           CAST(SUM(has_train) AS BIGINT) AS train_users,
           CAST(SUM(has_test) AS BIGINT) AS test_users,
           CAST(SUM(CASE WHEN has_train + has_test = 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS straddle_users
    FROM f GROUP BY event_type ORDER BY event_type
    """,
    "sampling",
    doc=(
        "Temporal holdout split with an embargo day: the cutoff is the "
        "first CALENDAR DAY where the cumulative event count reaches "
        "80% (training cutoffs are calendar-aligned in practice, and a "
        "day-histogram cutoff needs only a tiny per-day aggregate — "
        "never a global sort or exact-percentile pass over the raw "
        "stream). Events strictly before the cutoff day train, strictly "
        "after test, ON the day are embargoed (dropped from both — the "
        "leakage buffer). Reports per event type: split sizes plus the "
        "entity-leakage signal — users appearing on BOTH sides of the "
        "cut (straddle_users), the count that tells you whether "
        "user-level history features would leak future information. "
        "Plan: day histogram (bounded by calendar days) -> one-row "
        "cutoff broadcast -> per-(type,user) flag aggregate -> per-type "
        "rollup; both aggregates map-side combine, nothing wider than "
        "counters shuffles."
    ),
)
def temporal_holdout_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "event_type", "user_id", F.to_date("ts").alias("d")
    )
    daily = ev.groupBy("d").agg(F.count(F.lit(1)).alias("c"))
    w_cum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    w_tot = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # single-partition windows over <= #calendar-days rows — bounded
    cum = daily.select(
        "d",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_tot).alias("total"),
    )
    cutoff = cum.where(F.col("cum") * 5 >= F.col("total") * 4).agg(
        F.min("d").alias("cd")
    )
    e = ev.crossJoin(F.broadcast(cutoff))
    tr = (F.col("d") < F.col("cd")).cast("long")
    te = (F.col("d") > F.col("cd")).cast("long")
    em = (F.col("d") == F.col("cd")).cast("long")
    f = e.groupBy("event_type", "user_id").agg(
        F.max(tr).alias("has_train"),
        F.max(te).alias("has_test"),
        F.sum(tr).alias("train_events"),
        F.sum(te).alias("test_events"),
        F.sum(em).alias("embargo_events"),
    )
    return (
        f.groupBy("event_type")
        .agg(
            F.sum("train_events").cast("bigint").alias("train_events"),
            F.sum("test_events").cast("bigint").alias("test_events"),
            F.sum("embargo_events").cast("bigint").alias("embargo_events"),
            F.sum("has_train").cast("bigint").alias("train_users"),
            F.sum("has_test").cast("bigint").alias("test_users"),
            F.sum(
                (F.col("has_train") + F.col("has_test") == 2).cast("long")
            )
            .cast("bigint")
            .alias("straddle_users"),
        )
        .orderBy("event_type")
    )
