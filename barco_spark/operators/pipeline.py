"""End-to-end training-data curation pipeline.

The north-star use case (BASELINE.json): ingest documents -> quality
filter -> near-duplicate removal -> curated corpus + stats. Composed
entirely from the already-oracle-verified building blocks
(operators/text.py metrics, operators/dedup.py MinHash LSH), so the
whole pipeline is itself oracle-checkable end-to-end.

Dedup strategy is keep-first among quality-passing documents: a
verified near-dup pair (doc_a < doc_b, jaccard >= 0.4) drops doc_b
ONLY when its keeper doc_a passed the quality filter — otherwise doc_b
is the surviving representative of that content (dropping both would
silently lose it). No connected-components pass: transitive chains are
covered because a doc_a that was itself dropped as a duplicate has a
surviving keeper upstream. At 100 TB: metrics are narrow map work, the
LSH band join is the only wide stage, and the final anti join
broadcasts the (small) drop list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from barco_spark.operators.dedup import dedup_minhash_lsh
from barco_spark.operators.text import h28_sql, text_metrics
from barco_spark.registry import QUERIES, register

QUALITY_THRESHOLD = 0.6


# compose the oracle from the registered fragments so both engines run
# literally the same logic (nested CTEs are legal in DuckDB)
def _base_sql() -> str:
    return f"""
    metrics AS ({QUERIES["text_metrics"].oracle}),
    pairs AS ({QUERIES["dedup_minhash_lsh"].oracle}),
    drops AS (
      -- doc_b is dropped only when its keeper doc_a survives quality
      SELECT DISTINCT p.doc_b AS doc_id
      FROM pairs p JOIN metrics m ON p.doc_a = m.doc_id
      WHERE m.quality_score >= {QUALITY_THRESHOLD})
    """


def _curated_sql() -> str:
    return f"""
    WITH {_base_sql()}
    SELECT doc_id, lang, n_tokens, quality_score
    FROM metrics
    WHERE quality_score >= {QUALITY_THRESHOLD}
      AND doc_id NOT IN (SELECT doc_id FROM drops)
    """


def _stats_sql() -> str:
    return f"""
    WITH {_base_sql()},
    flagged AS (
      SELECT m.*,
             (quality_score < {QUALITY_THRESHOLD}) AS low_quality,
             doc_id IN (SELECT doc_id FROM drops) AS near_dup
      FROM metrics m)
    SELECT lang,
           COUNT(*) AS n_input,
           CAST(SUM(CASE WHEN low_quality THEN 1 ELSE 0 END) AS BIGINT) AS dropped_quality,
           CAST(SUM(CASE WHEN NOT low_quality AND near_dup THEN 1 ELSE 0 END) AS BIGINT) AS dropped_dup,
           CAST(SUM(CASE WHEN NOT low_quality AND NOT near_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN NOT low_quality AND NOT near_dup THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept
    FROM flagged
    GROUP BY lang
    """


def _metrics_and_drops(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    metrics = text_metrics(spark, sf_dir)
    passing = metrics.filter(F.col("quality_score") >= QUALITY_THRESHOLD).select(
        F.col("doc_id").alias("doc_a")
    )
    drops = (
        dedup_minhash_lsh(spark, sf_dir)
        .join(passing, "doc_a")  # keeper must survive quality
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return metrics, drops


def curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curated corpus: quality-filtered, near-dup-free document set."""
    metrics, drops = _metrics_and_drops(spark, sf_dir)
    return (
        metrics.filter(F.col("quality_score") >= QUALITY_THRESHOLD)
        .join(F.broadcast(drops), "doc_id", "left_anti")
        .select("doc_id", "lang", "n_tokens", "quality_score")
    )


def curate_with_stats(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Corpus + funnel stats computed from ONE pass of the expensive
    stages (the MinHash drop list is materialized once and reused;
    calling the two registry queries separately recomputes it)."""
    metrics, drops = _metrics_and_drops(spark, sf_dir)
    drops = drops.localCheckpoint(eager=False)
    corpus = (
        metrics.filter(F.col("quality_score") >= QUALITY_THRESHOLD)
        .join(F.broadcast(drops), "doc_id", "left_anti")
        .select("doc_id", "lang", "n_tokens", "quality_score")
    )
    stats = _stats_from(metrics, drops)
    return corpus, stats


def _stats_from(metrics: DataFrame, drops: DataFrame) -> DataFrame:
    flagged = (
        metrics.join(
            F.broadcast(drops.withColumn("near_dup", F.lit(True))), "doc_id", "left"
        )
        .withColumn("near_dup", F.coalesce(F.col("near_dup"), F.lit(False)))
        .withColumn("low_quality", F.col("quality_score") < QUALITY_THRESHOLD)
    )
    keep = ~F.col("low_quality") & ~F.col("near_dup")
    return flagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_input"),
        F.sum(F.when(F.col("low_quality"), 1).otherwise(0)).alias("dropped_quality"),
        F.sum(F.when(~F.col("low_quality") & F.col("near_dup"), 1).otherwise(0)).alias(
            "dropped_dup"
        ),
        F.sum(F.when(keep, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(keep, F.col("n_tokens")).otherwise(0)).alias("tokens_kept"),
    )


@register(
    "curation_pipeline",
    _curated_sql(),
    "pipeline",
    doc="End-to-end curation: quality filter + MinHash near-dup removal "
    "(keep-first among quality-passing docs), composed from "
    "oracle-verified fragments.",
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curate(spark, sf_dir)


@register(
    "curation_stats",
    _stats_sql(),
    "pipeline",
    doc="Per-language curation funnel: input / dropped-by-quality / "
    "dropped-as-dup / kept / tokens kept.",
)
def curation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    metrics, drops = _metrics_and_drops(spark, sf_dir)
    return _stats_from(metrics, drops)


# --------------------------------------------------------------------------
# Decontamination: train/eval n-gram overlap
# --------------------------------------------------------------------------
_DECON_N = 4  # contamination n-gram length (production uses 8-13)
_DECON_EVAL_MOD = 97  # doc_id % 97 == 0 stands in for the benchmark set


def _decon_shingles_sql() -> str:
    words = " || ' ' || ".join(f"words[i+{j}]" for j in range(_DECON_N))
    return f"""list_distinct(CASE WHEN len(words) >= {_DECON_N}
        THEN list_transform(range(1, len(words) - {_DECON_N - 2}), i -> {words})
        ELSE [array_to_string(words, ' ')] END)"""


def _decon_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, source, shingle) — each document's distinct word
    ``_DECON_N``-shingles, exploded. Shared by the exact (hash
    semi-join) and Bloom decontamination variants."""
    from barco_spark.operators.text import kgrams

    w = docs.select("doc_id", "source", F.split("text", " ").alias("words"))
    shingles = F.array_distinct(kgrams(F.col("words"), _DECON_N))
    return w.select("doc_id", "source", F.explode(shingles).alias("shingle"))


@register(
    "decontaminate_ngram_overlap",
    f"""
    WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS words
               FROM documents),
    hs AS (SELECT doc_id, source,
                  unnest(list_distinct(list_transform({_decon_shingles_sql()},
                                                      s -> {h28_sql('s')}))) AS h
           FROM w),
    eval_h AS (SELECT DISTINCT h FROM hs WHERE doc_id % {_DECON_EVAL_MOD} = 0),
    contaminated AS (
      SELECT DISTINCT t.doc_id FROM hs t JOIN eval_h e ON t.h = e.h
      WHERE t.doc_id % {_DECON_EVAL_MOD} <> 0)
    SELECT source,
           COUNT(*) AS n_train,
           CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_contaminated
    FROM documents d LEFT JOIN contaminated c USING (doc_id)
    WHERE d.doc_id % {_DECON_EVAL_MOD} <> 0
    GROUP BY source
    """,
    "pipeline",
    doc=(
        "Benchmark decontamination: flag training documents sharing any "
        f"{_DECON_N}-word shingle with the eval set (doc_id % "
        f"{_DECON_EVAL_MOD} == 0 stands in for the benchmark corpus; in "
        "production it is a separate table argument). The eval side's "
        "distinct shingle hashes are tiny relative to the corpus "
        "(benchmarks are KBs against 100 TB), so the overlap test is a "
        "broadcast semi-join against an exploded hash column — one "
        "narrow explode + one broadcast join, no shuffle of the corpus "
        "and no pairwise comparison. The standard contamination check "
        "(GPT-3/PaLM appendix style) expressed declaratively."
    ),
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from barco_spark.operators.text import h28
    from barco_spark.tables import spread_rows, t

    docs = t(spark, sf_dir, "documents")
    # row-sized spread below the shingle explode + md5 (r12, guide
    # §2.5): A/B 0.52 s vs 1.15 s plain — see tables.spread_rows
    hs = _decon_shingles(spread_rows(docs, spark, sf_dir, "doc_id")).select(
        "doc_id", "source", h28(F.col("shingle")).alias("h")
    )
    is_eval = F.col("doc_id") % _DECON_EVAL_MOD == 0
    eval_h = hs.filter(is_eval).select("h").distinct()
    contaminated = (
        hs.filter(~is_eval)
        .join(F.broadcast(eval_h), "h")
        .select("doc_id")
        .distinct()
        .withColumn("_c", F.lit(1))
    )
    train = docs.filter(F.col("doc_id") % _DECON_EVAL_MOD != 0)
    return (
        train.join(contaminated, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.sum(F.coalesce(F.col("_c"), F.lit(0))).cast("bigint").alias(
                "n_contaminated"
            ),
        )
    )


# --------------------------------------------------------------------------
# Bloom-filter decontamination (the large-eval-set scale path)
# --------------------------------------------------------------------------
_BLOOM_K = 5  # probes per shingle
_BLOOM_MIN_BITS = 1 << 20  # floor: 128 KiB bitmap
_BLOOM_MAX_BITS = 1 << 27  # cap: 16 MiB bitmap (broadcast-friendly)
_BLOOM_BITS_PER_ITEM = 20  # ~0.04% FP at k=5


def _bloom_size(n_items: int) -> int:
    """Power-of-2 bit count sized to ~20 bits/item, clamped to
    [128 KiB, 16 MiB]. A Bloom filter sized to its item count keeps
    the FP rate flat as the eval suite grows; a fixed-size one
    saturates (measured: a 1M-bit filter over ~900k eval shingles
    flags essentially every document)."""
    m = _BLOOM_MIN_BITS
    while m < n_items * _BLOOM_BITS_PER_ITEM and m < _BLOOM_MAX_BITS:
        m <<= 1
    return m


def _bloom_h1(col) -> F.Column:
    """First 48 bits of md5 as a bigint — the h28 portability pattern
    widened to 12 hex chars.  md5 slices (not xxhash64/murmur3, the
    r9 shape) so the ENTIRE filter — sizing, bitmap, all-k probe — is
    re-derivable in ANSI SQL and the operator gets a real DuckDB
    oracle (VERDICT r9 item 6): Spark's xxhash64 has no SQL
    re-derivation for arbitrary-length strings (the murmur-in-SQL
    precedent in functions/tokens.py:321 only covers <=15-byte keys).
    One md5 per shingle feeds both hashes; it stays JVM-codegen."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("bigint")


def _bloom_h2(col) -> F.Column:
    """Next 48 bits of the same md5 (chars 13-24) as the second hash."""
    return F.conv(F.substring(F.md5(col), 13, 12), 16, 10).cast("bigint")


def bloom_bitmap(shingles: DataFrame, col: str = "shingle") -> tuple[list[int], int]:
    """Build a Bloom filter of the given shingle strings DISTRIBUTEDLY:
    k probe positions per shingle via double hashing (two md5 slices,
    JVM built-in, SQL-portable), bit_or-aggregated into 64-bit words,
    and only the fixed-size word table (m/64 longs) is collected. The
    eval set itself is never collected — this is the decontamination
    path for when the benchmark suite is too big to broadcast as an
    exact hash set (the GPT-3 appendix-C setup at hundreds of eval
    sets x millions of shingles). Returns (word table, m bits)."""
    n = shingles.count()  # eval side only: tiny vs the corpus
    m = _bloom_size(n)
    h1 = F.pmod(_bloom_h1(col), m)
    # force h2 odd so every probe stride is coprime with the power-of-2 m
    h2 = F.pmod(_bloom_h2(col), m) * 2 + 1
    pos = (
        shingles.select(h1.alias("h1"), h2.alias("h2"))
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(_BLOOM_K - 1))).alias("i"),
            "h1",
            "h2",
        )
        .select(F.pmod(F.col("h1") + F.col("i") * F.col("h2"), m).alias("pos"))
    )
    words = (
        pos.select(
            F.expr("pos div 64").cast("int").alias("w"),
            F.expr("cast(pos % 64 as int)").alias("bit"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(shiftleft(cast(1 as bigint), bit))").alias("bits"))
        .collect()
    )
    table = [0] * (m // 64)
    for r in words:
        table[r.w] = r.bits
    return table, m


def bloom_probe(
    spark: SparkSession, table: list[int], m: int, shingle_col: F.Column
) -> F.Column:
    """Membership predicate over a broadcast numpy bitmap: the two base
    hashes are computed JVM-side (codegen), only the k bit-gathers run
    in an Arrow-vectorized pandas UDF. (A pure-expression probe with
    the bitmap as a plan literal was measured ~10s slower per query:
    janino has to compile the m/64-element array into the generated
    code. The broadcast + numpy gather costs microseconds per batch
    and keeps the plan literal-free.)"""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    bc = spark.sparkContext.broadcast(
        np.array([w & 0xFFFFFFFFFFFFFFFF for w in table], dtype=np.uint64)
    )
    k, mm = _BLOOM_K, m

    @pandas_udf("boolean")
    def _hit(h1, h2):
        import pandas as pd

        t = bc.value
        h1v = h1.to_numpy(np.int64).astype(np.uint64)
        h2v = h2.to_numpy(np.int64).astype(np.uint64)
        ok = np.ones(len(h1v), dtype=bool)
        for i in range(k):
            pos = (h1v + np.uint64(i) * h2v) % np.uint64(mm)
            w = (pos >> np.uint64(6)).astype(np.int64)
            b = pos & np.uint64(63)
            ok &= ((t[w] >> b) & np.uint64(1)) != 0
        return pd.Series(ok)

    h1 = F.pmod(_bloom_h1(shingle_col), m)
    h2 = F.pmod(_bloom_h2(shingle_col), m) * 2 + 1
    return _hit(h1, h2)


def _bloom_oracle_sql() -> str:
    """DuckDB re-derivation of the WHOLE Bloom pipeline (VERDICT r9
    item 6): same md5-slice double hashing, same power-of-2 sizing rule
    as _bloom_size (smallest 2^j >= 20n, clamped to [2^20, 2^27]), same
    set-of-positions bitmap semantics, same all-k probe.  The filter is
    a deterministic function of the eval shingles, so even its false
    positives reproduce bit-exactly and the driver hash check is
    meaningful — not a statistical bound but value equality."""
    h1 = "(('0x' || substr(md5(shingle), 1, 12))::BIGINT)"
    h2 = "(('0x' || substr(md5(shingle), 13, 12))::BIGINT)"
    k = _BLOOM_K
    return f"""
    WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS words
               FROM documents),
    sh AS (SELECT doc_id, source,
                  unnest({_decon_shingles_sql()}) AS shingle
           FROM w),
    eval_sh AS (SELECT DISTINCT shingle FROM sh
                WHERE doc_id % {_DECON_EVAL_MOD} = 0),
    msize AS (
      SELECT CAST(GREATEST({_BLOOM_MIN_BITS}, LEAST({_BLOOM_MAX_BITS},
               POWER(2, CEIL(LOG2(GREATEST(COUNT(*), 1)
                                  * {_BLOOM_BITS_PER_ITEM}.0)))))
             AS BIGINT) AS m
      FROM eval_sh),
    bits AS (
      SELECT DISTINCT (({h1} % m) + i * (({h2} % m) * 2 + 1)) % m AS pos
      FROM eval_sh, msize, unnest(range(0, {k})) AS u(i)),
    tsh AS (SELECT DISTINCT doc_id, shingle FROM sh
            WHERE doc_id % {_DECON_EVAL_MOD} <> 0),
    tpos AS (
      SELECT doc_id, shingle,
             (({h1} % m) + i * (({h2} % m) * 2 + 1)) % m AS pos
      FROM tsh, msize, unnest(range(0, {k})) AS u(i)),
    flagged AS (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_id, shingle FROM tpos
        WHERE pos IN (SELECT pos FROM bits)
        GROUP BY doc_id, shingle HAVING COUNT(*) = {k}))
    SELECT source,
           COUNT(*) AS n_train,
           CAST(SUM(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged
    FROM documents d LEFT JOIN flagged f USING (doc_id)
    WHERE d.doc_id % {_DECON_EVAL_MOD} <> 0
    GROUP BY source
    """


@register(
    "decontaminate_bloom",
    _bloom_oracle_sql(),
    "pipeline",
    doc=(
        "Bloom-filter benchmark decontamination — the scale path of "
        "decontaminate_ngram_overlap for when the eval suite is too "
        "large to broadcast as an exact distinct-hash set. The filter "
        f"(k={_BLOOM_K}, double hashing over two md5 slices, sized to "
        f"~{_BLOOM_BITS_PER_ITEM} bits per eval shingle) is BUILT "
        "distributedly with a bit_or aggregation and only the bitmap "
        "word table (128 KiB - 16 MiB) reaches the driver, then ships "
        "to executors as a broadcast; the corpus probe computes both "
        "base hashes JVM-side and does the k bit-gathers in one "
        "Arrow-vectorized numpy kernel — no join, no shuffle of the "
        "corpus. One-sided error: contaminated docs are always "
        "flagged; clean docs are flagged at the filter's FP rate "
        "(~0.04% at the sized fill level)."
    ),
)
def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    from barco_spark.tables import spread_rows, t

    docs = t(spark, sf_dir, "documents")
    # row-sized spread below the shingle explode + double-md5 probe
    # (r12, guide §2.5): A/B 1.20 s vs 1.40 s plain.  Unlike the
    # REJECTED probe-stage split above the Arrow kernel (see
    # OPTIMIZATION_r12.md), this exchange sits BELOW the explode so
    # the md5 + numpy kernel stay fused in the spread stage.
    sh = _decon_shingles(spread_rows(docs, spark, sf_dir, "doc_id"))
    is_eval = F.col("doc_id") % _DECON_EVAL_MOD == 0
    table, m = bloom_bitmap(sh.filter(is_eval).select("shingle").distinct())
    probed = (
        sh.filter(~is_eval)
        .withColumn("hit", bloom_probe(spark, table, m, F.col("shingle")))
        .groupBy("doc_id")
        .agg(F.max("hit").alias("contaminated"))
    )
    train = docs.filter(F.col("doc_id") % _DECON_EVAL_MOD != 0)
    return (
        train.join(probed, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.sum(
                F.when(F.col("contaminated"), 1).otherwise(0)
            ).cast("bigint").alias("n_flagged"),
        )
    )


# --------------------------------------------------------------------------
# Full pretraining-corpus recipe: quality band -> chunk dedup -> decontaminate
# --------------------------------------------------------------------------
def _pretrain_pipeline_sql() -> str:
    from barco_spark.operators.corpus_lm import KEEP_HI, KEEP_LO
    from barco_spark.operators.quality import CHUNK
    from barco_spark.operators.text import h28_sql

    return f"""
    WITH train AS (
      SELECT * FROM documents WHERE doc_id % {_DECON_EVAL_MOD} <> 0
    ),
    tok AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM train
    ),
    cnt AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
    scored AS (
      SELECT doc_id, lang, COUNT(*) AS n_tokens,
             CAST(SUM(CAST(FLOOR(LOG2(c)) AS BIGINT)) AS BIGINT) AS sum_log2
      FROM tok JOIN cnt USING (w) GROUP BY doc_id, lang
    ),
    ranked AS (
      SELECT doc_id,
             PERCENT_RANK() OVER (
               PARTITION BY lang
               ORDER BY CAST(sum_log2 AS DOUBLE) / n_tokens, doc_id
             ) AS pct
      FROM scored
    ),
    kept AS (
      SELECT t.* FROM train t JOIN ranked r USING (doc_id)
      WHERE r.pct >= {KEEP_LO} AND r.pct <= {KEEP_HI}
    ),
    w2 AS (SELECT doc_id, string_split(text, ' ') AS words FROM kept),
    c2 AS (
      SELECT doc_id, j,
             array_to_string(
               list_slice(words, j*{CHUNK}+1, j*{CHUNK}+{CHUNK}), ' ') AS chunk
      FROM w2, unnest(range(0, (len(words) + {CHUNK - 1}) // {CHUNK})) AS u(j)
    ),
    flagged AS (
      SELECT doc_id, j, chunk,
             ROW_NUMBER() OVER (
               PARTITION BY {h28_sql('chunk')} ORDER BY doc_id, j
             ) AS rn
      FROM c2
    ),
    totals2 AS (SELECT doc_id, COUNT(*) AS n_chunks FROM c2 GROUP BY doc_id),
    rebuilt AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             array_to_string(list(chunk ORDER BY j), ' ') AS new_text
      FROM flagged WHERE rn = 1 GROUP BY doc_id
    ),
    rw AS (
      SELECT t.doc_id,
             t.n_chunks - COALESCE(r.n_kept, 0) AS n_dropped,
             COALESCE(r.new_text, '') AS new_text
      FROM totals2 t LEFT JOIN rebuilt r USING (doc_id)
    ),
    eval_w AS (
      SELECT doc_id, string_split(text, ' ') AS words
      FROM documents WHERE doc_id % {_DECON_EVAL_MOD} = 0
    ),
    eval_h AS (
      SELECT DISTINCT {h28_sql('s')} AS h
      FROM (SELECT unnest({_decon_shingles_sql()}) AS s FROM eval_w)
    ),
    rw_w AS (
      SELECT doc_id, string_split(new_text, ' ') AS words FROM rw
      WHERE new_text <> ''
    ),
    rw_h AS (
      SELECT doc_id, unnest(list_transform({_decon_shingles_sql()},
                                           s -> {h28_sql('s')})) AS h
      FROM rw_w
    ),
    contaminated AS (
      SELECT DISTINCT t.doc_id FROM rw_h t JOIN eval_h e ON t.h = e.h
    ),
    per_doc AS (
      SELECT rw.doc_id, k.source, rw.n_dropped, rw.new_text,
             CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END AS contam
      FROM rw
      JOIN kept k ON rw.doc_id = k.doc_id
      LEFT JOIN contaminated c ON rw.doc_id = c.doc_id
    ),
    agg1 AS (
      SELECT source,
             COUNT(*) AS n_kept_docs,
             CAST(SUM(n_dropped) AS BIGINT) AS n_chunks_dropped,
             CAST(SUM(contam) AS BIGINT) AS n_contaminated,
             CAST(SUM(CASE WHEN contam = 0 AND new_text <> ''
                           THEN len(string_split(new_text, ' '))
                           ELSE 0 END) AS BIGINT) AS final_tokens
      FROM per_doc GROUP BY source
    ),
    base AS (SELECT source, COUNT(*) AS n_input FROM train GROUP BY source)
    SELECT b.source, b.n_input,
           b.n_input - COALESCE(a.n_kept_docs, 0) AS n_quality_dropped,
           COALESCE(a.n_chunks_dropped, 0) AS n_chunks_dropped,
           COALESCE(a.n_contaminated, 0) AS n_contaminated,
           COALESCE(a.n_kept_docs, 0) - COALESCE(a.n_contaminated, 0) AS n_final,
           COALESCE(a.final_tokens, 0) AS final_tokens
    FROM base b LEFT JOIN agg1 a USING (source)
    """


@register(
    "pretrain_corpus_pipeline",
    _pretrain_pipeline_sql(),
    "pipeline",
    doc=(
        "The full pretraining-corpus recipe as ONE oracle-paired query: "
        "(1) CCNet-style unigram-LM percent_rank band filter per "
        "language, (2) C4 chunk-dedup REWRITE over the survivors "
        "(first occurrence wins, documents reassembled), (3) benchmark "
        "decontamination of the REWRITTEN text against the eval "
        "split's 4-gram shingles (broadcast semi-join), (4) per-source "
        "funnel: input / quality-dropped / chunks-dropped / "
        "contaminated / final docs+tokens. Every stage is the verified "
        "composable core of its standalone operator; integers "
        "throughout, so the whole funnel hash-matches."
    ),
)
def pretrain_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from barco_spark.operators.corpus_lm import (
        KEEP_HI,
        KEEP_LO,
        chunk_rewrite_frame,
        unigram_scores,
    )
    from barco_spark.tables import t

    docs = t(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % _DECON_EVAL_MOD == 0
    train = docs.filter(~is_eval)

    from barco_spark.session import eager_persist

    # kept_ids is referenced by BOTH the rewrite frame below and the
    # per-doc funnel join; un-persisted, the second reference re-ran the
    # whole unigram_scores subtree — two more corpus text-explode passes
    # (event-log r12: the 1861/74271/29452-byte shuffle stages each ran
    # twice).  Persisting the doc_id-only proxy (guide §8: decide with
    # small rows) makes the quality filter run once; the funnel join
    # then costs one NARROW (doc_id, source) corpus scan.  A/B at sf0.1
    # is a wash (±0.15 s, the duplicated stages overlap on idle cores);
    # kept for the pass count at scale: 4 text explodes -> 2.
    kept_ids = eager_persist(
        unigram_scores(train)
        .filter(
            (F.col("lang_pct") >= KEEP_LO) & (F.col("lang_pct") <= KEEP_HI)
        )
        .select("doc_id")
    )
    kept = train.join(kept_ids, "doc_id")

    # the rewrite frame feeds BOTH the decontamination shingles and the
    # per-doc funnel join; persist it so the chunk-dedup pass (the
    # pipeline's widest stage) runs once (3.6 s -> 3.2 s at sf0.1).
    # At 100 TB this is rewritten-corpus-sized: MEMORY_AND_DISK, or a
    # materialized intermediate table between pipeline stages.
    rw = eager_persist(
        chunk_rewrite_frame(kept).select("doc_id", "n_dropped", "new_text")
    )

    from barco_spark.operators.text import h28

    eval_h = (
        _decon_shingles(docs.filter(is_eval))
        .select(h28(F.col("shingle")).alias("h"))
        .distinct()
    )
    rw_docs = rw.filter(F.col("new_text") != "").select(
        "doc_id", F.lit("x").alias("source"), F.col("new_text").alias("text")
    )
    contaminated = (
        _decon_shingles(rw_docs)
        .select("doc_id", h28(F.col("shingle")).alias("h"))
        .join(F.broadcast(eval_h), "h")
        .select("doc_id")
        .distinct()
        .withColumn("_c", F.lit(1))
    )

    per_doc = (
        rw.join(kept.select("doc_id", "source"), "doc_id")
        .join(contaminated, "doc_id", "left")
        .select(
            "source",
            "n_dropped",
            "new_text",
            F.coalesce(F.col("_c"), F.lit(0)).alias("contam"),
        )
    )
    agg1 = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept_docs"),
        F.sum("n_dropped").cast("bigint").alias("n_chunks_dropped"),
        F.sum("contam").cast("bigint").alias("n_contaminated"),
        F.sum(
            F.when(
                (F.col("contam") == 0) & (F.col("new_text") != ""),
                F.size(F.split(F.col("new_text"), " ")),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("final_tokens"),
    )
    base = train.groupBy("source").agg(F.count(F.lit(1)).alias("n_input"))
    z = F.lit(0)
    out = base.join(agg1, "source", "left").select(
        "source",
        "n_input",
        (F.col("n_input") - F.coalesce(F.col("n_kept_docs"), z)).alias(
            "n_quality_dropped"
        ),
        F.coalesce(F.col("n_chunks_dropped"), z).cast("bigint").alias(
            "n_chunks_dropped"
        ),
        F.coalesce(F.col("n_contaminated"), z).cast("bigint").alias(
            "n_contaminated"
        ),
        (
            F.coalesce(F.col("n_kept_docs"), z)
            - F.coalesce(F.col("n_contaminated"), z)
        ).alias("n_final"),
        F.coalesce(F.col("final_tokens"), z).cast("bigint").alias(
            "final_tokens"
        ),
    )
    # the pagerank/_kcore_peel cache discipline (r8): the result is
    # per-source (a handful of rows) — materialize it eagerly so the
    # REWRITTEN-CORPUS-sized rw cache is released at the call boundary
    # instead of leaking for the session lifetime (r9 scale study:
    # 1 corpus-sized persisted RDD after every call at 50k-1M docs)
    out = out.localCheckpoint()
    rw.unpersist()
    kept_ids.unpersist()
    return out
