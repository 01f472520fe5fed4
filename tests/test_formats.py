"""File-format scan coverage (SURVEY §2.7 row 1): the engine reads
parquet everywhere; these lock in the csv/json/orc scan paths with
schema projection and filter pushdown behavior.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from barco_spark.plans import explain_str
from barco_spark.tables import t


def _sample(spark, sf_dir):
    return t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")


def test_csv_scan_roundtrip(spark, sf_dir, tmp_path):
    src = _sample(spark, sf_dir)
    path = str(tmp_path / "nation_csv")
    src.write.option("header", True).csv(path)
    back = (
        spark.read.option("header", True)
        .schema("n_nationkey bigint, n_name string, n_regionkey bigint")
        .csv(path)
    )
    got = back.filter(F.col("n_regionkey") == 2).select("n_name")
    want = src.filter(F.col("n_regionkey") == 2).select("n_name")
    assert sorted(r.n_name for r in got.collect()) == sorted(
        r.n_name for r in want.collect()
    )
    # explicit schema => no inference pass; the filter reaches the scan
    assert "PushedFilters" in explain_str(got)


def test_json_scan_roundtrip(spark, sf_dir, tmp_path):
    src = _sample(spark, sf_dir)
    path = str(tmp_path / "nation_json")
    src.write.json(path)
    back = spark.read.schema(
        "n_nationkey bigint, n_name string, n_regionkey bigint"
    ).json(path)
    assert back.count() == src.count()
    assert back.filter(F.col("n_nationkey") == 3).collect()[0].n_name == "NATION_3"


def test_orc_scan_roundtrip(spark, sf_dir, tmp_path):
    src = _sample(spark, sf_dir)
    path = str(tmp_path / "nation_orc")
    src.write.orc(path)
    back = spark.read.orc(path)
    got = back.filter(F.col("n_regionkey") == 0)
    # ORC scans push filters and prune columns like parquet
    plan = explain_str(got.select("n_name"))
    assert "PushedFilters" in plan
    assert got.count() == src.filter(F.col("n_regionkey") == 0).count()


def test_events_ts_is_instant_timestamp(spark, sf_dir):
    """Pinned schema contract: the events `ts` column must load as
    TIMESTAMP (an instant), never TIMESTAMP_NTZ, regardless of whether
    the testdata stores TIMESTAMP(NANOS) or naive micros and regardless
    of the Spark default for `inferTimestampNTZ` (flipped in 3.4+).
    Every unix_micros()/window() site downstream depends on this.
    """
    from pyspark.sql.types import TimestampType

    from barco_spark.tables import t

    df = t(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType), df.schema["ts"].dataType


def test_ntz_safe_on_foreign_session(spark, sf_dir):
    """Even if the *caller's* session left NTZ inference on (the driver
    owns its SparkSession), t() must pin the conf before reading."""
    from pyspark.sql.types import TimestampType

    from barco_spark import tables

    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    tables._SCHEMA_CACHE.pop((sf_dir, "events"), None)
    try:
        df = tables.t(spark, sf_dir, "events")
        assert isinstance(df.schema["ts"].dataType, TimestampType)
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


def test_corpus_from_text_files(spark, tmp_path):
    """Directory of .txt files -> canonical documents shape; every
    registered operator can run on the result unchanged."""
    from barco_spark.operators.text import with_quality
    from barco_spark.sources.corpus import DOCUMENTS_SCHEMA, corpus_from_text_files

    d = tmp_path / "shard0"
    d.mkdir()
    (d / "a.txt").write_text("the quick brown fox")
    (d / "b.txt").write_text("lorem ipsum dolor sit amet and more words here")
    (d / "skip.json").write_text("{}")

    docs = corpus_from_text_files(spark, str(d), lang="en")
    assert [(f.name, f.dataType) for f in docs.schema] == [
        (f.name, f.dataType) for f in DOCUMENTS_SCHEMA
    ]
    rows = {r["text"]: r for r in docs.collect()}
    assert set(rows) == {"the quick brown fox",
                         "lorem ipsum dolor sit amet and more words here"}
    a = rows["the quick brown fox"]
    assert (a["lang"], a["source"], a["n_chars"]) == ("en", "shard0", 19)
    assert len({r["doc_id"] for r in rows.values()}) == 2
    # downstream operators accept the shape directly
    scored = with_quality(docs)
    assert scored.filter(F.col("quality_score").isNotNull()).count() == 2


def test_corpus_from_jsonl(spark, tmp_path):
    from barco_spark.sources.corpus import DOCUMENTS_SCHEMA, corpus_from_jsonl

    d = tmp_path / "dumpdir"
    d.mkdir()
    (d / "part0.jsonl").write_text(
        '{"text": "doc one", "lang": "en", "source": "web"}\n'
        '{"text": "doc two"}\n'
        '{"notext": true}\n'
    )
    docs = corpus_from_jsonl(spark, str(d))
    assert [(f.name, f.dataType) for f in docs.schema] == [
        (f.name, f.dataType) for f in DOCUMENTS_SCHEMA
    ]
    rows = {r["text"]: r for r in docs.collect()}
    assert set(rows) == {"doc one", "doc two"}
    assert rows["doc one"]["source"] == "web"
    assert rows["doc two"]["source"] == "dumpdir"  # directory fallback
    assert rows["doc two"]["lang"] is None
    assert len({r["doc_id"] for r in rows.values()}) == 2


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Lakehouse schema drift: batch 2 adds a column; mergeSchema reads
    the union schema with NULLs for pre-drift rows, and column pruning
    still pushes into both file generations."""
    path = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    ).write.mode("append").parquet(path)
    spark.createDataFrame(
        [(3, "c", 30.0)], "id long, name string, score double"
    ).write.mode("append").parquet(path)

    df = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r["id"]: (r["name"], r["score"]) for r in df.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 30.0)}

    # old files lack the column entirely; filtering on it must still
    # treat their rows as NULL (never error, never fabricate)
    assert df.where("score > 10").count() == 1
    assert df.where("score IS NULL").count() == 2
