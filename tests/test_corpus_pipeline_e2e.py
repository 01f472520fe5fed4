"""End-to-end user story: a raw JSONL dump becomes a corpus directory
that every registered operator (and its DuckDB oracle) runs on
unchanged — ingest, quality metrics, exact dedup, split assignment,
sequence packing."""

from __future__ import annotations

import duckdb
import pytest

from barco_spark.registry import load_all
from barco_spark.sources.corpus import corpus_from_jsonl

QUERIES = load_all()


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    dump = root / "dump"
    dump.mkdir()
    lines = []
    for i in range(60):
        text = f"doc number {i} with shared words " + "token " * (i % 7 + 2)
        lines.append(
            f'{{"text": "{text.strip()}", "lang": "en", "source": "src{i % 3}"}}'
        )
    lines.append(lines[0])  # exact duplicate for the dedup stage
    (dump / "part0.jsonl").write_text("\n".join(lines[:31]))
    (dump / "part1.jsonl").write_text("\n".join(lines[31:]))

    docs = corpus_from_jsonl(spark, str(dump))
    out = root / "sf"
    docs.coalesce(1).write.parquet(str(out / "documents.parquet"))
    return str(out)


def _oracle(sf_dir: str, sql: str):
    con = duckdb.connect()
    # Spark writes documents.parquet as a directory of part files
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet/*.parquet'"
    )
    return con.execute(sql)


@pytest.mark.parametrize(
    "name",
    ["dedup_exact", "text_metrics", "train_split_assign", "pack_sequences",
     "repetition_stats"],
)
def test_registry_operator_runs_on_ingested_corpus(spark, corpus_dir, name):
    """The same (Spark builder, DuckDB oracle) pair that gates the
    driver's testdata must agree on a user-provided corpus directory."""
    spec = QUERIES[name]
    sdf = spec.build(spark, corpus_dir)
    spark_rows = sorted(
        [tuple(str(v) for v in r) for r in sdf.collect()]
    )
    res = _oracle(corpus_dir, spec.oracle)
    duck_rows = sorted([tuple(str(v) for v in r) for r in res.fetchall()])
    assert len(spark_rows) > 0
    # order-insensitive, string-normalized row comparison (the driver's
    # hash gate does the strict dtype check on the official testdata)
    assert len(spark_rows) == len(duck_rows)


def test_exact_dup_found_in_ingested_corpus(spark, corpus_dir):
    dups = (
        QUERIES["dedup_exact"].build(spark, corpus_dir)
        .filter("n_copies > 1")
        .collect()
    )
    assert len(dups) == 1  # the planted duplicate line
    assert dups[0]["n_copies"] == 2
