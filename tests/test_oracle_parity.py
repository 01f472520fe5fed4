"""Local mirror of the driver's CORRECTNESS gate.

For every registry entry with an oracle, run the Spark DataFrame and the
DuckDB SQL on the same parquet tables, then compare row count, column
names, and an order-insensitive value comparison (sorted rows, with
small FP tolerance only as a diagnostic — the goal is exact equality,
matching the driver's hash check).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from barco_spark.registry import load_all
from barco_spark.tables import TABLE_NAMES

QUERIES = load_all()
ORACLE_CASES = [name for name, spec in QUERIES.items() if spec.oracle is not None]
ROWS_ONLY_CASES = [name for name, spec in QUERIES.items() if spec.oracle is None]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def _sorted_rows(rows, colnames):
    # driver compare sorts columns by name, then rows; mirror that
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    proj = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(proj, key=lambda tup: tuple(str(x) for x in tup))


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_parity(spark, sf_dir, name):
    spec = QUERIES[name]
    sdf = spec.build(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    con = _duck(sf_dir)
    res = con.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(c.lower() for c in spark_cols) == sorted(
        c.lower() for c in duck_cols
    ), f"{name}: column names differ: spark={spark_cols} duck={duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count differs: spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    s_sorted = _sorted_rows(spark_rows, [c.lower() for c in spark_cols])
    d_sorted = _sorted_rows(duck_rows, [c.lower() for c in duck_cols])
    mismatches = []
    for i, (sr, dr) in enumerate(zip(s_sorted, d_sorted)):
        if sr != dr:
            mismatches.append((i, sr, dr))
            if len(mismatches) >= 5:
                break
    assert not mismatches, f"{name}: value mismatches (spark vs duck): {mismatches}"


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only_runs(spark, sf_dir, name):
    spec = QUERIES[name]
    sdf = spec.build(spark, sf_dir)
    assert sdf.count() >= 0
