"""Vector helpers: JVM higher-order-function path and Arrow/numpy path.

The JVM fold (operators/similarity.py:dot) is the determinism-exact
path used for oracle queries. This module adds the vectorized pandas
UDF path for wide vectors / big batch throughput: numpy dot over Arrow
batches (~10-100x faster per row than per-element folds for dim >> 64,
at the cost of bit-exact reproducibility of summation order).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def cosine_udf() -> Column:
    """pandas UDF (a: array, b: array) -> cosine similarity (double)."""

    @pandas_udf(DoubleType())
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        am = np.stack(a.map(np.asarray).values)
        bm = np.stack(b.map(np.asarray).values)
        num = (am * bm).sum(axis=1)
        den = np.linalg.norm(am, axis=1) * np.linalg.norm(bm, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(den == 0, 0.0, num / den)
        return pd.Series(out)

    return _cos


def norm_udf() -> Column:
    @pandas_udf(DoubleType())
    def _norm(a: pd.Series) -> pd.Series:
        return a.map(lambda v: float(np.linalg.norm(np.asarray(v))))

    return _norm
