"""Vectorized pandas-UDF wrappers around the numpy kernels.

Design: each UDF receives whole Arrow batches (`spark.sql.execution.arrow.
maxRecordsPerBatch` rows at a time), stacks the series column into one 2-D
float64 block and makes a single numpy call — no per-row Python anywhere
(BASELINE input_hint). JVM-side expressions stay JVM-side; only the SAX /
pattern-loss math crosses into Python, batched through Arrow.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, StringType

from .kernels import pattern_loss_block, sax_all_levels_block, sax_block


def _stack(values: pd.Series) -> np.ndarray:
    if len(values) == 0:
        return np.empty((0, 0), dtype=np.float64)
    return np.stack(values.to_numpy()).astype(np.float64, copy=False)


def make_sax_udf(level: int, n_segments: int = 4):
    """UDF: array<double> -> SAX word at a single alphabet level."""

    @pandas_udf(StringType())
    def sax_word(values: pd.Series) -> pd.Series:
        block = _stack(values)
        if block.shape[0] == 0:
            return pd.Series([], dtype=object)
        return pd.Series(sax_block(block, level, n_segments), dtype=object)

    return sax_word


def make_sax_levels_udf(levels: list[int], n_segments: int = 4):
    """UDF: array<double> -> array<string> of SAX words, one per level in
    ``levels`` (z-norm + PAA computed once per batch for all levels)."""
    levels = list(levels)

    @pandas_udf(ArrayType(StringType()))
    def sax_words(values: pd.Series) -> pd.Series:
        block = _stack(values)
        if block.shape[0] == 0:
            return pd.Series([], dtype=object)
        by_level = sax_all_levels_block(block, levels, n_segments)
        cols = [by_level[lv] for lv in levels]
        return pd.Series([list(t) for t in zip(*cols)], dtype=object)

    return sax_words


@pandas_udf(DoubleType())
def pattern_loss_udf(values: pd.Series, sax: pd.Series, level: pd.Series) -> pd.Series:
    """Per-record Pattern Loss with the reference KAPRA policy
    (kapra_anonymization.py:273-280): level < 3 -> 1.0; kernel errors -> 0.0."""
    block = _stack(values)
    n = len(values)
    if n == 0:
        return pd.Series([], dtype=np.float64)
    words = sax.to_numpy(dtype=object)
    levels = level.to_numpy()
    out = np.empty(n, dtype=np.float64)
    ok = levels >= 3
    out[~ok] = 1.0
    if ok.any():
        try:
            out[ok] = pattern_loss_block(block[ok], words[ok], levels[ok])
        except Exception:
            # reference wraps each record in try/except -> 0; fall back
            # row-at-a-time only on the (never-hit in practice) error path
            for i in np.flatnonzero(ok):
                try:
                    out[i] = pattern_loss_block(
                        block[i : i + 1], words[i : i + 1], levels[i : i + 1]
                    )[0]
                except Exception:
                    out[i] = 0.0
    return pd.Series(out)


def with_sax(df, values_col: str, level: int, out_col: str = "sax",
             n_segments: int = 4):
    return df.withColumn(out_col, make_sax_udf(level, n_segments)(F.col(values_col)))
