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

from .kernels import (
    SAX_BREAKPOINTS,
    _SIGMA_FLOOR,
    pattern_loss_block,
    sax_all_levels_block,
    sax_block,
)


def sax_paa_expr(values_col: str, t: int = 8, n_segments: int = 4) -> F.Column:
    """JVM-side z-norm + PAA for the flagship shape (t=8, 4 segments of
    2): array<double> of the 4 PAA values. Bit-exact mirror of
    ``kernels.znorm_block``/``paa_block``: numpy 1.26's pairwise
    reduction for 8 contiguous float64s is the adjacent-pairs tree
    ``((a0+a1)+(a2+a3))+((a4+a5)+(a6+a7))`` (probed on this numpy build;
    pinned bit-for-bit in tests/test_kernels.py), reproduced
    term-for-term for both the mean and the variance sums; rows with
    sigma < 1e-6 become all-zero PAA (reference sax_utils.py:11-12)."""
    if t != 8 or n_segments != 4:
        raise ValueError("expression path supports t=8, n_segments=4 only")
    v = [F.col(values_col).getItem(i).cast("double") for i in range(8)]

    def tree8(x: list) -> F.Column:
        return ((x[0] + x[1]) + (x[2] + x[3])) + ((x[4] + x[5]) + (x[6] + x[7]))

    mean = tree8(v) / F.lit(8.0)
    d = [x - mean for x in v]
    var = tree8([y * y for y in d]) / F.lit(8.0)
    std = F.sqrt(var)
    flat = std < F.lit(_SIGMA_FLOOR)
    zn = [F.when(flat, F.lit(0.0)).otherwise(y / std) for y in d]
    return F.array(*[(zn[2 * i] + zn[2 * i + 1]) / F.lit(2.0) for i in range(4)])


def sax_words_from_paa_expr(
    paa_col: str, levels: list[int], n_segments: int = 4
) -> F.Column:
    """SAX words at every level from a PAA array column: symbol index ==
    ``searchsorted(bps, p, 'left')`` via a strict ``p > bp`` counter;
    level < 3 yields the ``"a"*n_segments`` literal (reference
    sax_utils.py:62-85). Kept as a SEPARATE projection from
    :func:`sax_paa_expr` so each expression tree stays small — inlining
    the z-norm/PAA tree into every breakpoint comparison multiplies it
    ~4*alphabet times per level and wedges Catalyst analysis on deep
    alphabets (observed at level 20). Assumes NaN-free input (Spark
    orders NaN above all doubles, searchsorted below; every series
    producer in this engine is NaN-free by construction)."""
    alphabet = "abcdefghijklmnopqrst"
    words = []
    for lv in levels:
        if lv not in SAX_BREAKPOINTS:
            if lv < 3:
                words.append(F.lit("a" * n_segments))
                continue
            raise ValueError(f"Alphabet size {lv} unsupported")
        segs = []
        for j in range(n_segments):
            p = F.col(paa_col).getItem(j)
            idx = None
            for bp in SAX_BREAKPOINTS[lv]:
                term = F.when(p > F.lit(float(bp)), 1).otherwise(0)
                idx = term if idx is None else idx + term
            segs.append(F.substring(F.lit(alphabet[:lv]), idx + 1, 1))
        words.append(F.concat(*segs))
    return F.array(*words)


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
