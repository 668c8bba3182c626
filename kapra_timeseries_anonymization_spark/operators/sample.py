"""Deterministic hash-threshold sampling for training-data pipelines.

At 100 TB, `df.sample()` is the wrong tool for corpus curation: its
Bernoulli draw depends on RNG state per partition, so the selected set
changes under retries, repartitioning, or AQE re-planning, and two runs
over the same snapshot disagree. Hash-threshold sampling keys the
decision on the ROW (include iff h(key) mod B < fraction*B), which makes
the sample a pure function of the data — reproducible across runs,
engines, and cluster layouts, and stable under incremental re-runs (a
document's in/out decision never flips when its neighbors change).

Stratified quotas (e.g. language balancing: keep 50% of English, 100% of
low-resource languages) are the standard curation shape; the per-stratum
fraction is a broadcast map lookup, so the whole operator is one
narrow JVM-side projection + filter — no shuffle, no UDF, fully
pushdown-friendly.

md5 (not xxhash64) on purpose: the same literal expression exists in
ANSI SQL engines, so the DuckDB oracle can reproduce the exact sample —
the determinism claim is machine-checked, not asserted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: denominator of the inclusion threshold; fractions quantize to 1/B
BUCKETS = 1_000_000


def sample_hash(key_col: str) -> F.Column:
    """Uniform-ish value in [0, BUCKETS): first 8 hex chars of
    md5(key-as-string), base-16 decoded, mod BUCKETS."""
    return (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % BUCKETS
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    strata_col: str,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep each row of stratum s with probability ``fractions[s]``
    (``default_fraction`` for unlisted strata), decided by the row key's
    hash — deterministic, partitioning-independent, retry-stable."""
    # round, not truncate: fractions whose double product lands just
    # below an integer (0.29 * 1e6 = 289999.999...) must quantize to the
    # NEAREST bucket count, or the threshold silently disagrees by one
    # bucket with any independently written SQL oracle (ADVICE r03)
    thresh = None
    for stratum, frac in fractions.items():
        cond = F.col(strata_col) == stratum
        lit = F.lit(int(round(frac * BUCKETS)))
        thresh = F.when(cond, lit) if thresh is None else thresh.when(cond, lit)
    default_lit = F.lit(int(round(default_fraction * BUCKETS)))
    thresh = thresh.otherwise(default_lit) if thresh is not None else default_lit
    return df.filter(sample_hash(key_col) < thresh)
