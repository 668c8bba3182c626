"""Retention-tier continuous aggregates: raw -> 1m -> 1h -> 1d.

Each tier is a tumbling-window rollup of the PREVIOUS tier (not the raw
data): counts sum, sums sum, mins min, maxes max — all algebraic, so the
cascade is exact (verified against direct-from-raw oracles in tests and in
the driver correctness gate). avg is derived as sum/count at read time,
never stored, so it stays exact under re-aggregation.

Scale: each tier shrinks the data by the bucket ratio (60x, 60x, 24x);
every rollup is one map-side-combinable hash aggregate. Partition pruning:
tier tables are written partitioned by date (see plans/lineage.py), so
incremental runs only touch new partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .derive import time_bucket

TIER_SECONDS = {"raw": None, "1m": 60, "1h": 3600, "1d": 86400}

ROLLUP_COLS = ["n", "sum_value", "min_value", "max_value"]


def rollup_raw(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    interval_sec: int,
    bucket_col: str = "bucket",
) -> DataFrame:
    """First tier: raw events -> bucketed (n, sum, min, max)."""
    return df.groupBy(
        *keys, time_bucket(ts_col, interval_sec).alias(bucket_col)
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(value_col).alias("sum_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )


def rollup_tier(
    df: DataFrame,
    keys: list[str],
    interval_sec: int,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Next tier: re-aggregate an already-rolled-up tier to a coarser
    bucket. Exact for n/sum/min/max (algebraic merge)."""
    return df.groupBy(
        *keys, time_bucket(bucket_col, interval_sec).alias(bucket_col)
    ).agg(
        F.sum("n").alias("n"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def cascade(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    tiers: list[str] = ("1m", "1h", "1d"),
    bucket_col: str = "bucket",
) -> dict[str, DataFrame]:
    """Build the full retention cascade; returns {tier: DataFrame}."""
    out: dict[str, DataFrame] = {}
    prev: DataFrame | None = None
    for tier in tiers:
        sec = TIER_SECONDS[tier]
        if prev is None:
            cur = rollup_raw(df, keys, ts_col, value_col, sec, bucket_col)
        else:
            cur = rollup_tier(prev, keys, sec, bucket_col)
        out[tier] = cur
        prev = cur
    return out
