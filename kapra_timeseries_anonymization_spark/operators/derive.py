"""Series derivation: raw event/turn streams -> per-key bucketed series.

These are the front half of the engine (SURVEY §2.8): tumbling-window
bucketing, dense-spine gap-fill, inter-event latency via lag, and
fixed-length series assembly that feeds PAA/SAX/(k,P) grouping and the
retention tiers. Everything is built-in Spark expressions — no Python UDFs.

Scale notes:
- bucketing is a single hash aggregate on (key, bucket) — map-side combined;
- the gap-fill spine is generated per key with `sequence()` (no driver
  loop, no cross join against a global calendar), so its cost is
  O(active key-buckets), and skew is bounded by each key's time span;
- fixed-length series assembly groups at most `t` bucket rows per output
  row, so `collect_list` groups are bounded (no long-conversation skew).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def epoch_sec(col: str | Column) -> Column:
    """Fractional epoch seconds for TIMESTAMP or TIMESTAMP_NTZ columns.

    NTZ can't cast to double directly; going through TIMESTAMP is exact
    under the engine's fixed UTC session timezone (session.py) and matches
    DuckDB's ``epoch()`` on naive timestamps.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("double")


def time_bucket(ts_col: str | Column, interval_sec: int) -> Column:
    """Tumbling-window bucket start (timestamp) for a timestamp column."""
    secs = F.floor(epoch_sec(ts_col) / interval_sec) * interval_sec
    return F.timestamp_seconds(secs.cast("long"))


def bucket_counts(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    interval_sec: int,
    value_col: str | None = None,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Per-key tumbling-window rollup: count (+ sum/min/max of value_col)."""
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col is not None:
        aggs += [
            F.sum(value_col).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        ]
    return df.groupBy(
        *keys, time_bucket(ts_col, interval_sec).alias(bucket_col)
    ).agg(*aggs)


def gap_fill(
    df: DataFrame,
    keys: list[str],
    bucket_col: str,
    interval_sec: int,
    fill_zero: list[str] = (),
    fill_forward: list[str] = (),
    spine_bounds: tuple | None = None,
) -> DataFrame:
    """Densify per-key bucket rows onto a gapless spine.

    Spine = sequence(min(bucket), max(bucket)) per key (or the explicit
    ``spine_bounds`` timestamps for a global spine). ``fill_zero`` columns
    get 0, ``fill_forward`` columns carry the last non-null value forward
    (Window + last(ignorenulls) — one shuffle keyed by the same keys).
    """
    interval = F.expr(f"INTERVAL {interval_sec} SECONDS")
    if spine_bounds is None:
        bounds = df.groupBy(*keys).agg(
            F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
        )
    else:
        lo, hi = spine_bounds
        bounds = df.select(*keys).distinct().withColumn(
            "_lo", F.lit(lo).cast("timestamp")
        ).withColumn("_hi", F.lit(hi).cast("timestamp"))
    spine = bounds.select(
        *keys,
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"), interval)).alias(bucket_col),
    )
    out = spine.join(df, [*keys, bucket_col], "left")
    for c in fill_zero:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    if fill_forward:
        w = (
            Window.partitionBy(*keys)
            .orderBy(bucket_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        for c in fill_forward:
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def inter_event_latency(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    order_cols: list[str] = (),
    out_col: str = "latency_sec",
) -> DataFrame:
    """Seconds since the previous event of the same key (stable ordering
    via explicit tie-break columns). First event per key -> null."""
    w = Window.partitionBy(*keys).orderBy(ts_col, *order_cols)
    prev = F.lag(epoch_sec(ts_col)).over(w)
    return df.withColumn(out_col, epoch_sec(ts_col) - prev)


def fixed_length_series(
    df: DataFrame,
    keys: list[str],
    bucket_col: str,
    value_col: str,
    t: int,
    interval_sec: int,
    epoch_origin: int = 0,
    series_col: str = "values",
    complete_only: bool = True,
) -> DataFrame:
    """Assemble consecutive-t-bucket windows into fixed-length array series.

    window_idx = floor((bucket_epoch - origin) / interval / t); each output
    row is one (keys…, window_idx, values[t]). Missing buckets inside a
    window are zero-filled positionally, so upstream gap_fill is optional
    for count-like values.
    """
    epoch = epoch_sec(bucket_col).cast("long")
    slot = ((epoch - epoch_origin) / interval_sec).cast("long")
    df2 = df.withColumn("_widx", F.floor(slot / t).cast("long")).withColumn(
        "_pos", (slot % t).cast("int")
    )
    grouped = df2.groupBy(*keys, "_widx").agg(
        F.map_from_entries(
            F.collect_list(F.struct("_pos", F.col(value_col).cast("double")))
        ).alias("_m")
    )
    dense = grouped.withColumn(
        series_col,
        F.transform(
            F.sequence(F.lit(0), F.lit(t - 1)),
            lambda i: F.coalesce(F.col("_m")[i.cast("int")], F.lit(0.0)),
        ),
    ).drop("_m")
    if complete_only:
        dense = dense.filter(F.size(series_col) == t)
    return dense.withColumnRenamed("_widx", "window_idx")


def user_activity_series(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    n_buckets: int = 8,
) -> DataFrame:
    """Flagship derivation: split each key's global observation span into
    ``n_buckets`` equal buckets, zero-fill, return one fixed-length activity
    (event-count) series per key with a stable original_index.

    The global span comes from one scalar aggregate (driver-collected two
    timestamps — not data); bucketing itself is a single groupBy.
    """
    lo, hi = events.agg(
        epoch_sec(F.min(ts_col)), epoch_sec(F.max(ts_col))
    ).first()
    span = max(hi - lo, 1e-9)
    b = F.least(
        F.floor((epoch_sec(ts_col) - F.lit(lo)) / span * n_buckets),
        F.lit(n_buckets - 1),
    ).cast("int")
    counts = events.groupBy(F.col(key), b.alias("b")).agg(
        F.count(F.lit(1)).cast("double").alias("cnt")
    )
    return (
        counts.groupBy(key)
        .agg(F.map_from_entries(F.collect_list(F.struct("b", "cnt"))).alias("_m"))
        .withColumn(
            "values",
            F.transform(
                F.sequence(F.lit(0), F.lit(n_buckets - 1)),
                lambda i: F.coalesce(F.col("_m")[i.cast("int")], F.lit(0.0)),
            ),
        )
        .drop("_m")
        .withColumn("original_index", F.col(key).cast("long"))
    )
