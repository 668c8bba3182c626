"""Gorilla chunk operators: series <-> compressed binary chunk structs.

Chunk row = (keys..., tier, chunk_idx, t_start, t_end, n_points, n_bytes,
payload:binary, watermark:timestamp) — the storage unit of the retention
engine (BASELINE north_star: "per-partition byte-array chunk structs").

Scale/skew stance: the applyInPandas group key is (keys..., chunk_idx)
where chunk_idx is a tumbling time bucket — a pathologically long
conversation is split across many bounded chunks instead of one giant
group, so no salting is needed here (the time axis IS the salt). Sorting
happens inside each bounded group. Decompression is mapInPandas (pure
per-chunk fan-out, no shuffle at all).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.gorilla import decode_chunk, encode_chunk


def _us(ts_col: str):
    # TIMESTAMP_NTZ -> TIMESTAMP is exact under the session's fixed UTC tz
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def compress_chunks(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    chunk_interval_sec: int = 86400,
    tier: str = "raw",
) -> DataFrame:
    """events/points -> one Gorilla chunk per (keys, tumbling time bucket)."""
    interval_us = int(chunk_interval_sec) * 1_000_000
    # exact integral floor division (ADVICE r04): floor(double-quotient)
    # diverges from integer // for timestamps approaching 2^52 us, which
    # would desync the bucket rule from the DuckDB oracle's exact `//`.
    # (x - pmod(x, i)) is an exact multiple of i, so DIV of it is the
    # floor quotient in pure long arithmetic at any magnitude/sign.
    src = df.select(
        *keys,
        _us(ts_col).alias("_ts_us"),
        F.col(value_col).cast("double").alias("_v"),
    ).withColumn(
        "chunk_idx",
        F.expr(
            f"(_ts_us - pmod(_ts_us, {interval_us}L)) DIV {interval_us}L"
        ).cast("long"),
    )

    key_fields = [df.schema[k] for k in keys]
    out_schema = T.StructType(
        [*key_fields,
         T.StructField("tier", T.StringType()),
         T.StructField("chunk_idx", T.LongType()),
         T.StructField("t_start", T.LongType()),
         T.StructField("t_end", T.LongType()),
         T.StructField("n_points", T.LongType()),
         T.StructField("n_bytes", T.LongType()),
         T.StructField("payload", T.BinaryType()),
         T.StructField("watermark", T.TimestampType())]
    )

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_ts_us", "_v"], kind="mergesort")
        ts = pdf["_ts_us"].to_numpy(np.int64)
        vals = pdf["_v"].to_numpy(np.float64)
        payload = encode_chunk(ts, vals)
        row = {k: pdf.iloc[0][k] for k in keys}
        row.update(
            tier=tier,
            chunk_idx=int(pdf.iloc[0]["chunk_idx"]),
            t_start=int(ts[0]),
            t_end=int(ts[-1]),
            n_points=len(ts),
            n_bytes=len(payload),
            payload=payload,
            watermark=pd.Timestamp(int(ts[-1]), unit="us"),
        )
        return pd.DataFrame([row], columns=[f.name for f in out_schema.fields])

    return src.groupBy(*keys, "chunk_idx").applyInPandas(encode, out_schema)


def decompress_chunks(
    chunks: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """chunks -> points. No shuffle: each chunk row expands independently."""
    key_fields = [chunks.schema[k] for k in keys]
    out_schema = T.StructType(
        [*key_fields,
         T.StructField(ts_col, T.TimestampType()),
         T.StructField(value_col, T.DoubleType())]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # column-wise zip (no iterrows): one python iteration per
            # CHUNK; the per-point work is vectorized in decode_chunk
            frames = []
            key_cols = {k: pdf[k].to_numpy() for k in keys}
            for i, payload in enumerate(pdf["payload"].to_numpy()):
                ts, vals = decode_chunk(bytes(payload))
                d = {k: np.repeat(col[i], len(ts)) for k, col in key_cols.items()}
                d[ts_col] = pd.to_datetime(ts, unit="us")
                d[value_col] = vals
                frames.append(pd.DataFrame(d))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return chunks.select(*keys, "payload").mapInPandas(decode, out_schema)


def chunk_stats(chunks: DataFrame, keys: list[str] = ()) -> DataFrame:
    """Compression accounting per key (or global): points, bytes,
    bytes/point vs the raw 16 B/point floor."""
    g = chunks.groupBy(*keys) if keys else chunks.groupBy()
    return g.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_points").alias("n_points"),
        F.sum("n_bytes").alias("n_bytes"),
        F.round(F.sum("n_bytes") / F.sum("n_points"), 4).alias("bytes_per_point"),
        F.round(
            F.lit(16.0) * F.sum("n_points") / F.sum("n_bytes"), 4
        ).alias("compression_x"),
    )
