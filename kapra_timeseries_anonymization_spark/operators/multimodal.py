"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Media rows are ``(media_id:long, kind:string, payload:binary,
meta:struct<width:int, height:int, duration_ms:int, format:string>)``.
The Spark-side plumbing — schema, partitioning, Arrow batch shapes,
mapInPandas signatures — is real and tested; the actual image/audio codecs
are NOT in this container, so the decode step is gated: with
``decoder="real"`` it raises NotImplementedError (the seam where
PIL/ffmpeg plug in), with the default ``decoder="fake"`` it derives
deterministic pixel statistics from the payload bytes so every downstream
stage (feature extraction, batching, joins) runs for real.

Scale notes: payloads ride in the same parquet row group as their
metadata; pushdown-friendly filters (kind, meta.width) never touch bytes
thanks to parquet column pruning. Feature extraction is mapInPandas with
bounded Arrow batches (payload bytes dominate memory, so set
spark.sql.execution.arrow.maxRecordsPerBatch low for real media).
Frame sampling is pure JVM (sequence + explode) — one narrow map.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("format", T.StringType()),
                ]
            ),
        ),
    ]
)

KINDS = ["image", "audio", "video"]


def synth_media(spark: SparkSession, n: int = 100) -> DataFrame:
    """Deterministic fake media table: payload bytes are a pure function of
    media_id (md5 counter stream), so any partitioning yields identical
    rows — the multimodal analogue of the keyed-PRNG transcript source."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                kind = KINDS[mid % 3]
                seed = hashlib.md5(f"media:{mid}".encode()).digest()
                reps = 64 + (mid % 5) * 32
                payload = (seed * reps)[: 16 * reps]
                w, h = 16 + (mid % 7) * 8, 16 + (mid % 5) * 8
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "payload": payload,
                        "meta": {
                            "width": w,
                            "height": h,
                            "duration_ms": (mid % 11) * 1000 if kind != "image" else 0,
                            "format": {"image": "png", "audio": "wav",
                                       "video": "mp4"}[kind],
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("std_byte", T.DoubleType()),
    ]
)


def decode_media(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode payloads to per-item pixel/sample statistics.

    decoder="real" is the seam for PIL/soundfile/ffmpeg — not available in
    this environment, so it raises NotImplementedError. decoder="fake"
    computes the same-shaped statistics directly from the payload bytes
    (deterministic), keeping the full Arrow/mapInPandas path hot."""
    if decoder not in ("fake", "real"):
        raise ValueError(decoder)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real media codecs (PIL/ffmpeg) are not installed in "
                    "this environment; plug them in here"
                )
            out = []
            # zip over numpy columns — no per-row pandas Series construction
            for mid, kind, payload in zip(
                pdf["media_id"].to_numpy(), pdf["kind"].to_numpy(),
                pdf["payload"].to_numpy()
            ):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                out.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "n_bytes": len(b),
                        "mean_byte": float(b.mean()) if len(b) else 0.0,
                        "std_byte": float(b.std()) if len(b) else 0.0,
                    }
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(run, DECODED_SCHEMA)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Byte-histogram feature vector (dim buckets, L1-normalized) — the
    deterministic stand-in for an image/audio embedding model; the Arrow
    batch shape and output schema are exactly what a real encoder uses."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(
                pdf["media_id"].to_numpy(), pdf["payload"].to_numpy()
            ):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(b // (256 // dim), minlength=dim).astype(float)
                s = hist.sum() or 1.0
                out.append({"media_id": mid, "features": list(hist / s)})
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(run, schema)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan: one row per sampled frame timestamp —
    pure JVM sequence/explode, no Python, no payload decode (the decode of
    the sampled frame is decode_media's job downstream)."""
    v = media.filter(F.col("kind") == "video").filter(
        F.col("meta.duration_ms") > 0
    )
    return v.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.duration_ms") - 1, F.lit(every_ms))
        ).alias("t_ms"),
    ).withColumn(
        "frame_idx", (F.col("t_ms") / every_ms).cast("int")
    )
