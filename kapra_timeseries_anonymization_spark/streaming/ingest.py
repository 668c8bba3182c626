"""Structured Streaming ingestion of transcript turns into the 1m tier.

The batch engine (plans/lineage.py) is the primary path per SURVEY §2.7 —
the reference is pure batch and "watermark" in the lineage log is a
high-water-mark column. This module adds the streaming front door for
continuously arriving transcripts: a file-source (or any readStream
source) of transcript rows flows through a watermarked tumbling-window
turn-rate aggregation and lands in the same 1m tier layout the batch
cascade reads, so the 1h/1d tiers need no streaming logic at all.

Late data: `withWatermark(ts, late)` bounds state; turns later than the
watermark are dropped by Spark's standard semantics (at 10^12-turn scale
the state store, not correctness, is the constraint — keep `late` tight
and reconcile stragglers with a periodic batch backfill via
materialize_cascade, which is idempotent per partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp"
)


def read_transcript_stream(
    spark: SparkSession, src_dir: str, max_files: int = 16
) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .option("maxFilesPerTrigger", max_files)
        .parquet(src_dir)
    )


def stream_turn_rate_1m(stream: DataFrame, late: str = "5 minutes") -> DataFrame:
    """Watermarked tumbling 1-minute turn-rate aggregate per conversation.
    Output schema matches the batch 1m tier (bucket, n, sum/min/max over
    turn_idx as the value stand-in) so downstream tiers are shared."""
    return (
        stream.withWatermark("ts", late)
        .groupBy("conv_id", F.window("ts", "1 minute").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("turn_idx").cast("double").alias("sum_value"),
            F.min("turn_idx").cast("double").alias("min_value"),
            F.max("turn_idx").cast("double").alias("max_value"),
        )
        .select(
            "conv_id",
            F.col("w.start").alias("bucket"),
            "n", "sum_value", "min_value", "max_value",
        )
    )


def run_stream_to_tier(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    late: str = "5 minutes",
) -> None:
    """Drain everything currently available (availableNow trigger) into the
    1m tier directory, exactly-once via the streaming checkpoint. Restarts
    resume from the checkpoint — the streaming analogue of the batch
    lineage log."""
    agg = stream_turn_rate_1m(read_transcript_stream(spark, src_dir), late)
    q = (
        agg.withColumn("p_date", F.to_date("bucket").cast("string"))
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("p_date")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
