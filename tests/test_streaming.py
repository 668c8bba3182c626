"""Streaming 1m tier: watermarked windowed turn-rate over a file stream
equals the batch rollup for every closed window, and checkpoint restarts
are exactly-once."""

import pytest
from pyspark.sql import functions as F

from kapra_timeseries_anonymization_spark.sources.transcripts import (
    synth_transcripts,
)
from kapra_timeseries_anonymization_spark.streaming.ingest import (
    run_stream_to_tier,
)


@pytest.fixture()
def dirs(tmp_path):
    return {
        "src": str(tmp_path / "src"),
        "out": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _batch_rollup(t):
    return t.groupBy(
        "conv_id", F.date_trunc("minute", "ts").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("turn_idx").cast("double").alias("sum_value"),
    )


def test_stream_matches_batch_for_closed_windows(spark, dirs):
    t = synth_transcripts(spark, n_convs=40, mean_turns=20)
    # a far-future closer turn advances the watermark past every real window
    closer = spark.createDataFrame(
        [("c_closer", 0, "user", "end", "", "2024-02-01 00:00:00")],
        "conv_id string, turn_idx int, role string, text string, tool string, ts_s string",
    ).select(
        "conv_id", "turn_idx", "role", "text", "tool",
        F.col("ts_s").cast("timestamp").alias("ts"),
    )
    t.unionByName(closer).write.parquet(dirs["src"])

    run_stream_to_tier(spark, dirs["src"], dirs["out"], dirs["ckpt"])
    got = (
        spark.read.parquet(dirs["out"])
        .filter(F.col("conv_id") != "c_closer")
        .select("conv_id", "bucket", "n", "sum_value")
        .toPandas()
        .sort_values(["conv_id", "bucket"])
        .reset_index(drop=True)
    )
    want = (
        _batch_rollup(t)
        .toPandas()
        .sort_values(["conv_id", "bucket"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got["conv_id"].to_numpy() == want["conv_id"].to_numpy()).all()
    assert (got["n"].to_numpy() == want["n"].to_numpy()).all()
    assert (got["sum_value"].to_numpy() == want["sum_value"].to_numpy()).all()


def test_stream_restart_exactly_once(spark, dirs):
    t = synth_transcripts(spark, n_convs=10, mean_turns=10)
    closer = spark.createDataFrame(
        [("c_closer", 0, "user", "end", "", "2024-02-01 00:00:00")],
        "conv_id string, turn_idx int, role string, text string, tool string, ts_s string",
    ).select(
        "conv_id", "turn_idx", "role", "text", "tool",
        F.col("ts_s").cast("timestamp").alias("ts"),
    )
    t.unionByName(closer).write.parquet(dirs["src"])
    run_stream_to_tier(spark, dirs["src"], dirs["out"], dirs["ckpt"])
    n1 = spark.read.parquet(dirs["out"]).count()
    # restart with the same checkpoint and no new data: no duplicates
    run_stream_to_tier(spark, dirs["src"], dirs["out"], dirs["ckpt"])
    n2 = spark.read.parquet(dirs["out"]).count()
    assert n1 == n2
