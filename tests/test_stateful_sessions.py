"""applyInPandasWithState sessionization: state accumulates per
conversation across micro-batches and closed sessions emit on timeout."""

import time

import pandas as pd
from pyspark.sql import functions as F

from kapra_timeseries_anonymization_spark.streaming.sessions import (
    sessionize_stream,
)
from kapra_timeseries_anonymization_spark.streaming.ingest import TRANSCRIPT_DDL


def test_stateful_sessionization(spark, tmp_path):
    src = str(tmp_path / "src")
    out_rows = []

    # batch 1: two conversations
    pdf = pd.DataFrame(
        {
            "conv_id": ["a"] * 3 + ["b"] * 2,
            "turn_idx": [0, 1, 2, 0, 1],
            "role": ["user"] * 5,
            "text": [f"t{i}" for i in range(5)],
            "tool": [""] * 5,
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:00:10",
                 "2024-01-01 00:00:20", "2024-01-01 01:00:00",
                 "2024-01-01 01:00:30"]
            ),
        }
    )
    def write(frame, mode):
        (
            spark.createDataFrame(frame)
            .withColumn("turn_idx", F.col("turn_idx").cast("int"))
            # ONE file per write: maxFilesPerTrigger=1 must deliver a
            # whole burst in one micro-batch, or the 2s processing-time
            # gap can fire between part-files of the same conversation
            .coalesce(1)
            .write.parquet(src, mode=mode)
        )

    write(pdf, "overwrite")

    stream = (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # gap of 10s: long enough that the seq+1 placeholder (which lives ONE
    # further gap after a session closes) comfortably survives the poll +
    # write + micro-batch latency of the second burst below, even when
    # the whole suite runs concurrently
    sessions = sessionize_stream(stream, gap_sec=10)

    q = (
        sessions.writeStream.outputMode("append")
        .foreachBatch(lambda df, _id: out_rows.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # wait for ingestion, then for the 2s processing-time gap to fire;
        # an empty follow-up batch is needed to evaluate timeouts, so add
        # a late third conversation
        # processing-time timeouts only fire when a micro-batch runs, so
        # keep poking the source with tick conversations (robust to CPU
        # contention when the whole suite runs concurrently)
        tick = 0
        deadline = time.time() + 150
        while time.time() < deadline and not any(
            r["conv_id"] == "a" for r in out_rows
        ):
            write(pdf.head(1).assign(conv_id=f"c{tick}", text="late"),
                  "append")
            tick += 1
            time.sleep(3)

        # conversation "a" returns IMMEDIATELY after its session closed
        # (well inside the placeholder's one-gap lifetime): the burst
        # must emit session_seq=2 (placeholder state, not seq reset)
        pdf2 = pdf.head(2).assign(
            ts=pd.to_datetime(["2024-01-01 02:00:00", "2024-01-01 02:00:05"])
        )
        write(pdf2, "append")
        deadline = time.time() + 150
        while time.time() < deadline and not any(
            r["conv_id"] == "a" and r["session_seq"] == 2 for r in out_rows
        ):
            write(pdf.head(1).assign(conv_id=f"d{tick}", text="tick"),
                  "append")
            tick += 1
            time.sleep(3)
    finally:
        q.stop()

    got = {}
    for r in out_rows:
        got.setdefault(r["conv_id"], []).append(r)
    assert "a" in got and "b" in got
    first_a = got["a"][0]
    assert first_a["n_turns"] == 3
    assert got["b"][0]["n_turns"] == 2
    assert first_a["session_seq"] == 1
    assert str(first_a["first_ts"]) == "2024-01-01 00:00:00"
    assert str(first_a["last_ts"]) == "2024-01-01 00:00:20"
    second_a = [r for r in got["a"] if r["session_seq"] == 2]
    assert second_a, f"second session of 'a' never emitted: {out_rows}"
    assert second_a[0]["n_turns"] == 2
    assert str(second_a[0]["first_ts"]) == "2024-01-01 02:00:00"
