"""Transcript source + north-star flagship path.

Covers: deterministic synth generator (partition-order independence —
the property the reference's global np.random.seed lacks,
reference src/dataset.py:63), the per-turn text-equality invariant of the
events->transcripts derivation, the turn-rate series derivation, and exact
KAPRA parity on transcript-derived series vs the numpy oracle.
"""

import numpy as np

from kapra_timeseries_anonymization_spark.operators.kapra import kapra_anonymize
from kapra_timeseries_anonymization_spark.sources.transcripts import (
    conv_turn_rate_series,
    synth_transcripts,
    transcripts_from_events,
)
from tests.oracle.reference_impl import kapra_pipeline

SF = "/root/testdata/sf0.001"


def test_synth_transcripts_partition_independent(spark):
    a = synth_transcripts(spark, n_convs=50, mean_turns=16)
    b = synth_transcripts(spark, n_convs=50, mean_turns=16).repartition(13)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb
    assert len(ra) > 50
    # schema is exactly the input_hint shape
    assert a.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    # turn_idx contiguous per conversation
    import pyspark.sql.functions as F

    bad = (
        a.groupBy("conv_id")
        .agg(F.count("*").alias("n"), F.max("turn_idx").alias("mx"))
        .filter(F.col("mx") != F.col("n") - 1)
        .count()
    )
    assert bad == 0


def test_synth_transcripts_skew_conv(spark):
    t = synth_transcripts(spark, n_convs=10, mean_turns=8, skew_conv_turns=5000)
    n = t.filter(t.conv_id == "c_skew").count()
    assert n == 5000


def test_transcripts_from_events_text_invariant(spark):
    """Per-turn text equality under stable (conv_id, turn_idx) ordering:
    two independent evaluations (different partitioning) agree row-for-row."""
    t1 = transcripts_from_events(spark, SF)
    t2 = transcripts_from_events(spark, SF).repartition(7)
    r1 = t1.orderBy("conv_id", "turn_idx").select("text").collect()
    r2 = t2.orderBy("conv_id", "turn_idx").select("text").collect()
    assert r1 == r2
    # turn_idx is dense 0..n-1 per conversation
    import pyspark.sql.functions as F

    chk = (
        t1.groupBy("conv_id")
        .agg(
            F.count("*").alias("n"),
            F.max("turn_idx").alias("mx"),
            F.min("turn_idx").alias("mn"),
        )
        .filter((F.col("mx") != F.col("n") - 1) | (F.col("mn") != 0))
        .count()
    )
    assert chk == 0


def test_kapra_on_transcript_series_matches_oracle(spark):
    """North-star path: transcripts -> per-conv turn-rate series -> KAPRA;
    group assignments exact vs the numpy reference oracle on the SAME
    series (sorted by original_index, the stable conv hash)."""
    t = transcripts_from_events(spark, SF)
    series_df = conv_turn_rate_series(t, n_buckets=8)
    pdf = (
        series_df.select("original_index", "values")
        .toPandas()
        .sort_values("original_index")
        .reset_index(drop=True)
    )
    series = np.array(pdf["values"].tolist(), dtype=np.float64)
    # oracle indexes records 0..n-1 in input order; map back via position
    oracle = kapra_pipeline(series, K=8, P=2, sax_level=8)
    got = kapra_anonymize(series_df, K=8, P=2, sax_level=8, t=8)
    rows = {
        r["original_index"]: r
        for r in got.records.select(
            "original_index", "group_id", "pattern", "level"
        ).collect()
    }
    oidx = pdf["original_index"].to_numpy()
    assert len(rows) == len(oracle.record_index)
    for pos, gid, pat, lvl in zip(
        oracle.record_index, oracle.group_id, oracle.pattern, oracle.level
    ):
        r = rows[int(oidx[pos])]
        assert r["group_id"] == gid
        assert r["pattern"] == pat
        assert r["level"] == lvl


def test_turn_rate_series_python_oracle(spark):
    """Pin conv_turn_rate_series semantics against an independent python
    recomputation (same float ops), including a skewed conversation and a
    single-turn conversation (span floor 1e-9). Guards any future plan
    rewrite of the derive stage (e.g. the r03 digest-aggregate experiment,
    reverted for absolute-throughput reasons — BENCH.md r03)."""
    import math

    import pyspark.sql.functions as F

    t = synth_transcripts(
        spark, n_convs=200, mean_turns=12, skew_conv_turns=3000
    )
    one = synth_transcripts(spark, n_convs=1, mean_turns=2).filter(
        "turn_idx = 0"
    )
    t = t.unionByName(one.withColumn("conv_id", F.lit("c_single")))
    n_buckets = 8

    rows = t.select(
        "conv_id", F.col("ts").cast("timestamp").cast("double").alias("sec")
    ).collect()
    by_conv: dict[str, list[float]] = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r["sec"])
    expect = {}
    for cid, secs in by_conv.items():
        lo, hi = min(secs), max(secs)
        span = max(hi - lo, 1e-9)
        vals = [0.0] * n_buckets
        for x in secs:
            b = min(int(math.floor((x - lo) / span * n_buckets)), n_buckets - 1)
            vals[b] += 1.0
        expect[cid] = tuple(vals)

    got = {
        r["conv_id"]: tuple(r["values"])
        for r in conv_turn_rate_series(t, n_buckets=n_buckets).collect()
    }
    assert got == expect
    assert sum(got["c_skew"]) == 3000
    assert got["c_single"] == (1.0,) + (0.0,) * 7
