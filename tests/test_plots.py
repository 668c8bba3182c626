"""generate_plots analogue: the plot DATA (metrics comparison rows,
cluster-envelope rows) must be exact — interval-string parse-back equals
the group's true envelope, group selection replays the reference."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kapra_timeseries_anonymization_spark.operators.kapra import kapra_anonymize
from kapra_timeseries_anonymization_spark.plans.plots import (
    cluster_envelope_data,
    generate_plots,
    metrics_comparison_data,
)
from tests.oracle.legacy_dataset import generate_legacy_dataset, series_matrix
from tests.oracle.reference_impl import kapra_pipeline


def _to_spark(spark, series):
    rows = [(int(i), [float(v) for v in row]) for i, row in enumerate(series)]
    return spark.createDataFrame(rows, "original_index long, values array<double>")


@pytest.fixture(scope="module")
def golden(spark):
    df = generate_legacy_dataset(300, seed=42)
    series = series_matrix(df).astype(np.float64)
    return series, _to_spark(spark, series)


def _output_table(res):
    iv = [
        F.format_string(
            "[%d-%d]",
            F.col("lower")[i].cast("long"),
            F.col("upper")[i].cast("long"),
        ).alias(f"H{i + 1}")
        for i in range(8)
    ]
    return res.records.select(F.col("group_id").alias("GroupID"), *iv)


def test_cluster_envelope_matches_group_envelope(spark, golden):
    series, sdf = golden
    res = kapra_anonymize(sdf, K=8, P=2, sax_level=8, t=8)
    env = cluster_envelope_data(_output_table(res)).collect()
    assert len(env) == 8
    gid = env[0]["group_id"]
    # reference selection: first GroupID with >= 3 members
    counts = (
        res.records.groupBy("group_id").count().orderBy("group_id").collect()
    )
    want_gid = next(
        (r["group_id"] for r in counts if r["count"] >= 3),
        counts[0]["group_id"],
    )
    assert gid == want_gid
    g = res.groups[gid - 1]  # groups list is GroupID-ordered
    for r in env:
        # int-cast bounds (M7) parsed back exactly (M8)
        assert r["lower"] == float(int(g["lower"][r["t"]]))
        assert r["upper"] == float(int(g["upper"][r["t"]]))
    res.records.unpersist()


def test_metrics_comparison_matches_oracle(spark, golden):
    series, sdf = golden
    rows = metrics_comparison_data(
        spark, sdf, ks=(5, 10), p=2, level=8
    ).collect()
    assert {(r["algorithm"], r["k"]) for r in rows} == {
        ("KAPRA", 5), ("KAPRA", 10), ("Naive", 5), ("Naive", 10)
    }
    for r in rows:
        if r["algorithm"] == "KAPRA":
            o = kapra_pipeline(series, K=r["k"], P=2, sax_level=8)
            assert abs(r["vl"] - o.avg_vl) < 1e-6
            assert abs(r["pl"] - o.avg_pl) < 1e-6


def test_generate_plots_writes_artifacts(spark, golden, tmp_path):
    series, sdf = golden
    res = kapra_anonymize(sdf, K=8, P=2, sax_level=8, t=8)
    arts = generate_plots(spark, sdf, _output_table(res), str(tmp_path))
    assert "metrics_csv" in arts and "envelope_csv" in arts
    import csv

    with open(arts["envelope_csv"]) as f:
        data = list(csv.DictReader(f))
    assert len(data) == 8
    assert all(float(d["upper"]) >= float(d["lower"]) for d in data)
    res.records.unpersist()
