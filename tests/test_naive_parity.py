"""Exactness gate for the naive top-down pipeline vs the validated oracle:
Mondrian group assignments, leaf patterns/levels, envelopes, row order, and
loss metrics."""

import math

import numpy as np
import pytest

from kapra_timeseries_anonymization_spark.operators.naive import (
    mondrian_partition,
    naive_anonymize,
)
from tests.oracle.legacy_dataset import generate_legacy_dataset, series_matrix
from tests.oracle.reference_impl import _mondrian, naive_pipeline


def _to_spark(spark, series):
    rows = [(int(i), [float(v) for v in row]) for i, row in enumerate(series)]
    return spark.createDataFrame(rows, "original_index long, values array<double>")


CONFIGS = [
    (600, 42, 8, 2, 10),
    (256, 2, 5, 3, 8),
    (120, 1, 10, 2, 5),
]


@pytest.mark.parametrize("n_rows,seed,K,P,max_level", CONFIGS)
def test_mondrian_matches_oracle(spark, n_rows, seed, K, P, max_level):
    df = generate_legacy_dataset(n_rows, seed=seed)
    series = series_matrix(df)
    parts_oracle = _mondrian(series, list(range(n_rows)), K)
    got = mondrian_partition(_to_spark(spark, series.astype(float)), k=K, t=8)
    rows = got.select("original_index", "group_id", "pos").collect()
    by_gid: dict[int, list] = {}
    for r in rows:
        by_gid.setdefault(r["group_id"], []).append((r["pos"], r["original_index"]))
    assert len(by_gid) == len(parts_oracle)
    for gid, members in enumerate(parts_oracle, start=1):
        got_members = [i for _, i in sorted(by_gid[gid])]
        assert got_members == members, f"group {gid} mismatch"


@pytest.mark.parametrize("n_rows,seed,K,P,max_level", CONFIGS)
def test_naive_spark_matches_oracle(spark, n_rows, seed, K, P, max_level):
    df = generate_legacy_dataset(n_rows, seed=seed)
    series = series_matrix(df)
    oracle = naive_pipeline(series.astype(np.int64), K=K, P=P, max_level=max_level)
    got = naive_anonymize(
        _to_spark(spark, series.astype(float)), K=K, P=P, max_level=max_level, t=8
    )
    rows = got.records.orderBy("group_id", "leaf_seq", "row_ord").collect()
    assert [r["original_index"] for r in rows] == oracle.record_index
    assert [r["group_id"] for r in rows] == oracle.group_id
    assert [r["pattern"] for r in rows] == oracle.pattern
    assert [r["level"] for r in rows] == oracle.level
    for r, lo, hi, vl, pl_ok in zip(
        rows, oracle.leaf_lower, oracle.leaf_upper, oracle.leaf_vl,
        range(len(rows)),
    ):
        np.testing.assert_array_equal(np.array(r["lower"]), lo)
        np.testing.assert_array_equal(np.array(r["upper"]), hi)
        assert r["vl"] == vl
    assert abs(got.avg_vl - oracle.avg_vl) < 1e-9
    assert abs(got.avg_pl - oracle.avg_pl) < 1e-9
    assert got.n_groups == max(oracle.group_id)


def test_naive_3000_defaults_matches_reference_metrics(spark):
    """Reference defaults on the golden-equivalent dataset: 256 k-groups,
    VL 3.3178, PL 0.2920 (SURVEY §4.3 sandbox-verified run)."""
    df = generate_legacy_dataset(3000, seed=42)
    series = series_matrix(df)
    got = naive_anonymize(
        _to_spark(spark, series.astype(float)), K=8, P=2, max_level=10, t=8
    )
    assert got.n_groups == 256
    assert math.isclose(got.avg_vl, 3.3178, abs_tol=5e-4)
    assert math.isclose(got.avg_pl, 0.2920, abs_tol=5e-4)


@pytest.mark.parametrize(
    "threshold,rank_rows",
    [
        (0, 0),        # pure distributed loop, plain-window splits
        (0, 1),        # pure distributed loop, every split two-stage rank
        (64, 64),      # mixed: rank head, window middle, in-task finish
        (100000, 0),   # all-local: switch on round 1
    ],
)
def test_mondrian_local_finish_equals_distributed(spark, threshold, rank_rows):
    """r05 switches: local-finish (local_threshold) and head-parallel
    split (rank_head_rows) in every combination that selects a distinct
    code path must produce IDENTICAL (group_id, member-order) partitions
    — all compared to the numpy oracle so a shared bug can't
    self-confirm."""
    n_rows, seed, K = 600, 7, 8
    df = generate_legacy_dataset(n_rows, seed=seed)
    series = series_matrix(df)
    parts_oracle = _mondrian(series, list(range(n_rows)), K)
    got = mondrian_partition(
        _to_spark(spark, series.astype(float)), k=K, t=8,
        local_threshold=threshold, rank_head_rows=rank_rows,
    )
    rows = got.select("original_index", "group_id", "pos").collect()
    by_gid: dict[int, list] = {}
    for r in rows:
        by_gid.setdefault(r["group_id"], []).append(
            (r["pos"], r["original_index"]))
    assert len(by_gid) == len(parts_oracle)
    for gid, members in enumerate(parts_oracle, start=1):
        got_members = [i for _, i in sorted(by_gid[gid])]
        assert got_members == members, (
            f"group {gid} mismatch (thr={threshold}, rr={rank_rows})")
