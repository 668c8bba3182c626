"""Grid sweep: per-config losses equal the numpy oracle; scoring replays
the reference's min-max normalization; thread-pool == serial results."""

import numpy as np

from kapra_timeseries_anonymization_spark.plans.optimize import (
    run_grid,
    score_results,
)
from tests.oracle.legacy_dataset import generate_legacy_dataset, series_matrix
from tests.oracle.reference_impl import kapra_pipeline


def _series_df(spark, n=256, seed=2):
    df = generate_legacy_dataset(n, seed=seed)
    series = series_matrix(df).astype(np.float64)
    rows = [(int(i), [float(v) for v in row]) for i, row in enumerate(series)]
    return (
        spark.createDataFrame(rows, "original_index long, values array<double>"),
        series,
    )


GRID = [(5, 2, 5), (5, 3, 8), (10, 2, 8), (10, 3, 5)]


def test_grid_matches_oracle_and_parallel_stable(spark):
    sdf, series = _series_df(spark)
    serial = run_grid(sdf, GRID, algo="kapra", parallelism=1)
    pooled = run_grid(sdf, GRID, algo="kapra", parallelism=4)
    for r_s, r_p in zip(serial, pooled):
        assert (r_s.k, r_s.p, r_s.level, r_s.vl, r_s.pl) == (
            r_p.k, r_p.p, r_p.level, r_p.vl, r_p.pl,
        )
    for r in serial:
        oracle = kapra_pipeline(series, K=r.k, P=r.p, sax_level=r.level)
        assert abs(r.vl - np.mean(oracle.group_vl)) < 1e-5
        want_pl = float(np.sum(oracle.pl) / len(oracle.pl))
        assert abs(r.pl - want_pl) < 1e-5


def test_scoring_minmax(spark):
    sdf, _ = _series_df(spark, n=128, seed=3)
    results = run_grid(sdf, GRID, algo="kapra", parallelism=2)
    top = score_results(results, top=2)
    assert len(top) == 2
    assert top[0]["score"] <= top[1]["score"]
    # best score must be the config minimizing normalized vl+pl
    vls = [r.vl for r in results]
    pls = [r.pl for r in results]

    def score(r):
        nv = 0 if max(vls) == min(vls) else (r.vl - min(vls)) / (max(vls) - min(vls))
        np_ = 0 if max(pls) == min(pls) else (r.pl - min(pls)) / (max(pls) - min(pls))
        return nv + np_

    assert abs(top[0]["score"] - min(score(r) for r in results)) < 1e-6
