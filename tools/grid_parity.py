"""Full 96-config KAPRA grid sweep vs the reference's committed results.

Runs the engine's `run_grid` over the reference grid (K in {5,10,20,50} x
P in {2,3,5,8} x L in {3,5,8,10,15,20}, src/optimize_kapra.py:11-15) on
the byte-identical regenerated golden dataset (seed 42, 3000 rows) and
compares each VL/PL pair against docs/data/kapra_optimization_results.csv.
Writes GRID_PARITY.md at the repo root.

Also sweeps the naive grid on a 12-config subset against the validated
in-repo numpy oracle (the committed naive CSV is stale — see
tests/test_grid_parity.py docstring).

Usage: python tools/grid_parity.py
"""

from __future__ import annotations

import csv
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF_CSV = "/root/reference/docs/data/kapra_optimization_results.csv"
ATOL = 1e-6


def main() -> None:
    from kapra_timeseries_anonymization_spark.plans.optimize import run_grid
    from kapra_timeseries_anonymization_spark.session import build_session
    from tests.oracle.legacy_dataset import generate_legacy_dataset, series_matrix
    from tests.oracle.reference_impl import naive_pipeline

    spark = build_session("grid-parity")
    df = generate_legacy_dataset(3000, seed=42)
    series = series_matrix(df)
    sdf = spark.createDataFrame(
        [(int(i), [float(v) for v in row]) for i, row in enumerate(series)],
        "original_index long, values array<double>",
    )

    ref = {}
    with open(REF_CSV) as f:
        for row in csv.DictReader(f):
            key = (int(row["K"]), int(row["P"]), int(row["SAX_LEVEL"]))
            ref[key] = (float(row["VL"]), float(row["PL"]), float(row["Time"]))

    configs = sorted(ref)
    t0 = time.perf_counter()
    results = run_grid(sdf, configs, algo="kapra", t=8, parallelism=8)
    kapra_wall = time.perf_counter() - t0

    lines = [
        "# GRID_PARITY — engine grid sweep vs reference published results",
        "",
        f"KAPRA: all {len(configs)} reference configs "
        "(src/optimize_kapra.py:11-15) on the byte-identical regenerated",
        "golden dataset; engine VL/PL vs "
        "docs/data/kapra_optimization_results.csv "
        f"(atol {ATOL}; CSV verified byte-reproducible by the current",
        "reference code in-sandbox).",
        "",
        "| K | P | L | ref VL | engine VL | ref PL | engine PL | match |",
        "|---|---|---|---|---|---|---|---|",
    ]
    n_bad = 0
    for r in results:
        want_vl, want_pl, _ = ref[(r.k, r.p, r.level)]
        ok = abs(r.vl - want_vl) < ATOL and abs(r.pl - want_pl) < ATOL
        n_bad += 0 if ok else 1
        lines.append(
            f"| {r.k} | {r.p} | {r.level} | {want_vl:.6f} | {r.vl:.6f} "
            f"| {want_pl:.6f} | {r.pl:.6f} | {'OK' if ok else 'MISMATCH'} |"
        )
    ref_wall = sum(v[2] for v in ref.values())
    lines += [
        "",
        f"**KAPRA: {len(configs) - n_bad}/{len(configs)} configs match at "
        f"atol {ATOL}.** Engine sweep wall-clock {kapra_wall:.1f}s at "
        f"parallelism 8 on 3k rows (reference serial sweep: "
        f"{ref_wall:.1f}s single-core; Spark per-job overhead dominates at "
        "this size — the sweep exists for parity evidence, not speed).",
        "",
        "## Naive grid (vs in-repo validated oracle; committed CSV stale)",
        "",
        "| K | P | L | oracle VL | engine VL | oracle PL | engine PL | match |",
        "|---|---|---|---|---|---|---|---|",
    ]

    naive_cfgs = [
        (k, p, lv) for k in (5, 10, 20) for p in (2, 5) for lv in (5, 10)
    ]
    t0 = time.perf_counter()
    nresults = run_grid(sdf, naive_cfgs, algo="naive", t=8, parallelism=4)
    naive_wall = time.perf_counter() - t0
    n_nbad = 0
    for r in nresults:
        o = naive_pipeline(
            series.astype(np.int64), K=r.k, P=r.p, max_level=r.level
        )
        ok = abs(r.vl - o.avg_vl) < ATOL and abs(r.pl - o.avg_pl) < ATOL
        n_nbad += 0 if ok else 1
        lines.append(
            f"| {r.k} | {r.p} | {r.level} | {o.avg_vl:.6f} | {r.vl:.6f} "
            f"| {o.avg_pl:.6f} | {r.pl:.6f} | {'OK' if ok else 'MISMATCH'} |"
        )
    lines += [
        "",
        f"**Naive: {len(naive_cfgs) - n_nbad}/{len(naive_cfgs)} configs "
        f"match at atol {ATOL}** ({naive_wall:.1f}s sweep).",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "GRID_PARITY.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: kapra {len(configs)-n_bad}/{len(configs)}, "
          f"naive {len(naive_cfgs)-n_nbad}/{len(naive_cfgs)}")
    if n_bad or n_nbad:
        sys.exit(1)


if __name__ == "__main__":
    main()
