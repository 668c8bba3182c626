"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line with per-query seconds and
the headline rolled-up-points/sec metric.

Extra modes (not used by the driver):
  --scaling   run the flagship at local[8] and local[32] and report
              throughput at both + scaling efficiency (BASELINE.json rule).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kapra_timeseries_anonymization_spark.queries import REGISTRY
from kapra_timeseries_anonymization_spark.session import build_session

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_segment_revenue",
    "q_top10_orders",
    "events_rollup_1m",
    "events_rollup_1h_cascade",
    "events_rollup_1d_cascade",
    "events_gapfill_hourly",
    "events_latency_stats",
    "events_activity_envelope",
    "doc_dedup_exact",
    "doc_token_stats",
    "emb_cosine_topk",
    "transcripts_turn_rate_1m",
    "transcripts_latency",
    "kapra_transcripts",
    "kapra_user_activity",
]


def run_once(spark, sf_dir: str, names) -> dict[str, float]:
    times: dict[str, float] = {}
    for name in names:
        fn, _ = REGISTRY[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        times[name] = round(time.perf_counter() - t0, 3)
        times[f"_rows_{name}"] = n
    return times


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    if "--scaling" in sys.argv:
        out = {}
        for n in (8, 32):
            spark = build_session(f"bench-scaling-{n}", master=f"local[{n}]")
            run_once(spark, sf_dir, ["kapra_transcripts"])  # warm
            t0 = time.perf_counter()
            times = run_once(spark, sf_dir, ["kapra_transcripts"])
            rows = times["_rows_kapra_transcripts"]
            dt = times["kapra_transcripts"]
            out[f"local[{n}]"] = {"sec": dt, "rows": rows,
                                  "series_per_sec": round(rows / dt, 1)}
            spark.stop()
        eff = (out["local[32]"]["series_per_sec"]
               / out["local[8]"]["series_per_sec"]) / 4.0
        out["scaling_efficiency"] = round(eff, 3)
        print(json.dumps(out))
        return

    spark = build_session("bench", master=f"local[{cpus}]")
    t_all0 = time.perf_counter()
    times = run_once(spark, sf_dir, BENCH_QUERIES)
    total = round(time.perf_counter() - t_all0, 3)
    queries = {k: v for k, v in times.items() if not k.startswith("_rows_")}
    # headline: rolled-up points/sec over the three retention tiers
    tier_rows = sum(
        times.get(f"_rows_{q}", 0)
        for q in ("events_rollup_1m", "events_rollup_1h_cascade",
                  "events_rollup_1d_cascade")
    )
    tier_sec = sum(
        queries[q]
        for q in ("events_rollup_1m", "events_rollup_1h_cascade",
                  "events_rollup_1d_cascade")
    )
    print(
        json.dumps(
            {
                "metric": "rolled-up points/sec (retention tiers 1m/1h/1d)",
                "value": round(tier_rows / max(tier_sec, 1e-9), 1),
                "unit": "points/sec",
                "total_sec": total,
                "queries": queries,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
