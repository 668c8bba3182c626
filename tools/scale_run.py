"""Large-N scale runs for the two anonymization pipelines (BENCH.md data).

Generates N deterministic 8-point series (every value is a pure function
of (id, position) via xxhash64, so the input is partitioning-independent)
and runs one pipeline end-to-end, printing a one-line JSON summary with
per-phase wall-clock. No testdata or external input.

Usage:
    python tools/scale_run.py naive      --n 1000000  --cpus 16
    python tools/scale_run.py kapra-dist --n 10000000 --cpus 16

`kapra-dist` forces the distributed pattern-space fallback
(max_driver_combos=1) — the path a 100 TB corpus would take — and also
reports the driver-side p-group summary size, the only O(G) state that
ever leaves the executors.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kapra_timeseries_anonymization_spark.session import build_session


def synth_series(spark, n: int, t: int = 8):
    """N series of t ints in [0, 50) (the reference's H-column domain),
    keyed by (id, pos) hash — deterministic under any parallelism."""
    return spark.range(n).select(
        F.col("id").alias("original_index"),
        F.array(
            *[
                F.pmod(F.xxhash64("id", F.lit(i)), F.lit(50))
                .cast("double")
                for i in range(t)
            ]
        ).alias("values"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("pipeline", choices=["naive", "kapra-dist", "kapra"])
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument(
        "--master",
        default=None,
        help="override the master URL, e.g. local-cluster[2,2,8192] for a "
        "real multi-JVM deployment (separate executor block managers)",
    )
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--p", type=int, default=2)
    ap.add_argument("--level", type=int, default=8)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    spark = build_session(
        f"scale-{args.pipeline}",
        master=args.master or f"local[{args.cpus}]",
        extra_conf={
            # No AlwaysPreTouch: pre-touching pins the full -Xmx resident
            # immediately, which starves the Arrow Python workers of host
            # memory at 100M scale (observed: kernel OOM-killed workers
            # under an 88g pre-touched heap).  GCLockerRetryAllocationCount
            # raises JDK-17 G1's default retry bound (2): tasks allocating
            # ~8 MB sort/codec buffers while JNI critical sections hold the
            # GCLocker otherwise die with a spurious "Java heap space"
            # despite free heap (observed at stage 31 of the 100M run).
            "spark.driver.extraJavaOptions": "-XX:+UnlockDiagnosticVMOptions "
            "-XX:GCLockerRetryAllocationCount=128 -Xms"
            + os.environ["SPARK_DRIVER_MEM"],
            # iterative pipelines leave broadcast/checkpoint carcasses that
            # only the GC-driven ContextCleaner reclaims; at 20+ rounds a
            # lazy GC lets them pile onto the live working set
            "spark.cleaner.periodicGC.interval": "30s",
        },
    )
    src = synth_series(spark, args.n).persist()
    src.count()  # input materialized outside the timed region

    out = {"pipeline": args.pipeline, "n": args.n, "cpus": args.cpus}
    t0 = time.perf_counter()
    if args.pipeline == "naive":
        from kapra_timeseries_anonymization_spark.operators.naive import (
            naive_anonymize,
        )

        res = naive_anonymize(src, K=args.k, P=args.p, max_level=10, t=8)
        nrec = res.records.count()
        out.update(records=nrec, groups=res.n_groups,
                   avg_vl=round(res.avg_vl, 4), avg_pl=round(res.avg_pl, 4))
        res.records.unpersist()
    else:
        from kapra_timeseries_anonymization_spark.operators.kapra import (
            kapra_anonymize,
        )

        forced = 1 if args.pipeline == "kapra-dist" else 5_000_000
        res = kapra_anonymize(
            src, K=args.k, P=args.p, sax_level=args.level, t=8,
            max_driver_combos=forced,
        )
        nrec = res.records.count()
        out.update(records=nrec, groups=len(res.groups),
                   suppressed=res.n_suppressed,
                   avg_vl=round(res.avg_vl, 4), avg_pl=round(res.avg_pl, 4))
        res.records.unpersist()
    out["sec"] = round(time.perf_counter() - t0, 1)
    out["series_per_sec"] = round(args.n / out["sec"], 1)
    out["driver_peak_rss_mb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
