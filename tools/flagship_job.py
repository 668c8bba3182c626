"""Standalone flagship job for ``spark-submit --py-files`` (north_rule).

Usage (tools/submit_flagship.sh wraps this):

    spark-submit --master local[8] \
        --py-files /tmp/kapra_timeseries_anonymization_spark_pkg.zip \
        tools/flagship_job.py [sf_dir]

The package arrives ONLY via --py-files (this script must not rely on the
repo being on PYTHONPATH) — the same deployment shape as a real cluster.
Runs transcripts -> per-conversation turn-rate series -> KAPRA and prints
a one-line JSON summary.
"""

import json
import sys
import time

from pyspark.sql import SparkSession

# imported from the --py-files zip, not from the repo checkout
from kapra_timeseries_anonymization_spark.operators.kapra import kapra_anonymize
from kapra_timeseries_anonymization_spark.sources.transcripts import (
    conv_turn_rate_series,
    transcripts_from_events,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = SparkSession.builder.appName("kapra-flagship-submit").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    t0 = time.perf_counter()
    t = transcripts_from_events(spark, sf_dir)
    series = conv_turn_rate_series(t, n_buckets=8)
    res = kapra_anonymize(series, K=8, P=2, sax_level=8, t=8)
    n = res.records.count()
    print(
        json.dumps(
            {
                "records": n,
                "groups": len(res.groups),
                "avg_vl": round(res.avg_vl, 4),
                "avg_pl": round(res.avg_pl, 4),
                "sec": round(time.perf_counter() - t0, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
