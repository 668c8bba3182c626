#!/usr/bin/env bash
# Ship-and-run the flagship exactly as on a cluster: package zip via
# --py-files, job script with no repo PYTHONPATH (north_rule deployment).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP=/tmp/kapra_pyfiles.zip
MASTER="${1:-local[8]}"
SF_DIR="${2:-/root/testdata/sf0.001}"

rm -f "$ZIP"
(cd "$REPO" && zip -qr "$ZIP" kapra_timeseries_anonymization_spark \
    -x '*__pycache__*')

# run from /tmp so the repo checkout is NOT importable — imports must come
# from the shipped zip
cd /tmp
exec /opt/spark/bin/spark-submit \
    --master "$MASTER" \
    --conf spark.sql.shuffle.partitions=8 \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.sql.execution.arrow.pyspark.enabled=true \
    --conf spark.executorEnv.OMP_NUM_THREADS=1 \
    --conf spark.executorEnv.OPENBLAS_NUM_THREADS=1 \
    --py-files "$ZIP" \
    "$REPO/tools/flagship_job.py" "$SF_DIR"
