#!/usr/bin/env bash
# Reference spark-submit invocation (local smoke by default; override MASTER
# and the executor flags for a real cluster).
set -euo pipefail
cd "$(dirname "$0")/.."
./scripts/package_pyfiles.sh
MASTER="${MASTER:-local[8]}"
OUT="${OUT:-/tmp/spatial_submit_out}"
exec spark-submit \
  --master "$MASTER" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-8}" \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.ui.enabled=false \
  --py-files dist/spatial.zip \
  jobs/run_pipeline.py \
  --pages "${PAGES:-synth:20000}" \
  --regions "${REGIONS:-synth}" \
  --out "$OUT" \
  --batches "${BATCHES:-4}" \
  "$@"
