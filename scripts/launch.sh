#!/usr/bin/env bash
# Package the engine and launch the rollup job via spark-submit --py-files.
#
# Usage: scripts/launch.sh <input tokens table> <output dir> [extra spark-submit args...]
# Example (local):  scripts/launch.sh data/tokens_sf0.1_20000 /tmp/rollup_out --master 'local[32]'
# Example (cluster): scripts/launch.sh iceberg:prod.tokens s3://bucket/rollup \
#                      --master yarn --num-executors 1000 --executor-cores 4
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
INPUT="$1"; OUTPUT="$2"; shift 2

ZIP="$REPO/dist/matrixprofiler_spark.zip"
mkdir -p "$REPO/dist"
(cd "$REPO" && rm -f "$ZIP" && zip -qr "$ZIP" matrixprofiler_spark tests/fixtures/goldens.json -x '*__pycache__*')

exec spark-submit \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.files.maxPartitionBytes=32m \
  "$@" \
  "$REPO/scripts/run_rollup.py" --input "$INPUT" --output "$OUTPUT"
