#!/usr/bin/env bash
# Package the engine and launch the pipeline via spark-submit --py-files.
# Extra args are forwarded to jobs/run_pipeline.py.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="$(mktemp -d)/osm_addr_bot_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" osm_addr_bot_spark -x '*__pycache__*')

MASTER="${SPARK_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}"

SPARK_SUBMIT_MODE=1 spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_CPUS:-32}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  "$REPO/jobs/run_pipeline.py" "$@"
