#!/usr/bin/env bash
# Package the engine and run a job via spark-submit --py-files (the
# deployment shape the north rule names). Usage:
#   tools/submit.sh [job.py] [spark-submit args...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP=/tmp/osprey_spark_pkg.zip
JOB="${1:-$REPO/tools/jobs/rule_eval_job.py}"
shift || true
(cd "$REPO" && rm -f "$ZIP" && zip -qr "$ZIP" osprey_spark -x '*__pycache__*')
exec spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-32}]" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --py-files "$ZIP" \
  "$JOB" "$@"
