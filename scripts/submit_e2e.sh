#!/usr/bin/env bash
# End-to-end deployment-shape check (north_rule: spark-submit
# --py-files on a packaged zip): runs both jobs against the sf0.001
# fixtures and prints their one-line JSON metrics.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="$(mktemp -d /tmp/submit_e2e.XXXX)"
trap 'rm -rf "$WORK"' EXIT
cd "$REPO"
zip -qr "$WORK/algebird_spark.zip" algebird_spark -x "*.pyc" -x "*__pycache__*"
cd "$WORK"
SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.001}"
spark-submit --master "local[8]" --driver-memory 8g \
    --py-files algebird_spark.zip \
    "$REPO/algebird_spark/jobs/build_sketches.py" \
    --input "$SF/documents.parquet" --value-col n_chars --keys source \
    --sketches hll,cms,kll --output "$WORK/sk" 2>&1 \
  | grep -E '^\{"groups"'
spark-submit --master "local[8]" --driver-memory 8g \
    --py-files algebird_spark.zip \
    "$REPO/algebird_spark/jobs/dedup_corpus.py" \
    --input "$SF/documents.parquet" --output "$WORK/dedup" \
    --min-chars 1 2>&1 \
  | grep -E '^\{"n_input"'
