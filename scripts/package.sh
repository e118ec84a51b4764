#!/usr/bin/env bash
# Build the --py-files zip for spark-submit.
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f table_annotation_spark.zip
zip -qr table_annotation_spark.zip table_annotation_spark -x '*__pycache__*'
echo "built table_annotation_spark.zip"
