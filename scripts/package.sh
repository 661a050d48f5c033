#!/bin/sh
# Build engine.zip for `spark-submit --py-files engine.zip` (BASELINE.json:14).
set -e
cd "$(dirname "$0")/.."
rm -f engine.zip
zip -qr engine.zip opentsdb_rollup_rust_spark -x '*__pycache__*'
echo "wrote $(pwd)/engine.zip"
