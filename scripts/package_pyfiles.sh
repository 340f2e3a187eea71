#!/usr/bin/env bash
# Build dist/spatial.zip for spark-submit --py-files.
# Zip root contains the spatial/ package so executors can `import spatial`.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/spatial.zip
# -x: never ship caches; the zip is pure source, importable on any executor
zip -qr dist/spatial.zip spatial -x '*__pycache__*' -x '*.pyc'
echo "dist/spatial.zip: $(unzip -l dist/spatial.zip | tail -1 | awk '{print $2}') files"
