#!/usr/bin/env bash
# Package the engine and run it via spark-submit --py-files (north_rule
# shipping shape). Extra args are forwarded to the job (see
# tesserocr_spark/__main__.py). MASTER defaults to local[32].
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${MASTER:-local[32]}"
ZIP="$(mktemp -d)/tesserocr_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" tesserocr_spark -x '*__pycache__*')
exec spark-submit \
  --master "$MASTER" \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-32}" \
  --conf spark.driver.memory="${DRIVER_MEM:-24g}" \
  --py-files "$ZIP" \
  "$REPO/tesserocr_spark/__main__.py" "$@"
