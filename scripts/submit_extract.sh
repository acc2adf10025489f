#!/usr/bin/env bash
# Package the engine and run the extraction job via spark-submit
# --py-files — the north rule's deployment path. On a real cluster swap
# --master local[8] for the cluster master URL; nothing else changes.
#
# Usage: scripts/submit_extract.sh <pages.parquet> <out_dir> [master]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
PAGES="$1"; OUT="$2"; MASTER="${3:-local[8]}"

ZIP="$(mktemp -d)/ocr_spark.zip"
(cd "$REPO" && python -c "
import zipfile, pathlib
z = zipfile.ZipFile('$ZIP', 'w')
for p in sorted(pathlib.Path('ocr_spark').rglob('*.py')):
    z.write(p, str(p))
z.close()
print('packaged', '$ZIP')
")

spark-submit --master "$MASTER" \
  --py-files "$ZIP" \
  "$REPO/scripts/extract_main.py" --pages "$PAGES" --out "$OUT"
