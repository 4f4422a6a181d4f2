#!/usr/bin/env bash
# Package the engine and launch the flagship via spark-submit --py-files,
# the deployment shape the north rule names (multi-executor clusters get
# the same zip; local[N] here because the sandbox has one box).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${1:-local[4]}"
ZIP="$(mktemp -d)/coastsat_spark.zip"
(cd "$REPO" && python -c "
import shutil, zipfile, os
zf = zipfile.ZipFile('$ZIP', 'w', zipfile.ZIP_DEFLATED)
for root, _, files in os.walk('coastsat_spark'):
    if '__pycache__' in root: continue
    for f in files:
        if f.endswith('.py'):
            p = os.path.join(root, f)
            zf.write(p, p)
zf.close()
print('packaged', '$ZIP')
")
exec spark-submit --master "$MASTER" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.shuffle.partitions=8 \
  --py-files "$ZIP" \
  "$REPO/tools/submit_smoke.py"
