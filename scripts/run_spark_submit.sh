#!/usr/bin/env bash
# Package the library and run the extraction job exactly as a cluster
# submission would (north rule: spark-submit --py-files). Local master by
# default; on a real cluster replace --master/--num-executors accordingly.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${MASTER:-local[8]}"
OUT="${1:?usage: run_spark_submit.sh <output-dir> [n_synthetic_docs]}"
NDOCS="${2:-2000}"

PKG_ZIP="$(mktemp -d)/attp_spark_pkg.zip"
(cd "$REPO" && python - "$PKG_ZIP" <<'EOF'
import sys, zipfile, pathlib
zip_path = sys.argv[1]
root = pathlib.Path("amazon_textract_transformer_pipeline_spark")
with zipfile.ZipFile(zip_path, "w") as z:
    for p in sorted(root.rglob("*.py")):
        z.write(p, p.as_posix())
print(f"packaged {zip_path}")
EOF
)

exec spark-submit \
  --master "$MASTER" \
  --conf spark.sql.shuffle.partitions=16 \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.ui.enabled=false \
  --py-files "$PKG_ZIP" \
  "$REPO/scripts/extract_job.py" \
  --synthetic "$NDOCS" --output "$OUT"
