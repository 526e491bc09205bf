#!/bin/sh
# Build dist/textcleaning_spark.zip for spark-submit --py-files.
# Pure-Python package, no binary deps: one zip ships the whole engine.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/textcleaning_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/textcleaning_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("textcleaning_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/textcleaning_spark.zip")
EOF
