#!/usr/bin/env bash
# Build the --py-files artifact for spark-submit (north rule launch shape).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/fusus_spark.zip
# Zip the package only (no tests, no caches).
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/fusus_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in os.walk("fusus_spark"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in sorted(files):
            if f.endswith(".py"):
                z.write(os.path.join(root, f))
print("wrote dist/fusus_spark.zip")
EOF
