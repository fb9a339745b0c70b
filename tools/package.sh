#!/usr/bin/env bash
# Build the --py-files zip for spark-submit (north rule packaging).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/omnition_spark.zip
python - <<'EOF'
import os
import zipfile

with zipfile.ZipFile("dist/omnition_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in os.walk("omnition_opentelemetry_service_spark"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/omnition_spark.zip")
EOF
