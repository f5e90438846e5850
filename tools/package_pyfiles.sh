#!/bin/sh
# Build the --py-files zip for cluster submission (north rule: "ships via
# spark-submit --py-files").  Usage:
#   tools/package_pyfiles.sh [out.zip]
#   spark-submit --py-files dist/rex_spark.zip tools/kg_job.py 32 bench /out
set -e
cd "$(dirname "$0")/.."
OUT="${1:-dist/rex_spark.zip}"
export OUT
mkdir -p "$(dirname "$OUT")"
rm -f "$OUT"
python -c "
import os, zipfile
out = os.environ['OUT']
with zipfile.ZipFile(out, 'w', zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk('relationextractionpipeline_spark'):
        if '__pycache__' in root: continue
        for f in files:
            if f.endswith('.py'):
                p = os.path.join(root, f)
                z.write(p, p)
print('wrote', out)
"
