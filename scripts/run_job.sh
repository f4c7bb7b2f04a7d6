#!/usr/bin/env bash
# Package the engine and run a query via spark-submit --py-files (the
# deployment shape the north rule requires).  Usage:
#   scripts/run_job.sh [--query qNN_name] [--sf-dir /root/testdata/sf0.01] ...
set -euo pipefail
cd "$(dirname "$0")/.."
ZIP=/tmp/osm_engine.zip
rm -f "$ZIP"
python -c "
import shutil, zipfile, os
with zipfile.ZipFile('$ZIP', 'w') as z:
    for root, _, files in os.walk('osm_processing_pipeline_spark'):
        for f in files:
            if f.endswith('.py'):
                p = os.path.join(root, f)
                z.write(p, p)
"
exec spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-32}]" \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_CPUS:-32}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.ui.enabled=false \
  --py-files "$ZIP" \
  osm_processing_pipeline_spark/job.py "$@"
