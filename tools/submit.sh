#!/usr/bin/env bash
# Package the engine and run the tier pipeline via spark-submit --py-files.
# Usage: tools/submit.sh [--master spark://...] [pipeline args...]
# In the sandbox (no cluster) the default master is local[$SPARK_GRAFT_CPUS].
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="local[${SPARK_GRAFT_CPUS:-32}]"
if [[ "${1:-}" == "--master" ]]; then MASTER="$2"; shift 2; fi

mkdir -p "$REPO/dist"
(cd "$REPO" && rm -f dist/modelardb_dynamic_spark.zip \
  && zip -qr dist/modelardb_dynamic_spark.zip modelardb_dynamic_spark -x '*__pycache__*')

cat > "$REPO/dist/run_pipeline.py" <<'EOF'
from modelardb_dynamic_spark.__main__ import main
import sys
main(sys.argv[1:])
EOF

exec spark-submit \
  --master "$MASTER" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --py-files "$REPO/dist/modelardb_dynamic_spark.zip" \
  "$REPO/dist/run_pipeline.py" "$@"
