#!/usr/bin/env bash
# Deployment smoke: the north rule's stated mode is `spark-submit
# --py-files engine.zip` on a multi-executor cluster. This drives the CLI
# through a real spark-submit with the packaged zip (local master here;
# the same invocation works with --master yarn/k8s on a cluster).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP=$(python -c "import sys; sys.path.insert(0,'$REPO'); from parallel_dataflow_spark.pkgzip import build_pkg_zip; print(build_pkg_zip())" | tail -1)
echo "engine zip: $ZIP"

echo "--- dataflow (reaching defs over the reference's gcd.bril) ---"
spark-submit --master "local[4]" --py-files "$ZIP" \
  "$REPO/parallel_dataflow_spark/cli.py" \
  dataflow --pass rd --executor seq --input /root/reference/core/gcd.bril \
  2>/dev/null | head -3

echo "--- query (q6) ---"
spark-submit --master "local[4]" --py-files "$ZIP" \
  "$REPO/parallel_dataflow_spark/cli.py" \
  query --name q6_forecast_revenue --sf-dir /root/testdata/sf0.001 \
  2>/dev/null | head -2

echo "OK"
