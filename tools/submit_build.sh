#!/bin/bash
# Cluster-style launcher (north_rule: "run via spark-submit --py-files
# on a multi-executor cluster"). Packages the engine as a zip and
# submits the build job; on a real cluster swap --master for
# yarn/k8s and the corpus/index paths for object-store URIs — the job
# script is identical.
#
# Usage: tools/submit_build.sh <corpus.parquet> <index_dir> [cores]
set -euo pipefail
cd "$(dirname "$0")/.."
CORPUS=${1:?corpus path}; INDEX=${2:?index dir}; CORES=${3:-8}

DIST=$(mktemp -d)
trap 'rm -rf "$DIST"' EXIT
(zip -qr "$DIST/engine.zip" search_engine_spark -x '*/__pycache__/*')

spark-submit \
  --master "local[$CORES]" \
  --py-files "$DIST/engine.zip" \
  --conf spark.sql.shuffle.partitions="$CORES" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  tools/submit_job.py "$CORPUS" "$INDEX"
