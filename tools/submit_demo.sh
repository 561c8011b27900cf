#!/usr/bin/env bash
# Cluster execution path (north_rule): package the engine and run the
# index-build + query job via spark-submit --py-files.  On a real
# cluster only --master/--deploy-mode change.
#
# Demonstrated properties:
#   * imports resolve from the shipped zip on every executor
#   * re-submitting the SAME job resumes: segments already in the
#     manifest ledger are skipped (segments_committed == 0 on rerun)
set -euo pipefail
cd "$(dirname "$0")/.."

INPUT="${1:-.bench_cache/transcripts_v2_300000}"
INDEX_DIR="${2:-/tmp/sonar_submit_idx}"

python tools/make_pyfiles.py

spark-submit \
  --master "local[8]" \
  --conf spark.sql.shuffle.partitions=16 \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.ui.enabled=false \
  --py-files dist/sonar_tantivy_spark.zip \
  tools/submit_job.py "$INPUT" "$INDEX_DIR"
