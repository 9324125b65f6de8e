#!/usr/bin/env bash
# Prove the spark-submit --py-files launch path end-to-end (sandbox analog of
# the multi-executor cluster launch in BASELINE.json's north rule).
set -euo pipefail
cd "$(dirname "$0")/.."

BRONZE="${1:-/tmp/dq_submit_bronze}"
OUTPUT="${2:-/tmp/dq_submit_out}"
N_CLIPS="${N_CLIPS:-5000}"

if [ ! -d "$BRONZE" ]; then
  python - <<EOF
from data_quality_spark.session import get_spark
from data_quality_spark.runner import write_clips
from data_quality_spark.synth import generate_clips
spark = get_spark("submit-demo-gen", master="local[8]")
write_clips(spark, generate_clips($N_CLIPS, seed=7), "$BRONZE")
spark.stop()
EOF
fi

rm -rf "$OUTPUT" dq.zip
zip -qr dq.zip data_quality_spark

spark-submit \
  --master "local[8]" \
  --py-files dq.zip \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=2048 \
  --conf spark.sql.shuffle.partitions=8 \
  --conf spark.ui.enabled=false \
  scripts/submit_gate.py --input "$BRONZE" --output "$OUTPUT"
