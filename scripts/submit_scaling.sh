#!/usr/bin/env bash
# The north rule's scaling criterion on the LITERAL launch path: the same
# `spark-submit --py-files dq.zip scripts/submit_gate.py` job at two
# parallelism levels (local[8] = N, local[32] = 4N — this sandbox's stand-in
# for N and 4N executors) over the SAME bronze input, reporting throughput at
# both plus the efficiency between them.  Writes one JSON line and
# .bench_cache/submit_scaling.json.
set -euo pipefail
cd "$(dirname "$0")/.."

BRONZE="${1:-/tmp/dq_submit_scale_bronze}"
N_CLIPS="${N_CLIPS:-200000}"
LEVELS="${LEVELS:-8 32}"

if [ ! -d "$BRONZE" ]; then
  SPARK_GRAFT_DRIVER_MEM=24g python - <<EOF
from data_quality_spark.session import get_spark
from data_quality_spark.synth import generate_clips_distributed
spark = get_spark("submit-scale-gen", master="local[16]")
# distributed generation (a pandas frame of $N_CLIPS audio payloads
# OOMs the driver), then >=16 files per ingest_day so every tested
# parallelism level has multiple tasks per slot (a 25-split input made
# local[32] LOSE to local[8] in the first capture — starvation, not
# the engine)
df = generate_clips_distributed(spark, $N_CLIPS, seed=7, partitions=128)
df.repartition(16, "clip_id").write.mode("overwrite").option(
    "compression", "none").partitionBy("ingest_day").parquet("$BRONZE")
spark.stop()
EOF
fi

rm -f dq.zip
zip -qr dq.zip data_quality_spark

RESULTS=""
for CORES in $LEVELS; do
  OUT="/tmp/dq_submit_scale_out_$CORES"
  rm -rf "$OUT"
  T0=$(python -c 'import time; print(time.perf_counter())')
  spark-submit \
    --master "local[$CORES]" \
    --py-files dq.zip \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.sql.execution.arrow.pyspark.enabled=true \
    --conf spark.sql.execution.arrow.maxRecordsPerBatch=2048 \
    --conf spark.sql.shuffle.partitions="$CORES" \
    --conf spark.driver.memory=24g \
    --conf spark.ui.enabled=false \
    scripts/submit_gate.py --input "$BRONZE" --output "$OUT" --no-resume \
    > "/tmp/dq_submit_scale_$CORES.json" 2>/dev/null
  T1=$(python -c 'import time; print(time.perf_counter())')
  RESULTS="$RESULTS $CORES:$T0:$T1"
done

python - "$N_CLIPS" $RESULTS <<'EOF'
import json, os, sys
n = int(sys.argv[1])
rows = {}
for spec in sys.argv[2:]:
    cores, t0, t1 = spec.split(":")
    wall = float(t1) - float(t0)
    with open(f"/tmp/dq_submit_scale_{cores}.json") as fh:
        res = json.loads(fh.read().strip().splitlines()[-1])
    rows[cores] = {
        "wall_seconds_incl_jvm_startup": round(wall, 1),
        "gate_seconds": round(res["wall_s"], 2) if res.get("wall_s")
        else None,
        "clips_per_sec": round(res["clips_per_sec"], 1)
        if res.get("clips_per_sec") else None,
        "completed": res.get("completed"),
        "days": res.get("days"),
    }
levels = sorted(rows, key=int)
lo, hi = rows[levels[0]], rows[levels[-1]]
out = {
    "launch_path": "spark-submit --py-files dq.zip scripts/submit_gate.py",
    "n_clips": n,
    "levels": rows,
    "speedup": round(lo["gate_seconds"] / hi["gate_seconds"], 3)
    if lo.get("gate_seconds") and hi.get("gate_seconds") else None,
    "ideal_speedup": int(levels[-1]) / int(levels[0]),
    "loadavg_1m": round(os.getloadavg()[0], 2),
}
if out["speedup"]:
    out["efficiency"] = round(out["speedup"] / out["ideal_speedup"], 3)
print(json.dumps(out))
os.makedirs(".bench_cache", exist_ok=True)
with open(".bench_cache/submit_scaling.json", "w") as fh:
    json.dump(out, fh, indent=1)
EOF
