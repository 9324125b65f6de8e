"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line on stdout.

Headline workload is the north-rule clips gate (synthetic corpus per
BASELINE.json input_hint, cached as parquet so per-round runs re-measure
Spark, not the Python generator), plus the scan/dedup/similarity/text
operators over the driver's testdata tables.

Scaling evidence (north rule: efficiency ≥ 0.8 from N to 4N executors; no
real cluster in this sandbox): the same gate job runs in two fresh
subprocesses at local[8] and local[32] over the same input; we report
clips/sec at both and efficiency = (thr_32/thr_8)/4.  Timing covers the gate
computation only (JVM/session startup excluded inside the worker).
Results also land in BENCH.md.

Usage:
  python bench.py                 # full bench → one JSON line
  python bench.py --scale-worker N PATH   # internal: gate at local[N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, ".bench_cache")
BENCH_SEED = 42


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def ensure_clips(n: int) -> str:
    """Generate (once) and cache the synthetic clips corpus as parquet."""
    path = os.path.join(CACHE, f"clips_n{n}_s{BENCH_SEED}")
    marker = os.path.join(path, "_SUCCESS_LOCAL")
    if os.path.exists(marker):
        return path
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.session import get_spark
    from data_quality_spark.synth import generate_clips

    log(f"generating {n} clips → {path}")
    pdf = generate_clips(n, seed=BENCH_SEED)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    spark = get_spark("bench-gen")
    df = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
    df.repartition(64).write.mode("overwrite").parquet(path)
    with open(marker, "w") as f:
        f.write("ok")
    return path


def gate_job(spark, input_path: str, warm: bool = True) -> tuple[int, float]:
    """The timed unit: full gate (decode+langid+ppl+heuristics+scrub+decide)
    + salted rollup, ONE pass (row count derived from the rollup partials).
    ``warm=True`` first runs a 64-row slice so Python workers and the
    langid/ppl tables are up — steady-state throughput is the number that
    transfers to long-running cluster jobs; JVM/worker spawn does not.
    Returns (rows, seconds)."""
    from data_quality_spark.operators.gate import salted_gate_aggregate
    from data_quality_spark.pipeline import gate

    src = spark.read.parquet(input_path)
    if warm:
        gate(src.limit(64)).count()
    t0 = time.perf_counter()
    decided = gate(src)
    rollup = salted_gate_aggregate(decided, keys=("lang_pred", "codec"))
    rows = sum(r["n_clips"] for r in rollup.collect())
    return rows, time.perf_counter() - t0


def scale_worker(cpus: int, input_path: str) -> None:
    from data_quality_spark.session import get_spark

    spark = get_spark(f"bench-scale-{cpus}", master=f"local[{cpus}]")
    rows, dt = gate_job(spark, input_path)
    print(json.dumps({"cpus": cpus, "rows": rows, "seconds": dt}))
    spark.stop()


def run_scaling(input_path: str, levels: tuple[int, int] = (8, 32)) -> dict:
    out = {}
    for cpus in levels:
        log(f"scaling run: local[{cpus}]")
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scale-worker",
             str(cpus), input_path],
            capture_output=True, text=True, timeout=900,
        )
        line = proc.stdout.strip().splitlines()[-1]
        out[cpus] = json.loads(line)
    n, m = levels
    thr_n = out[n]["rows"] / out[n]["seconds"]
    thr_m = out[m]["rows"] / out[m]["seconds"]
    ideal = m / n
    return {
        f"local{n}_clips_per_sec": round(thr_n, 1),
        f"local{m}_clips_per_sec": round(thr_m, 1),
        "speedup": round(thr_m / thr_n, 3),
        "ideal_speedup": ideal,
        "efficiency": round((thr_m / thr_n) / ideal, 3),
    }


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--scale-worker":
        scale_worker(int(sys.argv[2]), sys.argv[3])
        return

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    n_clips = int(os.environ.get("BENCH_CLIPS", "20000"))
    do_scaling = os.environ.get("BENCH_SCALING", "1") != "0"

    clips_path = ensure_clips(n_clips)

    import __spark_entry__ as entrymod
    from data_quality_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]")
    timings: dict[str, float] = {}

    # headline: clips gate end-to-end
    rows, dt = gate_job(spark, clips_path)
    timings["clips_gate"] = round(dt, 3)
    clips_per_sec = rows / dt if dt > 0 else 0.0
    log(f"clips_gate: {rows} clips in {dt:.2f}s = {clips_per_sec:.0f} clips/s")

    bench_queries = [
        "scan_nulls", "scan_duplicates", "duplicate_groups", "orphan_scan",
        "completeness", "trend_rollup", "token_stats", "quality_buckets",
        "langid_sql", "fingerprint_dedup", "scrub_audit", "minhash_lsh",
        "simhash_near_dup", "ann_cosine_topk", "ann_lsh_topk",
    ]
    qs = entrymod.queries()
    for name in bench_queries:
        t0 = time.perf_counter()
        n = qs[name](spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)
        log(f"{name}: {n} rows in {timings[name]}s")
    spark.stop()

    scaling = run_scaling(clips_path) if do_scaling else {}

    total = sum(timings.values())
    result = {
        "metric": "end_to_end_bench_seconds (headline: clips-gate throughput)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "clips_per_sec": round(clips_per_sec, 1),
        "n_clips": n_clips,
        "scaling": scaling,
    }
    if scaling:
        with open(os.path.join(REPO, "BENCH.md"), "w") as f:
            f.write(
                "# BENCH — clips-gate throughput & scaling\n\n"
                f"- corpus: {n_clips} synthetic clips (seed {BENCH_SEED}, "
                "BASELINE.json input_hint schema)\n"
                f"- gate throughput at local[{cpus}]: "
                f"**{clips_per_sec:.0f} clips/s** ({timings['clips_gate']}s)\n"
                f"- scaling local[8] → local[32] (N → 4N cores, same input):\n"
                f"  - local[8]:  {scaling['local8_clips_per_sec']} clips/s\n"
                f"  - local[32]: {scaling['local32_clips_per_sec']} clips/s\n"
                f"  - speedup {scaling['speedup']}× of ideal "
                f"{scaling['ideal_speedup']}× → "
                f"**efficiency {scaling['efficiency']}** "
                "(north-rule target ≥ 0.8)\n\n"
                f"Per-query seconds at sf{sf}: "
                + json.dumps(timings)
                + "\n"
            )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
