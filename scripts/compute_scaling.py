"""Compute-bound scaling evidence: the SR-normalization job on the N -> 4N
axes.

Every scaling capture so far ran the clips GATE, whose fused kernels move
~85 KB of payload per ~100 us of math — low arithmetic intensity, so on
this single-socket 32-core host the job hits the DRAM ceiling (~38-48k
clips/s) by 8 processes and N->4N efficiency cannot reach 0.8 no matter
what the engine does (see BENCH.md "Quiet-window captures" and the
no-Spark control that saturates at the same ceiling).

This script runs the complementary measurement the ceiling diagnosis
predicts: the polyphase RESAMPLE job (`resample_stats`, ~1.5 ms of FIR
math per 85 KB clip, ~15x the gate's arithmetic intensity, tiny output
relation so no payload writeback).  If the engine itself scaled poorly,
this job would scale poorly too; if only the DRAM ceiling is at fault,
this job should scale near-linearly on the same axes where the gate
flatlines.

Axes match the gate captures:
  - literal  : taskset 0-7 local[8]  ->  taskset 0-31 local[32]
  - resourced: taskset 0-7 local[4]  ->  taskset 0-31 local[16]
    (pin = 2x slots; one "executor" = JVM arrow writer + python worker)

Writes `.bench_cache/scaling_compute.json`; bench.py folds it into the
BENCH_r{N}.json scaling block as `scaling.compute_bound`.

Usage:
  python scripts/compute_scaling.py [--clips 100000] [--passes 2]
  python scripts/compute_scaling.py --worker SLOTS INPUT PASSES   (internal)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(slots: int, input_path: str, passes: int) -> None:
    """One fresh-process resample_stats run at local[slots]; min of
    `passes` timed passes after a warm-up (page cache + codegen)."""
    from pyspark.sql import functions as F

    from data_quality_spark.operators.audio_resample import resample_stats
    from data_quality_spark.session import get_spark

    # small parquet reader batches (~20 MB of payload per Arrow socket
    # read instead of ~170 MB) + lenient heartbeats: this shared-tenant
    # kernel soft-locks CPUs for 25+ s inside tcp_recvmsg on very large
    # socket copies (observed via dmesg watchdog), which otherwise kills
    # the executor mid-capture
    spark = get_spark(
        f"compute-scale-{slots}",
        master=f"local[{slots}]",
        extra_confs={
            "spark.sql.parquet.columnarReaderBatchSize": "256",
            "spark.sql.execution.arrow.maxRecordsPerBatch": "256",
            "spark.network.timeout": "300s",
            "spark.executor.heartbeatInterval": "60s",
        },
    )
    clips = spark.read.parquet(input_path)

    def one_pass() -> tuple[int, float]:
        t0 = time.perf_counter()
        row = resample_stats(clips).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("ok").cast("long")).alias("ok"),
        ).collect()[0]
        return int(row["n"]), time.perf_counter() - t0

    rows, best = one_pass()  # warm-up counts as pass 1
    print(f"[worker {slots}] pass0 {best:.1f}s", file=sys.stderr)
    for k in range(max(passes - 1, 0)):
        _, dt = one_pass()
        print(f"[worker {slots}] pass{k + 1} {dt:.1f}s", file=sys.stderr)
        best = min(best, dt)
    print(json.dumps({"slots": slots, "rows": rows, "seconds": best}))
    spark.stop()


def run_axis(input_path: str, pins: tuple[int, int], slots: tuple[int, int],
             passes: int) -> dict:
    out, loadavgs = {}, {}
    for pin, slot in zip(pins, slots):
        # settle: don't enter a level under the previous level's decaying
        # self-load (1-min loadavg lags ~1 min behind actual idleness)
        t_settle = time.time()
        while os.getloadavg()[0] >= 2.0 and time.time() - t_settle < 180:
            time.sleep(5)
        loadavgs[str(pin)] = round(os.getloadavg()[0], 2)
        print(f"[compute-scaling] {pin} cores / local[{slot}] "
              f"(loadavg {loadavgs[str(pin)]})", file=sys.stderr)
        cmd = [sys.executable, os.path.abspath(__file__), "--worker",
               str(slot), input_path, str(passes)]
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{pin - 1}"] + cmd
        last_err = ""
        for attempt in range(2):  # one retry: shared-host JVMs die rarely
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=1800)
            lines = proc.stdout.strip().splitlines()
            if lines:
                out[pin] = json.loads(lines[-1])
                break
            last_err = proc.stderr[-3000:]
            print(f"[compute-scaling] worker rc={proc.returncode}, "
                  f"retrying ({attempt})", file=sys.stderr)
        else:
            raise RuntimeError(
                f"worker produced no output twice; stderr tail: {last_err}")
    n, m = pins
    thr_n = out[n]["rows"] / out[n]["seconds"]
    thr_m = out[m]["rows"] / out[m]["seconds"]
    ideal = m / n
    return {
        f"cores{n}_clips_per_sec": round(thr_n, 1),
        f"cores{m}_clips_per_sec": round(thr_m, 1),
        "slots": list(slots),
        "speedup": round(thr_m / thr_n, 3),
        "ideal_speedup": ideal,
        "efficiency": round((thr_m / thr_n) / ideal, 3),
        "loadavg_per_level": loadavgs,
    }


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3], int(sys.argv[4]))
        return

    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=100_000)
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--axis", choices=["resourced", "literal", "both"],
                    default="both")
    args = ap.parse_args()

    import bench

    clips = bench.ensure_clips(args.clips)
    result = {
        "job": "resample_stats (polyphase FIR, ~15x gate arithmetic "
               "intensity, no payload writeback)",
        "n_clips": args.clips,
        "started_loadavg_1m": round(os.getloadavg()[0], 2),
        "axes": {},
    }
    out_path = os.path.join(REPO, ".bench_cache", "scaling_compute.json")
    if os.path.exists(out_path):  # merge into prior partial capture
        with open(out_path) as fh:
            prior = json.load(fh)
        result["axes"].update(prior.get("axes", {}))
    axes = {"resourced": ("cores8_to_cores32_slots_half", (4, 16)),
            "literal": ("local8_to_local32", (8, 32))}
    wanted = list(axes.values()) if args.axis == "both" else [axes[args.axis]]
    for name, slots in wanted:
        result["axes"][name] = run_axis(
            clips, pins=(8, 32), slots=slots, passes=args.passes)
        result["ended_loadavg_1m"] = round(os.getloadavg()[0], 2)
        with open(out_path, "w") as fh:  # partial results survive a crash
            json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
