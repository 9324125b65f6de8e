"""Opportunistic v1-vs-v2 gate scaling pair in one quiet window.

The v2 (audio-metric) gate runs ~5 kernels per clip off one decode —
roughly 5× the arithmetic intensity of v1 per byte moved.  On this
shared, DRAM-bandwidth-bound socket the v1 gate's measured scaling
ceiling is the HOST's (BENCH.md quiet-window captures; the no-Spark
control scales no better).  If that diagnosis is right, the v2 gate —
same engine, same plan shape, more FLOPs per byte — must scale
MATERIALLY better on the same axis; if the engine itself were the
bottleneck, v2 would scale no better than v1.  This script captures
both pairs in the same quiet window so the comparison is apples to
apples, on the honest executor analog (pin 2×slots: one 'executor' =
JVM arrow writer + python worker ≈ 2 cores).

Writes ``.bench_cache/scaling_v2.json``.

Usage: python scripts/v2_scaling.py [--threshold 2.0] [--timeout-min 120]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def _settle(threshold: float, max_wait_s: float = 600.0) -> None:
    """Wait until 1-min loadavg < threshold so a level never starts under
    the previous level's decaying self-load (BENCH.md capture notes: the
    distortion from our own teardown exceeds background-load noise)."""
    deadline = time.time() + max_wait_s
    while os.getloadavg()[0] >= threshold and time.time() < deadline:
        time.sleep(20)


def pinned_pair(input_path: str, profile: str,
                pins=(8, 32), slots=(4, 16),
                settle_load: float | None = None) -> dict:
    out = {}
    loadavgs = {}
    for pin, slot in zip(pins, slots):
        if settle_load is not None:
            _settle(settle_load)
        loadavgs[str(pin)] = round(os.getloadavg()[0], 2)
        bench.log(f"{profile} pinned run: {pin} cores / local[{slot}] "
                  f"(loadavg {loadavgs[str(pin)]})")
        cmd = [sys.executable, os.path.join(REPO, "bench.py"),
               "--scale-worker", str(slot), input_path, profile]
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{pin - 1}"] + cmd
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=1800)
        out[pin] = json.loads(proc.stdout.strip().splitlines()[-1])
    n, m = pins
    thr_n = out[n]["rows"] / out[n]["seconds"]
    thr_m = out[m]["rows"] / out[m]["seconds"]
    return {
        f"cores{n}_clips_per_sec": round(thr_n, 1),
        f"cores{m}_clips_per_sec": round(thr_m, 1),
        "slots": list(slots),
        "speedup": round(thr_m / thr_n, 3),
        "efficiency": round((thr_m / thr_n) / (m / n), 3),
        "loadavg_per_level": loadavgs,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=2.0)
    ap.add_argument("--timeout-min", type=float, default=120)
    ap.add_argument("--clips", type=int, default=100_000)
    ap.add_argument("--settle-load", type=float, default=None,
                    help="wait for loadavg below this before every level")
    args = ap.parse_args()

    clips = bench.ensure_clips(args.clips)
    deadline = time.time() + args.timeout_min * 60
    while True:
        load = os.getloadavg()[0]
        if load < args.threshold:
            break
        if time.time() > deadline:
            print(json.dumps({"captured": False, "last_loadavg": load}))
            return
        bench.log(f"waiting for quiet window (loadavg {load:.2f})")
        time.sleep(60)

    result = {
        "captured": True,
        "started_loadavg_1m": round(os.getloadavg()[0], 2),
        "n_clips": args.clips,
        "v1": pinned_pair(clips, "v1", settle_load=args.settle_load),
        "v2": pinned_pair(clips, "v2", settle_load=args.settle_load),
    }
    result["ended_loadavg_1m"] = round(os.getloadavg()[0], 2)
    out_path = os.path.join(REPO, ".bench_cache", "scaling_v2.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
