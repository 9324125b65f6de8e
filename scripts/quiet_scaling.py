"""Opportunistic quiet-window scaling measurement (VERDICT r2 item #1).

Polls 1-min loadavg; when it drops below the threshold, runs the pinned
gate-scaling pair on the BASELINE axis local[8] -> local[32] (plus the
4 -> 16 axis for continuity with rounds 1-2) and the no-Spark /
cache-resident controls, then writes one JSON blob to
``.bench_cache/scaling_quiet.json``.

Rationale: this sandbox is a shared 32-core host with external tenants;
BASELINE.md's scaling-efficiency row (>=0.8 from N to 4N) has been
host-DRAM-bound in every loaded measurement.  The judge asked for one
pair captured with loadavg < 2 at both levels so the number reflects the
machine, not the neighbours.

Usage:
  python scripts/quiet_scaling.py [--threshold 2.0] [--timeout-min 240]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=2.0)
    ap.add_argument("--timeout-min", type=float, default=240)
    ap.add_argument("--clips", type=int, default=100_000)
    args = ap.parse_args()

    out_path = os.path.join(REPO, ".bench_cache", "scaling_quiet.json")
    clips = bench.ensure_clips(args.clips)

    deadline = time.time() + args.timeout_min * 60
    while True:
        load = os.getloadavg()[0]
        if load < args.threshold:
            break
        if time.time() > deadline:
            print(json.dumps({"captured": False, "last_loadavg": load}))
            return
        bench.log(f"waiting for quiet window (loadavg {load:.2f} >= "
                  f"{args.threshold})")
        time.sleep(60)

    result: dict = {
        "captured": True,
        "started_loadavg_1m": round(os.getloadavg()[0], 2),
        "n_clips": args.clips,
        "axes": {},
    }
    # resource-scaled executor analog first (pin 8→32 cores, slots pin/2 —
    # the gate keeps ~2 threads per slot, see bench.run_scaling_pinned), then
    # the literal BASELINE-named local[8]→local[32] (known to oversubscribe),
    # then the r1/r2-continuity 4→16 axis.  100s cooldown before each level:
    # 1-min loadavg decays e^-t/60, so the recorded reading is external
    # load, not our own previous level.
    bench.log(f"quiet pinned axis 8->32 cores (loadavg "
              f"{os.getloadavg()[0]:.2f})")
    result["axes"]["cores8_to_cores32_slots_half"] = bench.run_scaling_pinned(
        clips, pins=(8, 32), slots=(4, 16), cooldown_sec=100
    )
    for levels in ((8, 32), (4, 16)):
        key = f"local{levels[0]}_to_local{levels[1]}"
        bench.log(f"quiet scaling axis {key} (loadavg "
                  f"{os.getloadavg()[0]:.2f})")
        result["axes"][key] = bench.run_scaling(clips, levels=levels,
                                                cooldown_sec=100)
    bench.log("quiet controls (8->32)")
    result["controls_8_32"] = bench.run_controls(clips, levels=(8, 32))
    result["ended_loadavg_1m"] = round(os.getloadavg()[0], 2)

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    with open(out_path.replace(".json", "_history.jsonl"), "a") as f:
        f.write(json.dumps(result) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
