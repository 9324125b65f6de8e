"""One matched quiet-window quartet: no-Spark controls FIRST, then the
pinned Spark axis, all inside the same window (VERDICT r2 item #1 follow-up
— runs 1-2 captured the Spark levels quiet but the controls loaded)."""
from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402

clips = bench.ensure_clips(100_000)
result = {
    "started_loadavg_1m": round(os.getloadavg()[0], 2),
    "n_clips": 100_000,
    "controls_8_32": bench.run_controls(clips, levels=(8, 32)),
    "spark_pinned_8_32": bench.run_scaling_pinned(
        clips, pins=(8, 32), slots=(4, 16), cooldown_sec=100
    ),
    "ended_loadavg_1m": round(os.getloadavg()[0], 2),
}
out = os.path.join(REPO, ".bench_cache", "scaling_quiet_matched.json")
with open(out, "w") as f:
    json.dump(result, f, indent=1)
print(json.dumps(result))
