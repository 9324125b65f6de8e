"""Opportunistic clean-bench watcher for the shared 32-core host.

External tenants on this VM intermittently hold 10+ cores and have polluted
several full-bench snapshots (r2 + r3 logs: health scan swinging 2s ↔ 17s
with no plan change).  Pre-run loadavg gating is not enough — a tenant can
arrive mid-run.  This watcher makes cleanliness MACHINE-CHECKED over the
whole run, not just at launch:

1. wait until 1-min loadavg < --start-load (default 1.2);
2. launch ``python bench.py`` as a subprocess;
3. every --sample-sec seconds, read (a) host busy cores from /proc/stat and
   (b) the bench process tree's cores (utime+stime of every live descendant
   plus the root's cutime/cstime, which accumulate reaped children) — the
   difference is EXTERNAL cores, i.e. other tenants;
4. accept the run iff mean external cores < --mean-limit (default 1.5) and
   the 90th-percentile window < --p90-limit (default 3.0).  On reject, the
   machine-written BENCH_LAST_RUN.md is restored from git HEAD and the
   watcher keeps waiting; on accept, the cleanliness trace is written next
   to the run JSON so the evidence travels with the number.

Usage: python scripts/quiet_bench_watch.py [--tries 20] [--once]
Writes: BENCH_LAST_RUN.md (via bench.py), .bench_cache/bench_clean.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HZ = os.sysconf("SC_CLK_TCK")


def host_busy_jiffies() -> int:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    # user nice system irq softirq steal (idle+iowait excluded)
    vals = list(map(int, parts[1:]))
    return vals[0] + vals[1] + vals[2] + vals[5] + vals[6] + vals[7]


def _read_stat(pid: int) -> tuple[int, int, int] | None:
    """(ppid, self_jiffies, reaped_children_jiffies) or None if gone."""
    try:
        with open(f"/proc/{pid}/stat") as f:
            s = f.read()
    except OSError:
        return None
    # comm may contain spaces/parens: split after the LAST ')'
    rest = s[s.rindex(")") + 2 :].split()
    ppid = int(rest[1])
    utime, stime, cutime, cstime = (int(rest[i]) for i in (11, 12, 13, 14))
    return ppid, utime + stime, cutime + cstime


def tree_jiffies(root: int) -> int:
    """CPU jiffies of root + all live descendants + root's reaped children."""
    stats: dict[int, tuple[int, int, int]] = {}
    for pid in os.listdir("/proc"):
        if pid.isdigit():
            st = _read_stat(int(pid))
            if st is not None:
                stats[int(pid)] = st
    kids: dict[int, list[int]] = {}
    for pid, (ppid, _, _) in stats.items():
        kids.setdefault(ppid, []).append(pid)
    total = 0
    stack = [root]
    while stack:
        pid = stack.pop()
        st = stats.get(pid)
        if st is None:
            continue
        total += st[1] + (st[2] if pid == root else 0)
        stack.extend(kids.get(pid, []))
    return total


def run_once(args) -> tuple[dict | None, dict]:
    """Run bench.py, sampling external load.  Returns (bench_json | None,
    cleanliness record)."""
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = open("/tmp/quiet_bench.json", "w")
    log = open("/tmp/quiet_bench.log", "w")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "bench.py")],
        stdout=out, stderr=log, cwd=REPO, env=env,
    )
    windows = []
    h0, t0, w0 = host_busy_jiffies(), tree_jiffies(proc.pid), time.time()
    while proc.poll() is None:
        time.sleep(args.sample_sec)
        h1, t1, w1 = host_busy_jiffies(), tree_jiffies(proc.pid), time.time()
        dt = w1 - w0
        if dt > 0:
            host = (h1 - h0) / HZ / dt
            ours = max(0.0, (t1 - t0) / HZ / dt)  # tree can shrink on reap
            windows.append(
                {"t": round(w1, 1), "host_cores": round(host, 2),
                 "our_cores": round(ours, 2),
                 "external_cores": round(max(0.0, host - ours), 2)}
            )
        h0, t0, w0 = h1, t1, w1
    proc.wait()
    out.close(); log.close()
    ext = sorted(w["external_cores"] for w in windows) or [0.0]
    mean_ext = sum(ext) / len(ext)
    p90 = ext[min(len(ext) - 1, int(0.9 * len(ext)))]
    clean = (
        proc.returncode == 0
        and mean_ext < args.mean_limit
        and p90 < args.p90_limit
    )
    record = {
        "clean": clean, "returncode": proc.returncode,
        "mean_external_cores": round(mean_ext, 2),
        "p90_external_cores": round(p90, 2),
        "limits": {"mean": args.mean_limit, "p90": args.p90_limit},
        "n_windows": len(windows), "sample_sec": args.sample_sec,
        "windows": windows,
    }
    bench = None
    if proc.returncode == 0:
        try:
            with open("/tmp/quiet_bench.json") as f:
                bench = json.loads(f.read().strip().splitlines()[-1])
        except (OSError, ValueError, IndexError):
            record["clean"] = False
    return bench, record


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--start-load", type=float, default=1.2)
    ap.add_argument("--mean-limit", type=float, default=1.5)
    ap.add_argument("--p90-limit", type=float, default=3.0)
    ap.add_argument("--sample-sec", type=float, default=10.0)
    ap.add_argument("--poll-sec", type=float, default=60.0)
    ap.add_argument("--tries", type=int, default=20)
    ap.add_argument("--once", action="store_true")
    args = ap.parse_args()

    tries = 0
    while tries < args.tries:
        load = os.getloadavg()[0]
        if load >= args.start_load:
            print(f"waiting: loadavg {load:.2f} >= {args.start_load}",
                  flush=True)
            time.sleep(args.poll_sec)
            continue
        tries += 1
        print(f"try {tries}: loadavg {load:.2f} — launching bench",
              flush=True)
        bench, record = run_once(args)
        print(json.dumps({k: record[k] for k in
                          ("clean", "mean_external_cores",
                           "p90_external_cores", "n_windows")}), flush=True)
        # persist EVERY attempt (numbers + cleanliness, sans windows) —
        # rejected-but-fast runs are evidence too, and /tmp gets overwritten
        hist = os.path.join(REPO, ".bench_cache", "bench_attempts.jsonl")
        os.makedirs(os.path.dirname(hist), exist_ok=True)
        with open(hist, "a") as f:
            slim = {k: v for k, v in record.items() if k != "windows"}
            f.write(json.dumps({"ts": time.time(), "record": slim,
                                "bench": bench}) + "\n")
        if record["clean"] and bench is not None:
            dest = os.path.join(REPO, ".bench_cache", "bench_clean.json")
            with open(dest, "w") as f:
                json.dump({"bench": bench, "cleanliness": record}, f,
                          indent=1)
            print(f"CLEAN capture → {dest} (BENCH_LAST_RUN.md left as "
                  "written by bench.py)", flush=True)
            return 0
        # polluted run overwrote the snapshot: restore the curated one
        subprocess.run(["git", "checkout", "--", "BENCH_LAST_RUN.md"],
                       cwd=REPO, check=False)
        print("rejected (external load); snapshot restored", flush=True)
        if args.once:
            return 1
    return 1


if __name__ == "__main__":
    sys.exit(main())
