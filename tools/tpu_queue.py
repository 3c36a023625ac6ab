"""TPU job queue: run measurement jobs when the axon tunnel is alive.

The tunnel has multi-hour outages (CLAUDE.md gotchas; even ``jax.devices()``
hangs), so TPU measurements are queued here instead of run inline: the queue
probes device liveness in a killable subprocess before each job, runs the job
under a hard timeout, re-probes + retries on failure, and appends every
result to a summary JSON so a killed queue resumes where it left off.

Usage:
    python tools/tpu_queue.py --jobs jobs.json [--out /tmp/tpuq] \
        [--deadline-s 36000] [--poll-s 300]

jobs.json: [{"name": ..., "cmd": [...], "env": {...}, "timeout_s": N,
             "retries": N}, ...]  (cmd runs with cwd=repo root)
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def probe(timeout_s: float = 120.0) -> bool:
    from bench import _probe_device_liveness

    ok, diag = _probe_device_liveness(timeout_s)
    print(f"[queue] probe: {diag}", flush=True)
    return ok


def run_job(job: dict, out_dir: Path) -> dict:
    name = job["name"]
    env = dict(os.environ)
    env.update({k: str(v) for k, v in job.get("env", {}).items()})
    log_path = out_dir / f"{name}.log"
    t0 = time.time()
    try:
        with open(log_path, "w") as log:
            r = subprocess.run(
                job["cmd"], cwd=REPO, env=env, stdout=log,
                stderr=subprocess.STDOUT, timeout=job.get("timeout_s", 900))
        rc = r.returncode
    except subprocess.TimeoutExpired:
        rc = -9
    wall = time.time() - t0
    tail = ""
    try:
        tail = log_path.read_text()[-2000:]
    except Exception:
        pass
    return {"name": name, "rc": rc, "wall_s": round(wall, 1),
            "log": str(log_path), "tail_lines": tail.splitlines()[-12:]}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--jobs", required=True)
    ap.add_argument("--out", default="/tmp/tpuq")
    ap.add_argument("--deadline-s", type=float, default=36000.0)
    ap.add_argument("--poll-s", type=float, default=300.0)
    args = ap.parse_args()
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    jobs = json.loads(Path(args.jobs).read_text())
    summary_path = out_dir / "summary.json"
    summary = (json.loads(summary_path.read_text())
               if summary_path.exists() else {})

    t_end = time.time() + args.deadline_s
    # a succeeded job IS a liveness proof: only re-probe (40s+ through the
    # tunnel) before the first job and after a failure/timeout
    tunnel_proven = False
    for job in jobs:
        name = job["name"]
        if summary.get(name, {}).get("rc") == 0:
            print(f"[queue] {name}: already done, skipping", flush=True)
            continue
        attempts = job.get("retries", 2) + 1
        for attempt in range(attempts):
            # never START a job whose timeout crosses the deadline: the TPU
            # chip is exclusive, and a job overrunning the deadline would
            # still hold it when the driver's own bench run needs it
            if time.time() + job.get("timeout_s", 900) > t_end:
                print(f"[queue] skipping {name}: timeout_s would cross "
                      "the deadline", flush=True)
                break
            # wait for a live tunnel (poll; outages last hours)
            while not tunnel_proven and not probe():
                if time.time() > t_end:
                    print("[queue] deadline reached while polling", flush=True)
                    return 1
                print(f"[queue] tunnel dead; sleeping {args.poll_s:.0f}s",
                      flush=True)
                time.sleep(args.poll_s)
            print(f"[queue] running {name} (attempt {attempt + 1})",
                  flush=True)
            res = run_job(job, out_dir)
            summary[name] = res
            summary_path.write_text(json.dumps(summary, indent=1))
            print(f"[queue] {name}: rc={res['rc']} in {res['wall_s']}s",
                  flush=True)
            tunnel_proven = res["rc"] == 0
            if res["rc"] == 0:
                break
    print("[queue] all jobs attempted", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
