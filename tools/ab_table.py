"""Summarize a tpu_queue run into the kernel A/B markdown table.

Usage: python tools/ab_table.py [--out /tmp/tpuq_r4] [--jobs tools/jobs_r4.json]

Parses each job log for profile_train's result line
(``[pallas] device X ms/step | Y windows/s | MFU Z%``), joins it with the
job's env flags from the jobs file and rc from summary.json, and prints a
markdown table sorted fastest-first — the round-results A/B table in one
command once the queue drains.
"""
from __future__ import annotations

import argparse
import json
import re
from pathlib import Path

LINE = re.compile(
    r"\[(?P<impl>\w+)\] device (?P<ms>[\d.]+) ms/step \| "
    r"(?P<wps>[\d,]+) windows/s \| MFU (?P<mfu>[\d.]+)%")


def parse_log(path: Path):
    """Last result line wins (warmup reruns print several)."""
    best = None
    try:
        for m in LINE.finditer(path.read_text()):
            best = m.groupdict()
    except OSError:
        return None
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/tpuq_r4")
    ap.add_argument("--jobs", default="tools/jobs_r4.json")
    args = ap.parse_args()
    out = Path(args.out)
    jobs = {j["name"]: j for j in json.loads(Path(args.jobs).read_text())}
    summary_path = out / "summary.json"
    summary = (json.loads(summary_path.read_text())
               if summary_path.exists() else {})

    rows = []
    for name, job in jobs.items():
        if not name.startswith("k_"):
            continue
        res = parse_log(out / f"{name}.log")
        rc = summary.get(name, {}).get("rc")
        flags = " ".join(f"{k.replace('EEGFLOW_', '')}={v}"
                         for k, v in job.get("env", {}).items()
                         if k.startswith("EEGFLOW_")) or "(baseline)"
        if res:
            rows.append((float(res["ms"]), name, flags,
                         res["wps"], res["mfu"], rc))
        else:
            rows.append((float("inf"), name, flags, "-", "-", rc))

    rows.sort()
    print("| job | flags | device ms/step | windows/s | MFU | rc |")
    print("|---|---|---|---|---|---|")
    for ms, name, flags, wps, mfu, rc in rows:
        ms_s = f"{ms:.2f}" if ms != float("inf") else "—"
        mfu_s = f"{mfu}%" if mfu != "-" else "—"
        print(f"| {name} | {flags} | {ms_s} | {wps} | {mfu_s} | {rc} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
