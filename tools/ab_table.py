"""Summarize kernel A/B measurements into the round-results markdown table.

Two sources, merged (later wins per name):
  * per-job tpu_queue logs parsed for profile_train's result line
    (``[pallas] device X ms/step | Y windows/s | MFU Z%``), joined with the
    job's env flags from the jobs file;
  * the one-process sweep's results JSON (tools/profile_multi.py --out),
    which already carries parsed ms/MFU/flags per config.

Usage: python tools/ab_table.py [--out docs/ab_r5] [--jobs tools/jobs_r5.json]
           [--multi docs/ab_r5/ab_multi.json]
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
    ap.add_argument("--out", default="docs/ab_r5")
    ap.add_argument("--jobs", default="tools/jobs_r5.json")
    ap.add_argument("--multi", default="docs/ab_r5/ab_multi.json")
    args = ap.parse_args()
    out = Path(args.out)

    rows = {}  # name -> (ms, flags, wps, mfu, status)

    jobs_path = Path(args.jobs)
    if jobs_path.exists():
        jobs = {j["name"]: j for j in json.loads(jobs_path.read_text())}
        summary_path = out / "summary.json"
        summary = (json.loads(summary_path.read_text())
                   if summary_path.exists() else {})
        for name, job in jobs.items():
            if not name.startswith("k_"):
                continue
            res = parse_log(out / f"{name}.log")
            rc = summary.get(name, {}).get("rc")
            flags = " ".join(f"{k.replace('EEGFLOW_', '')}={v}"
                             for k, v in job.get("env", {}).items()
                             if k.startswith("EEGFLOW_")) or "(defaults)"
            if res:
                rows[name] = (float(res["ms"]), flags, res["wps"],
                              f"{res['mfu']}%", f"rc={rc}")
            else:
                rows[name] = (float("inf"), flags, "-", "—", f"rc={rc}")

    # merge EVERY wave's sweep output (ab_multi.json, ab_multi2.json, ...)
    multi_path = Path(args.multi)
    wave_paths = sorted(multi_path.parent.glob(
        multi_path.stem.rstrip("0123456789") + "*.json"))
    for multi_path in wave_paths or [multi_path]:
        if not multi_path.exists():
            continue
        for name, rec in json.loads(multi_path.read_text()).items():
            if "ms_step" in rec:
                mfu = rec.get("mfu")
                rows[name] = (
                    rec["ms_step"], rec.get("flags", ""),
                    f"{rec['windows_s']:,.0f}",
                    f"{mfu * 100:.1f}%" if mfu else "—", "ok")
            else:
                rows[name] = (float("inf"), rec.get("flags", ""), "-", "—",
                              (rec.get("error") or "?")[:40])

    print("| config | flags | device ms/step | windows/s | MFU | status |")
    print("|---|---|---|---|---|---|")
    for name, (ms, flags, wps, mfu, status) in sorted(
            rows.items(), key=lambda kv: kv[1][0]):
        ms_s = f"{ms:.2f}" if ms != float("inf") else "—"
        print(f"| {name} | {flags} | {ms_s} | {wps} | {mfu} | {status} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
