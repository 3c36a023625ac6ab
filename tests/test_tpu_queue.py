"""Unit tests for tools/tpu_queue.py scheduling logic (no jax, no TPU).

The queue guards the round's TPU measurements: it must resume from its
summary, retry failures, and never start a job whose timeout would cross
the deadline (the chip is exclusive — an overrunning job would still hold
it when the driver's own bench run needs it).
"""
import importlib.util
import json
import sys
from pathlib import Path


def _load_queue_module():
    path = Path(__file__).resolve().parent.parent / "tools" / "tpu_queue.py"
    spec = importlib.util.spec_from_file_location("tpu_queue_under_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def run_queue(tmp_path, monkeypatch, jobs, deadline_s, probe_ok=True):
    """Run tpu_queue.main() in-process with a stubbed liveness probe."""
    mod = _load_queue_module()
    monkeypatch.setattr(mod, "probe", lambda timeout_s=120.0: probe_ok)
    jobs_path = tmp_path / "jobs.json"
    jobs_path.write_text(json.dumps(jobs))
    out = tmp_path / "out"
    monkeypatch.setattr(sys, "argv", [
        "tpu_queue.py", "--jobs", str(jobs_path), "--out", str(out),
        "--deadline-s", str(deadline_s), "--poll-s", "0.2"])
    rc = mod.main()
    summary_path = out / "summary.json"
    summary = (json.loads(summary_path.read_text())
               if summary_path.exists() else {})
    return rc, summary


def test_jobs_run_and_summary_written(tmp_path, monkeypatch, capsys):
    jobs = [{"name": "ok", "cmd": [sys.executable, "-c", "print('hi')"],
             "timeout_s": 30, "retries": 0}]
    rc, summary = run_queue(tmp_path, monkeypatch, jobs, deadline_s=60)
    assert rc == 0
    assert summary["ok"]["rc"] == 0


def test_deadline_crossing_job_is_skipped_not_started(tmp_path, monkeypatch,
                                                      capsys):
    marker = tmp_path / "ran.txt"
    jobs = [
        # timeout_s exceeds the deadline -> must never start
        {"name": "long", "cmd": [sys.executable, "-c",
                                 f"open({str(marker)!r}, 'w').write('x')"],
         "timeout_s": 9999, "retries": 0},
        # a short job after it must still run
        {"name": "short", "cmd": [sys.executable, "-c", "print('ok')"],
         "timeout_s": 5, "retries": 0},
    ]
    rc, summary = run_queue(tmp_path, monkeypatch, jobs, deadline_s=30)
    assert rc == 0
    assert "skipping long" in capsys.readouterr().out
    assert not marker.exists(), "deadline-crossing job must not start"
    assert summary["short"]["rc"] == 0
    assert "long" not in summary


def test_resume_skips_completed_jobs(tmp_path, monkeypatch, capsys):
    out = tmp_path / "out"
    out.mkdir()
    (out / "summary.json").write_text(json.dumps(
        {"done_before": {"rc": 0, "wall_s": 1.0}}))
    marker = tmp_path / "reran.txt"
    jobs = [{"name": "done_before",
             "cmd": [sys.executable, "-c",
                     f"open({str(marker)!r}, 'w').write('x')"],
             "timeout_s": 30, "retries": 0}]
    rc, summary = run_queue(tmp_path, monkeypatch, jobs, deadline_s=60)
    assert rc == 0
    assert "already done, skipping" in capsys.readouterr().out
    assert not marker.exists(), "completed job must not re-run"


def test_failed_job_is_retried(tmp_path, monkeypatch, capsys):
    counter = tmp_path / "count.txt"
    # fails on the first attempt, succeeds on the second
    code = (
        "import pathlib, sys\n"
        f"p = pathlib.Path({str(counter)!r})\n"
        "n = int(p.read_text()) if p.exists() else 0\n"
        "p.write_text(str(n + 1))\n"
        "sys.exit(0 if n >= 1 else 1)\n"
    )
    jobs = [{"name": "flaky", "cmd": [sys.executable, "-c", code],
             "timeout_s": 30, "retries": 1}]
    rc, summary = run_queue(tmp_path, monkeypatch, jobs, deadline_s=60)
    assert rc == 0
    assert summary["flaky"]["rc"] == 0
    assert counter.read_text() == "2"


def test_fast_failure_keeps_tunnel_proof(tmp_path, monkeypatch, capsys):
    """A deterministic job failure (fast non-zero rc) says nothing about the
    tunnel: the queue must NOT burn a 40s+ probe before every subsequent
    attempt (ADVICE r4). Only an rc=-9 timeout disproves liveness."""
    mod = _load_queue_module()
    calls = []
    monkeypatch.setattr(mod, "probe",
                        lambda timeout_s=120.0: calls.append(1) or True)
    jobs = [
        {"name": "ok1", "cmd": [sys.executable, "-c", "print('hi')"],
         "timeout_s": 30, "retries": 0},
        {"name": "bad", "cmd": [sys.executable, "-c", "import sys; sys.exit(3)"],
         "timeout_s": 30, "retries": 1},
        {"name": "ok2", "cmd": [sys.executable, "-c", "print('hi')"],
         "timeout_s": 30, "retries": 0},
    ]
    jobs_path = tmp_path / "jobs.json"
    jobs_path.write_text(json.dumps(jobs))
    monkeypatch.setattr(sys, "argv", [
        "tpu_queue.py", "--jobs", str(jobs_path),
        "--out", str(tmp_path / "out"), "--deadline-s", "60",
        "--poll-s", "0.2"])
    rc = mod.main()
    assert rc == 0
    # exactly ONE probe: before the first job; ok1's success vouches for
    # bad's attempts and ok2 within the TTL
    assert len(calls) == 1


def test_timeout_clears_tunnel_proof(tmp_path, monkeypatch, capsys):
    """rc=-9 (job timeout) is the dead-tunnel signature: the next attempt
    must re-probe even though an earlier job succeeded recently."""
    mod = _load_queue_module()
    calls = []
    monkeypatch.setattr(mod, "probe",
                        lambda timeout_s=120.0: calls.append(1) or True)
    hang = "import time; time.sleep(30)"
    jobs = [
        {"name": "ok1", "cmd": [sys.executable, "-c", "print('hi')"],
         "timeout_s": 30, "retries": 0},
        {"name": "hang", "cmd": [sys.executable, "-c", hang],
         "timeout_s": 1, "retries": 1},
    ]
    jobs_path = tmp_path / "jobs.json"
    jobs_path.write_text(json.dumps(jobs))
    monkeypatch.setattr(sys, "argv", [
        "tpu_queue.py", "--jobs", str(jobs_path),
        "--out", str(tmp_path / "out"), "--deadline-s", "60",
        "--poll-s", "0.2"])
    rc = mod.main()
    assert rc == 0
    summary = json.loads((tmp_path / "out" / "summary.json").read_text())
    assert summary["hang"]["rc"] == -9
    # probes: one before ok1, one before EACH hang attempt after the -9
    assert len(calls) == 2


def test_stale_proof_reprobes(tmp_path, monkeypatch, capsys):
    """Success-based liveness proof expires after PROOF_TTL_S (ADVICE r4:
    outages are multi-hour; a 3 h job must not launch on a proof from 2 h
    ago)."""
    mod = _load_queue_module()
    monkeypatch.setattr(mod, "PROOF_TTL_S", 0.0)  # everything is stale
    calls = []
    monkeypatch.setattr(mod, "probe",
                        lambda timeout_s=120.0: calls.append(1) or True)
    jobs = [
        {"name": "a", "cmd": [sys.executable, "-c", "print('x')"],
         "timeout_s": 30, "retries": 0},
        {"name": "b", "cmd": [sys.executable, "-c", "print('x')"],
         "timeout_s": 30, "retries": 0},
    ]
    jobs_path = tmp_path / "jobs.json"
    jobs_path.write_text(json.dumps(jobs))
    monkeypatch.setattr(sys, "argv", [
        "tpu_queue.py", "--jobs", str(jobs_path),
        "--out", str(tmp_path / "out"), "--deadline-s", "60",
        "--poll-s", "0.2"])
    rc = mod.main()
    assert rc == 0
    assert len(calls) == 2  # proof never trusted -> probe before each job


def test_profile_result_parsed_into_summary(tmp_path, monkeypatch, capsys):
    """summary.json must carry the parsed ms/MFU so round results need no
    log re-grepping (VERDICT r4 weak #6)."""
    line = "[pallas] device 40.15 ms/step | 12,752 windows/s | MFU 43.2%"
    jobs = [{"name": "k_x", "cmd": [sys.executable, "-c", f"print({line!r})"],
             "timeout_s": 30, "retries": 0}]
    rc, summary = run_queue(tmp_path, monkeypatch, jobs, deadline_s=60)
    assert rc == 0
    assert summary["k_x"]["parsed"] == {
        "impl": "pallas", "ms_step": 40.15, "windows_s": "12,752",
        "mfu_pct": 43.2}


def test_dead_tunnel_polls_until_deadline(tmp_path, monkeypatch, capsys):
    jobs = [{"name": "never", "cmd": [sys.executable, "-c", "print('no')"],
             "timeout_s": 1, "retries": 0}]
    rc, summary = run_queue(tmp_path, monkeypatch, jobs, deadline_s=2,
                            probe_ok=False)
    assert rc == 1
    assert "deadline reached" in capsys.readouterr().out
    assert "never" not in summary
