"""Unit tests for bench.py's stall-proofing machinery (the round-2 lesson:
a tunnel stall must never zero the official record). Pure-Python logic —
no device needed."""

import importlib
import json
import sys

import numpy as np
import pytest


@pytest.fixture()
def bench():
    mod = importlib.import_module("bench")
    # reset module state between tests (module-level dicts)
    mod._PARTIAL.update(windows_per_sec=None, mfu=None, impl=None,
                        timing="watchdog_partial")
    mod._EXTRAS.clear()
    return mod


def test_note_partial_seeds_and_upgrades(bench):
    flops, peak, batch = 6.7e9 * 512, 197e12, 512
    # wall estimate seeds the partial
    dt, kind, _ = bench._note_partial(0.1, "wall_clock_fetch_bounded",
                                      "scan", batch, flops, peak, 1)
    assert bench._PARTIAL["windows_per_sec"] == pytest.approx(5120.0)
    assert bench._PARTIAL["timing"] == "wall_clock_fetch_bounded"
    # a device trace (higher trust) replaces it even if slower
    bench._note_partial(0.2, "device_trace", "pallas", batch, flops, peak, 1)
    assert bench._PARTIAL["timing"] == "device_trace"
    assert bench._PARTIAL["impl"] == "pallas"
    # a WORSE-rank result never downgrades the stored partial
    bench._note_partial(0.01, "wall_clock_fetch_bounded", "scan", batch,
                        flops, peak, 1)
    assert bench._PARTIAL["timing"] == "device_trace"


def test_note_partial_clamps_implausible_timing(bench):
    """A timing implying >100% MFU (the round-1 tunnel artifact: 14x chip
    peak) is refused and replaced by the FLOPs bound."""
    flops, peak, batch = 6.7e9 * 512, 197e12, 512
    dt, kind, mfu = bench._note_partial(1e-4, "wall_clock_fetch_bounded",
                                        "scan", batch, flops, peak, 1)
    assert kind == "implausible_clamped"
    assert mfu == pytest.approx(1.0)
    assert dt == pytest.approx(flops / peak)
    wps = bench._PARTIAL["windows_per_sec"]
    assert wps <= batch / (flops / peak) * 1.001  # never above chip physics


def test_emit_json_contract(bench, capsys):
    """The driver parses ONE JSON line with the documented fields."""
    bench._EXTRAS["scan_ms"] = 184.4
    bench._emit(12251.0, mfu=0.415, impl="pallas", timing="device_trace")
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    payload = json.loads(out[0])
    assert payload["metric"] == "windows_per_sec_per_chip"
    assert payload["value"] == 12251.0
    assert payload["unit"] == "windows/s"
    assert payload["vs_baseline"] == pytest.approx(6.13, abs=0.01)
    assert payload["mfu"] == 0.415
    assert payload["impl"] == "pallas"
    assert payload["timing"] == "device_trace"
    assert payload["extras"]["scan_ms"] == 184.4


def test_watchdog_emits_partial_or_last_good(bench, capsys, monkeypatch):
    """The watchdog always emits something parseable; with a partial it
    reports it, without one it falls back to the committed last-good record
    (round-3 lesson), and to 0.0 only when no good run has ever existed."""
    monkeypatch.setattr(bench.os, "_exit", lambda code: None)

    # no partial, no last-good -> 0.0 (the never-succeeded case)
    monkeypatch.setattr(bench, "_load_last_good", lambda: None)
    bench._watchdog()
    payload = json.loads(capsys.readouterr().out.strip())
    assert payload["value"] == 0.0
    assert payload["timing"] == "watchdog_no_measurement"

    # no partial, committed last-good -> that record, clearly labeled
    rec = {"value": 12251.0, "mfu": 0.415, "impl": "pallas",
           "timing": "device_trace", "date": "2026-08-17", "commit": "abc"}
    monkeypatch.setattr(bench, "_load_last_good", lambda: rec)
    bench._watchdog()
    payload = json.loads(capsys.readouterr().out.strip())
    assert payload["value"] == 12251.0
    assert payload["timing"] == "last_good:watchdog_no_measurement"
    assert payload["extras"]["last_good"]["commit"] == "abc"

    # a live partial always wins over the fallback
    bench._note_partial(0.05, "device_trace_partial", "pallas", 512,
                        6.7e9 * 512, 197e12, 1)
    bench._watchdog()
    payload = json.loads(capsys.readouterr().out.strip())
    assert payload["value"] > 0
    assert payload["timing"] == "device_trace_partial"


def test_load_last_good_committed_record(bench):
    """BENCH_LOCAL.json is committed and parseable (the outage fallback)."""
    rec = bench._load_last_good()
    assert rec is not None
    assert rec["value"] > 0
    assert rec["timing"] == "device_trace"
    assert rec["date"] and rec["impl"]


def test_emit_last_good_or_zero_paths(bench, capsys, monkeypatch):
    monkeypatch.setattr(bench, "_load_last_good", lambda: None)
    bench._emit_last_good_or_zero("tunnel_dead_preflight", "probe timed out")
    payload = json.loads(capsys.readouterr().out.strip())
    assert payload["value"] == 0.0
    assert payload["timing"] == "tunnel_dead_preflight"
    assert payload["extras"]["liveness_diagnosis"] == "probe timed out"


def test_probe_device_liveness_timeout(bench, monkeypatch):
    """A hung device init is killed by the subprocess timeout, not inherited
    by the parent."""
    import subprocess as sp

    def fake_run(*a, **k):
        raise sp.TimeoutExpired(cmd="python", timeout=k.get("timeout"))

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    ok, diag = bench._probe_device_liveness(timeout_s=5.0)
    assert not ok
    assert "timed out" in diag


def test_probe_device_liveness_real_subprocess(bench):
    """End-to-end probe against CPU jax in the subprocess (fast, no tunnel).
    The platform override must go through jax.config.update — the env var
    is not honored in this environment (CLAUDE.md)."""
    ok, diag = bench._probe_device_liveness(timeout_s=120.0, platform="cpu")
    assert ok, diag
    assert "device live" in diag
