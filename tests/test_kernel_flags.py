"""In-suite coverage for the EEGFLOW_* kernel experiment flags.

The flags (docs/DESIGN.md §5) select alternative Pallas kernel schedules for
the fused BiLSTM layer — adjoint-residual forwards, bf16 residual streams,
N-chain ILP splits, and the fused dual-direction backward. Each must produce
the same gradients as the ``lax.scan`` reference (they are schedules, not
approximations — bf16 modes within AMP tolerance).

One subprocess runs all flag sets via the in-process flip mechanism
(``refresh_flags()`` + ``jax.clear_caches()`` — tests/flagcheck_worker.py),
the same sequence tools/profile_multi.py uses to A/B many kernel configs in
one TPU process without per-process device-init cost.
Replaces the cuDNN-fused monolith these schedules race
(/root/reference/04_lstm_model.py:181-188) with oracle-checked variants.
"""
import os
import subprocess
import sys

import pytest


@pytest.mark.timeout(600)
def test_kernel_flag_modes_match_scan_oracle():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # warm re-runs hit the suite's persistent compile cache
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    worker = os.path.join(os.path.dirname(__file__), "flagcheck_worker.py")
    proc = subprocess.run(
        [sys.executable, worker], env=env, capture_output=True, text=True,
        timeout=570,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "ALL_FLAG_SETS_OK" in proc.stdout, proc.stdout + proc.stderr
