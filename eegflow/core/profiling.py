"""Device-trace timing: the only trustworthy clock in this environment.

Wall-clock through the axon TPU tunnel reports pure-XLA programs far above
hardware peak (dispatch returns before execution), so throughput numbers must
come from the device itself. This module captures a ``jax.profiler`` trace
around a workload and parses the XLA op-level device times out of the
``.xplane.pb`` via xprof's converter — validated against a dependency-chained
8×2048³ bf16 matmul measuring 190 TFLOP/s ≈ 97 % of a v5e's published peak.

Replaces the reference's ``time.time()`` spans (ref 04_lstm_model.py:427,
06_lstm_ode_integration.py:458-467) with real per-op accounting.
"""

from __future__ import annotations

import glob
import json
import os
import tempfile
from dataclasses import dataclass, field
from typing import Callable, Dict, Optional

#: v5e peak dense bf16 matmul throughput, FLOP/s (public spec: 197 TFLOP/s).
TPU_V5E_BF16_PEAK_FLOPS = 197e12


@dataclass
class DeviceTiming:
    """Parsed device-side timing for one traced region."""

    total_self_time_s: float                    # sum of op self-times
    by_category: Dict[str, float] = field(default_factory=dict)
    by_op: Dict[str, float] = field(default_factory=dict)
    n_ops: int = 0
    #: iterations that actually ran inside the trace window (device_time may
    #: stop early when its deadline expires; divide total by THIS, not by the
    #: requested iteration count)
    iters_done: int = 0

    def top_ops(self, n: int = 10):
        return sorted(self.by_op.items(), key=lambda kv: -kv[1])[:n]


def parse_xplane_device_time(trace_dir: str) -> Optional[DeviceTiming]:
    """Sum per-op device self-times from the newest xplane in ``trace_dir``.

    Returns None when no xplane exists or the xprof converter is unavailable
    (e.g. pure-CPU environments without the plugin).
    """
    files = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not files:
        return None
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except Exception:
        try:
            from tensorboard_plugin_profile.convert import (  # type: ignore
                raw_to_tool_data as rtd,
            )
        except Exception:
            return None
    try:
        data, _ = rtd.xspace_to_tool_data([files[-1]], "hlo_stats", {})
    except Exception:
        return None
    table = json.loads(data if isinstance(data, str) else data.decode("utf-8"))
    cols = [c["id"] for c in table.get("cols", [])]
    try:
        i_cat = cols.index("category")
        i_name = cols.index("hlo_op_name")
        i_self = cols.index("total_self_time")
    except ValueError:
        return None
    by_cat: Dict[str, float] = {}
    by_op: Dict[str, float] = {}
    total = 0.0
    for row in table.get("rows", []):
        vals = [cell["v"] for cell in row["c"]]
        t = float(vals[i_self]) * 1e-6  # us -> s
        total += t
        by_cat[str(vals[i_cat])] = by_cat.get(str(vals[i_cat]), 0.0) + t
        by_op[str(vals[i_name])] = by_op.get(str(vals[i_name]), 0.0) + t
    return DeviceTiming(total, by_cat, by_op, n_ops=len(table.get("rows", [])))


def device_time(
    fn: Callable[[], object],
    iters: int = 10,
    warmup: int = 2,
    trace_dir: Optional[str] = None,
    deadline_s: Optional[float] = None,
) -> Optional[DeviceTiming]:
    """Run up to ``iters`` calls of ``fn`` inside a profiler trace; return the
    summed device time (divide ``total_self_time_s`` by ``iters_done`` for the
    per-call time).

    ``fn`` must block on its own result (call ``jax.block_until_ready``)
    so every iteration's execution lands inside the trace window.

    ``deadline_s`` bounds the wall time spent inside the trace loop: once it
    has elapsed, no further iterations are STARTED (a single in-flight call
    that stalls cannot be interrupted from this thread — callers needing a
    hard bound must pair this with a watchdog). At least one iteration always
    runs so a result exists; ``iters_done`` records how many did.
    """
    import time

    import jax

    for _ in range(warmup):
        fn()
        if deadline_s is not None:
            break  # under a deadline one warmup call is all we can afford
    d = trace_dir or tempfile.mkdtemp(prefix="eegflow_trace_")
    n_done = 0
    t0 = time.perf_counter()
    with jax.profiler.trace(d):
        for _ in range(iters):
            fn()
            n_done += 1
            if deadline_s is not None and time.perf_counter() - t0 > deadline_s:
                break
    dt = parse_xplane_device_time(d)
    if dt is not None:
        dt.iters_done = n_done
    return dt
