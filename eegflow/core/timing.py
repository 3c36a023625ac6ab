"""Lightweight tracing/profiling utilities.

The reference sprinkles ``time.time()`` spans and tqdm bars around hot loops
(e.g. 04_lstm_model.py:427,590-591; 06_lstm_ode_integration.py:458-467). Here
that becomes a reusable Timer registry plus an optional jax.profiler hook.
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Callable, Dict, List, Optional


class Timer:
    """Collects named wall-clock spans; supports nesting via context manager."""

    def __init__(self) -> None:
        self.spans: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.spans.setdefault(name, []).append(time.perf_counter() - t0)

    def total(self, name: str) -> float:
        return sum(self.spans.get(name, []))

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": sum(v), "count": len(v), "mean_s": sum(v) / len(v)}
            for k, v in self.spans.items()
        }


GLOBAL_TIMER = Timer()


def timed(name: Optional[str] = None, timer: Timer = GLOBAL_TIMER) -> Callable:
    """Decorator recording wall time of each call under ``name``."""

    def deco(fn: Callable) -> Callable:
        label = name or fn.__qualname__

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with timer.span(label):
                return fn(*args, **kwargs)

        return wrapper

    return deco


@contextlib.contextmanager
def jax_trace(logdir: Optional[str] = None):
    """Optionally wrap a block in a jax.profiler trace (no-op when logdir is None)."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
