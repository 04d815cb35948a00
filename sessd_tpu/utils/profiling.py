"""Profiling / tracing helpers.

The reference's per-stage hook timings (IterTimerHook + the extra hook
sites, trainer_sessd.py:263-272) collapse under jit — one step is one XLA
program. Deep visibility comes from jax.profiler traces (viewable in
TensorBoard/Perfetto) plus named step annotations.
"""
from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in profiler timelines."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock timing of (data, step) phases with running averages."""

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self.n = 0
        self.data_time = 0.0
        self.step_time = 0.0
        self._t = time.perf_counter()

    def data_done(self):
        self._data = time.perf_counter() - self._t

    def step_done(self):
        dt = time.perf_counter() - self._t - self._data
        self.n += 1
        if self.n > self.warmup:
            self.data_time += self._data
            self.step_time += dt
        self._t = time.perf_counter()

    @property
    def averages(self):
        n = max(self.n - self.warmup, 1)
        return {"data_time": self.data_time / n, "step_time": self.step_time / n}
