"""Profiling and timing utilities.

The reference has no tracing beyond ad-hoc time.time() loops
(tf_ops/grouping/tf_grouping.py:98-101). Here:
- :func:`trace` — context manager around `jax.profiler` writing a
  TensorBoard-loadable trace directory (XLA op-level timeline).
- :class:`StepTimer` — cheap rolling per-step wall-time stats for train
  loops.
- :func:`time_fn` — robust microbenchmark helper (compile excluded,
  block_until_ready fenced) used by benchmarks/.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling window of step durations -> steps/sec, examples/sec."""

    def __init__(self, window: int = 50):
        self._times = deque(maxlen=window)
        self._last = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
        self._last = now

    @property
    def mean_step_time(self) -> float:
        return sum(self._times) / len(self._times) if self._times else 0.0

    def steps_per_sec(self) -> float:
        m = self.mean_step_time
        return 1.0 / m if m > 0 else 0.0


def time_fn(fn, *args, warmup: int = 3, iters: int = 20) -> float:
    """Median-of-iters wall time of fn(*args) in seconds (jit-safe)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
