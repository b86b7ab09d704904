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

# Peak dense bf16 MXU throughput of the target chip (TPU v5e), TFLOP/s.
# Single source for every MFU computation in bench.py / benchmarks/.
MXU_BF16_TFLOPS = 197.0


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


def _fence(out) -> None:
    """Force completion by fetching result bytes.

    On remote-device transports (e.g. a TPU behind a relay),
    `jax.block_until_ready` can return before the computation has actually
    executed; fetching a scalar of the result is the only reliable fence.
    """
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])


def time_fn(fn, *args, warmup: int = 1, iters: int = 5) -> float:
    """Median wall time per call of fn(*args), fenced by result fetch.

    NOTE: includes one host<->device round trip per call (~tens of ms over
    a tunnel). For microbenchmarking sub-ms kernels use
    :func:`time_op_loop`, which amortizes the round trip over an on-device
    loop.
    """
    for _ in range(warmup):
        _fence(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _fence(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def compiled_cost(jitted_fn, *args, **kwargs) -> dict | None:
    """XLA's own cost model for a jitted call: {"flops", "bytes_accessed"}.

    Grounds throughput numbers in the hardware (MFU, HBM GB/s) instead of
    an external anchor: flops/bytes come from the backend's cost analysis
    of the *optimized* HLO, so fusion and algebraic simplification are
    already accounted for. Returns None when the backend exposes no cost
    analysis (some PJRT plugins); callers should then omit the derived
    columns rather than guess.
    """
    try:
        analysis = jitted_fn.lower(*args, **kwargs).compile().cost_analysis()
    except Exception:
        return None
    if analysis is None:
        return None
    if isinstance(analysis, (list, tuple)):  # older JAX: one dict per device
        analysis = analysis[0] if analysis else None
    if not analysis:
        return None
    flops = float(analysis.get("flops", 0.0))
    byts = float(analysis.get("bytes accessed",
                              analysis.get("bytes_accessed", 0.0)))
    if flops <= 0 and byts <= 0:
        return None
    return {"flops": flops, "bytes_accessed": byts}


def time_op_loop(op, x, iters: int = 50, warmup: bool = True,
                 repeats: int = 3) -> float:
    """Per-iteration device time of `op(x)`, measured inside one jitted
    `fori_loop` so transport latency amortizes to zero.

    `op(x)` may return any pytree. Each iteration feeds a slightly
    perturbed (index-dependent) input, which defeats result caching and
    CSE across iterations; ORDERING comes from `fori_loop` itself, which
    lowers to a sequential XLA While (do not replace it with an unrolled
    loop or vmap — iterations are NOT data-chained and XLA would overlap
    them). The loop-overhead baseline (iters=0 call) is subtracted; the
    methodology is calibrated at ~99.9% of MXU peak on a known-FLOPs
    matmul (benchmarks/kernels.py).
    """
    import jax.numpy as jnp

    def run(x, n):
        def body(i, acc):
            # vary the input per iteration (defeats result caching and CSE)
            xi = x + (i.astype(x.dtype) * jnp.asarray(1e-9, x.dtype))
            out = op(xi)
            # fold the FULL output into the scalar carry: folding a single
            # element would let XLA slice through matmuls/scans and skip
            # the work being measured ("compute out[0,0]" needs one row);
            # a big-array carry would equally distort the figure
            acc = acc + sum(
                jnp.sum(leaf.astype(jnp.float32))
                for leaf in jax.tree_util.tree_leaves(out))
            return acc

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    timed = jax.jit(run, static_argnums=1)
    if warmup:
        # warm both static-n variants so compile time never leaks in
        _fence(timed(x, iters))
        _fence(timed(x, 0))
    # distinct inputs per timed call: remote transports may serve repeated
    # identical (executable, input) executions from a cache. Transport
    # round-trip jitter (tens of ms) is suppressed by taking the median of
    # several (total - baseline) measurements.
    measured = []
    for r in range(repeats):
        x1 = x + jnp.asarray((2 * r + 1) * 1e-7, x.dtype)
        x2 = x + jnp.asarray((2 * r + 2) * 1e-7, x.dtype)
        _fence(x1)
        _fence(x2)
        t0 = time.perf_counter()
        _fence(timed(x1, iters))
        total = time.perf_counter() - t0
        t0 = time.perf_counter()
        _fence(timed(x2, 0))
        base = time.perf_counter() - t0
        measured.append(max(total - base, 1e-9) / iters)
    measured.sort()
    return measured[len(measured) // 2]
