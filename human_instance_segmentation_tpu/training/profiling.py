"""Tracing / profiling helpers.

The reference has no in-repo profiling (SURVEY §5: benchmarking via the
external sit4onnx CLI; throughput only visible through tqdm). Here:
- `trace(dir)` — context manager around jax.profiler for TensorBoard traces
- `StepTimer` — EMA step-time / throughput tracking for the train loop
- `chained_time(fn, *args)` — ground-truth latency of a jitted computation
  by chaining iterations inside one XLA program (host-side
  block_until_ready is not a reliable fence on every transport; see
  bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view in TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """EMA step timing + images/sec for host loops."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self._avg: Optional[float] = None
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self._avg = dt if self._avg is None else self.ema * self._avg + (1 - self.ema) * dt
        return dt

    @property
    def avg_step_s(self) -> float:
        return self._avg or 0.0

    def throughput(self, items_per_step: int) -> float:
        return items_per_step / self._avg if self._avg else 0.0


def chained_time(fn: Callable, *args, iters: int = 10) -> float:
    """Seconds per invocation of `fn(*args)` measured by chaining `iters`
    executions with a data dependency inside one jitted program."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(*a):
        def body(i, c):
            out = fn(*((a[0] + c,) + a[1:])) if a else fn()
            leaf = jax.tree.leaves(out)[0]
            return (jnp.mean(leaf) * 1e-12).astype(a[0].dtype if a else jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.asarray(0.0, a[0].dtype if a else jnp.float32))

    float(loop(*args))  # compile with the same static config as the timed call
    t0 = time.perf_counter()
    float(loop(*args))
    return (time.perf_counter() - t0) / iters
