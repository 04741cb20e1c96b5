"""Tracing / profiling helpers (SURVEY.md §5).

Reference: absent (at most time.time() prints). Here:
  * `trace(logdir)` — context manager around `jax.profiler.trace` producing
    TensorBoard/Perfetto traces of the XLA programs;
  * `Timer` / `time_fn` — block_until_ready-fenced wall timing (the only
    honest way to time async-dispatch JAX);
  * `steps_per_second` — the benchmark primitive used by bench.py.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Profile a block: `with trace('/tmp/tb'): run()` then inspect in
    TensorBoard (Profile tab) or Perfetto."""
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Fenced timer: `with Timer() as t: out = f(); t.block_on(out)`."""

    def __enter__(self):
        self.t0 = time.perf_counter()
        self.elapsed = None
        return self

    def block_on(self, value):
        jax.block_until_ready(value)
        self.elapsed = time.perf_counter() - self.t0
        return value

    def __exit__(self, *exc):
        if self.elapsed is None:
            self.elapsed = time.perf_counter() - self.t0
        return False


def time_fn(fn: Callable, *args, repeats: int = 3, warmup: int = 1, **kw):
    """Median fenced wall time of fn(*args, **kw) (compile excluded by the
    warmup calls). Returns (median_seconds, last_output)."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2], out


def steps_per_second(
    fn: Callable, steps_per_call: int, *args, repeats: int = 3, **kw
) -> float:
    """Throughput of a rollout-like fn: steps_per_call / median_time."""
    dt, _ = time_fn(fn, *args, repeats=repeats, **kw)
    return steps_per_call / dt
