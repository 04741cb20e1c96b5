"""Tracing / profiling helpers (SURVEY.md §5).

Reference: absent (at most time.time() prints). Here:
  * `trace(logdir)` — context manager around `jax.profiler.trace` producing
    TensorBoard/Perfetto traces of the XLA programs;
  * `fence` — a TRUE execution fence: `jax.block_until_ready` plus a
    one-element host fetch per output leaf. On well-behaved backends
    block_until_ready alone suffices; on this box's experimental `axon`
    TPU tunnel it returns before execution finishes (measured: a 3-second
    program "fenced" in 0.15 ms — docs/PERFORMANCE.md §1), so the host
    fetch is the only honest fence. Every timing helper here uses it.
  * `Timer` / `time_fn` — fence-timed wall clock;
  * `steps_per_second` — the throughput primitive.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Profile a block: `with trace('/tmp/tb'): run()` then inspect in
    TensorBoard (Profile tab) or Perfetto."""
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def fence(value):
    """Force `value`'s computation to fully execute before returning.

    Fetches one element of every array leaf to the host — a fetch cannot
    complete before the producing program does, unlike block_until_ready
    on the axon tunnel (see module docstring). Returns `value`.
    """
    jax.block_until_ready(value)
    for leaf in jax.tree_util.tree_leaves(value):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(jax.numpy.ravel(leaf)[:1]))
    return value


class Timer:
    """Fenced timer: `with Timer() as t: out = f(); t.block_on(out)`."""

    def __enter__(self):
        self.t0 = time.perf_counter()
        self.elapsed = None
        return self

    def block_on(self, value):
        fence(value)
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
        out = fence(fn(*args, **kw))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fence(fn(*args, **kw))
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2], out


def steps_per_second(
    fn: Callable, steps_per_call: int, *args, repeats: int = 3, **kw
) -> float:
    """Throughput of a rollout-like fn: steps_per_call / median_time."""
    dt, _ = time_fn(fn, *args, repeats=repeats, **kw)
    return steps_per_call / dt
