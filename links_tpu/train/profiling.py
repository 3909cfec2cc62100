"""Profiling / throughput instrumentation (SURVEY.md §5: absent in the
reference — `time()` imported but unused).

``trace(dir)``: jax.profiler trace context (view in TensorBoard /
xprof). ``Throughput``: poses/sec/chip counter — the BASELINE metric.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/links_tpu_trace"):
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Counts poses/sec across steps; divide by chip count for per-chip."""

    def __init__(self, n_chips: int = 1):
        self.n_chips = n_chips
        self.reset()

    def reset(self):
        self._poses = 0
        self._t0 = time.perf_counter()

    def count(self, n_poses: int):
        self._poses += n_poses

    @property
    def poses_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._poses / dt if dt > 0 else 0.0

    @property
    def poses_per_sec_per_chip(self) -> float:
        return self.poses_per_sec / self.n_chips


def step_time(fn, *args, iters: int = 10, warmup: int = 2, **kw) -> float:
    """Median wall time of a jitted callable (blocks on the first output
    leaf)."""
    times = []
    for i in range(warmup + iters):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        if i >= warmup:
            times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
