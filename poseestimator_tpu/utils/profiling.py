"""Profiling hooks: per-stage device timings and jax.profiler traces.

SURVEY.md section 5 equivalent of the reference's colorama ``timer_print``
(main_realsense.py:21-25): a timer that actually measures device work (via
``block_until_ready``) plus an opt-in XLA profiler trace for deep dives.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class StageTimer:
    """Collects per-stage wall times with device synchronization."""

    def __init__(self):
        self.timings_ms: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        """Time a block; pass the block's output array as ``sync`` afterwards
        via ``timer.sync(name, out)`` or let the context just measure wall."""
        t0 = time.perf_counter()
        yield
        self.timings_ms[name] = (time.perf_counter() - t0) * 1000.0

    def timed(self, name: str, fn, *args, **kwargs):
        """Run fn, block on its outputs, record the true device time."""
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        self.timings_ms[name] = (time.perf_counter() - t0) * 1000.0
        return out


@contextlib.contextmanager
def xla_trace(log_dir: Optional[str]):
    """jax.profiler trace scope; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
