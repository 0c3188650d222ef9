"""Profiling / tracing hooks (the aux subsystem the reference lacks,
SURVEY §5: only wall-clock prints in the reference trainers).

``trace(logdir)`` wraps ``jax.profiler`` (view in TensorBoard/XProf or
Perfetto); ``StepTimer`` gives steady-state steps/sec with warmup skip and
host-sync-aware timing.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed steps (no-op if
    ``logdir`` is None)."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling steps/sec + seconds/batch, skipping warmup (compile) steps."""

    def __init__(self, warmup: int = 2, window: int = 50):
        self.warmup = warmup
        self.window = window
        self._times: list = []
        self._count = 0
        self._last = None

    def tick(self) -> Optional[float]:
        """Call once per step *after* the step's results are synced.
        Returns the rolling seconds/step (None during warmup)."""
        now = time.perf_counter()
        self._count += 1
        if self._count <= self.warmup:
            self._last = now
            return None
        if self._last is not None:
            self._times.append(now - self._last)
            self._times = self._times[-self.window :]
        self._last = now
        return float(np.mean(self._times)) if self._times else None

    @property
    def steps_per_sec(self) -> Optional[float]:
        if not self._times:
            return None
        return 1.0 / float(np.mean(self._times))


def param_count(tree) -> int:
    """Total parameter count (reference getModelSize, main_launch.py:23-36)."""
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def param_bytes(tree) -> int:
    return sum(
        int(np.prod(x.shape)) * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree)
    )
