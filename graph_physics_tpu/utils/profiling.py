"""Profiling/tracing hooks (SURVEY.md §5: the reference has none; the TPU
build adds jax.profiler traces + per-step throughput counters)."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace context; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Per-step graphs/sec + step-time EMA counter."""

    def __init__(self, ema: float = 0.98):
        self._ema = ema
        self._t = None
        self.step_time = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        if self._t is not None:
            dt = now - self._t
            self.step_time = (
                dt
                if self.step_time is None
                else self._ema * self.step_time + (1 - self._ema) * dt
            )
        self._t = now
        return self.step_time

    def graphs_per_sec(self, batch_size: int) -> Optional[float]:
        return batch_size / self.step_time if self.step_time else None
