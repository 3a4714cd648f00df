"""Profiling/tracing hooks (SURVEY.md §5: the reference has only wall-clock
prints, model_test.py:103; here: jax.profiler traces + step timing)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """Capture a jax.profiler trace (viewable in TensorBoard / Perfetto)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Lightweight rolling step timer for the train loop."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.count = 0
        self.total = 0.0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.count += 1
        if self.count > self.warmup:
            self.total += dt
        return False

    @property
    def mean_step_time(self) -> float:
        n = self.count - self.warmup
        return self.total / n if n > 0 else 0.0

    @property
    def steps_per_sec(self) -> float:
        t = self.mean_step_time
        return 1.0 / t if t > 0 else 0.0

    def summary(self) -> Dict[str, float]:
        return {
            "mean_step_time_s": self.mean_step_time,
            "steps_per_sec": self.steps_per_sec,
        }


def annotate(name: str):
    """Named trace annotation for profiler timelines."""
    return jax.profiler.TraceAnnotation(name)
