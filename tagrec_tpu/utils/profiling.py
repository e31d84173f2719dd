"""Tracing / profiling subsystem.

The reference has only manual wall-clock timers (SURVEY.md §5: timers around
epoch training, eval, data loading).  Here profiling is first-class:

* ``trace(name)`` — ``jax.profiler.TraceAnnotation`` context for XLA traces
* ``start_trace/stop_trace`` — capture a device trace (TensorBoard-viewable)
* ``StepTimer`` — EMA step timing with examples/s derivation, usable as a
  context manager inside training loops
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


def trace(name: str):
    """Annotation context that shows up in captured XLA/TPU traces."""
    try:
        return jax.profiler.TraceAnnotation(name)
    except Exception:  # profiler unavailable on some backends
        return contextlib.nullcontext()


def start_trace(log_dir: str) -> None:
    jax.profiler.start_trace(log_dir)


def stop_trace() -> None:
    jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timer with EMA smoothing and throughput accounting.

    with timer.step(n_examples=512):
        run_train_step()
    print(timer.summary())
    """

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg_ms: Optional[float] = None
        self.total_steps = 0
        self.total_examples = 0
        self.total_time = 0.0

    @contextlib.contextmanager
    def step(self, n_examples: int = 0):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        ms = dt * 1e3
        self.avg_ms = ms if self.avg_ms is None else (
            self.ema * self.avg_ms + (1 - self.ema) * ms)
        self.total_steps += 1
        self.total_examples += n_examples
        self.total_time += dt

    @property
    def examples_per_sec(self) -> float:
        return self.total_examples / self.total_time if self.total_time else 0.0

    def summary(self) -> Dict[str, float]:
        return {
            "steps": self.total_steps,
            "avg_step_ms": round(self.avg_ms or 0.0, 3),
            "examples_per_sec": round(self.examples_per_sec, 1),
            "total_time_s": round(self.total_time, 3),
        }
