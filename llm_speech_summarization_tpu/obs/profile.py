"""Profiling / tracing helpers.

The reference has no tracing at all — only tqdm bars (SURVEY.md §5,
reference: trainer.py:269). Here:

  * ``trace(logdir)`` — context manager around ``jax.profiler`` producing a
    TensorBoard-viewable trace of device execution;
  * ``annotate(name)`` — ``jax.named_scope`` wrapper so stages (encoder /
    splice / llm / losses) are labeled inside traces;
  * ``StepTimer`` — host-side EMA step timer for the JSONL metrics stream.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: view with TensorBoard's profile plugin."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a region for profiler traces: ``with annotate("encoder"): ...``"""
    return jax.named_scope(name)


class StepTimer:
    """Host-side step timing with exponential smoothing."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema: Optional[float] = None
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.ema = dt if self.ema is None else (1 - self.alpha) * self.ema + self.alpha * dt
        self._last = now
        return self.ema
