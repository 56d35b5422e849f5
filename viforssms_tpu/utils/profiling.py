"""Profiling hooks — jax.profiler traces + step timers.

Replaces the reference's vestigial (imported, never used) TF ``timeline`` and
its wall-clock summaries (``..._learn_theta.py:704-727``, SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA/XPlane trace viewable in Perfetto/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling steps/s counter to attach to the metric stream."""

    def __init__(self):
        self._t0 = time.perf_counter()
        self._steps = 0

    def tick(self, n: int = 1) -> dict:
        self._steps += n
        elapsed = time.perf_counter() - self._t0
        return {
            "elapsed_s": elapsed,
            "steps_per_sec": self._steps / max(elapsed, 1e-9),
        }
