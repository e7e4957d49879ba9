"""Profiling / tracing utilities.

The reference's only observability is ad-hoc ``time.time()`` spans and a
globally-enabled ``torch.autograd.set_detect_anomaly(True)`` debugging
artifact that slows every backward (``packages/ffdnet/test_ffdnet_ipol.py:26``
— deliberately not replicated). Here: ``jax.profiler`` traces viewable in
TensorBoard/Perfetto, named annotation spans, and a simple step timer.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax


@contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with trace('/tmp/trace'): run_step()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in profiler timelines (usable as decorator/context)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Blocking wall-clock timer for jitted steps; keeps a rolling history."""

    def __init__(self):
        self.history: list[float] = []

    @contextmanager
    def measure(self):
        """``with timer.measure() as h: h['out'] = step(...)`` — blocks on
        ``h['out']`` before recording."""
        holder: dict = {}
        t0 = time.perf_counter()
        yield holder
        if "out" in holder:
            jax.block_until_ready(holder["out"])
        self.history.append(time.perf_counter() - t0)

    @property
    def best(self) -> float:
        return min(self.history)

    @property
    def mean(self) -> float:
        return sum(self.history) / len(self.history)
