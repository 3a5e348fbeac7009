"""Metrics / observability: stage timers and throughput counters.

The reference has no metrics subsystem (SURVEY.md section 5 — only log lines
and a frame-progress print). This adds the two things a serving deployment
needs: per-stage wall timings and a frames/sec counter, plus a hook into
``jax.profiler`` for device-side traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class StageTimer:
    """Accumulates wall-clock per named stage. NOTE: JAX dispatch is async;
    wrap the region so it ends with a block_until_ready (or use
    ``trace_device`` for true device time)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return {k: self.totals[k] / max(self.counts[k], 1) * 1e3
                for k in sorted(self.totals)}  # ms per call

    def report(self) -> str:
        return " | ".join(f"{k}: {v:.2f}ms" for k, v in self.summary().items())


class FpsCounter:
    """Sliding-window frames/sec (the north-star serving metric)."""

    def __init__(self, window: int = 100):
        self.window = window
        self.stamps = []

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        self.stamps.append(now)
        if len(self.stamps) > self.window:
            self.stamps.pop(0)
        if len(self.stamps) >= 2:
            return (len(self.stamps) - 1) / (self.stamps[-1] - self.stamps[0])
        return None


@contextlib.contextmanager
def trace_device(logdir: str):
    """Capture a jax.profiler device trace for the enclosed region; view with
    tensorboard/xprof."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
