"""Tracing / profiling instrumentation.

The reference's only instrumentation is wall-clock subprocess timing
surfaced as ``X-SIC-*`` HTTP headers (reference: webapp.py:41-48) and tqdm
progress bars.  This module adds what a TPU deployment actually needs:

- :class:`StageTimer` — named wall-clock stages, exported in the same
  ``X-SIC-*`` header format for service parity;
- :func:`profile_trace` — ``jax.profiler`` trace context writing
  TensorBoard-compatible traces (xplane) for device-level analysis;
- :func:`timed_stage` — annotates a region in both (TraceAnnotation shows
  up inside the device trace timeline).
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class StageTimer:
    """Accumulates named stage durations (ms)."""

    def __init__(self):
        self.stages: Dict[str, float] = {}
        self._order = []

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            ms = (time.perf_counter() - t0) * 1000.0
            if name not in self.stages:
                self._order.append(name)
            self.stages[name] = self.stages.get(name, 0.0) + ms

    @property
    def total_ms(self) -> float:
        return sum(self.stages.values())

    def headers(self, stage: Optional[str] = None) -> Dict[str, str]:
        """X-SIC-* header dict (reference format: webapp.py:41-48), plus a
        per-stage breakdown header."""
        name = stage or "+".join(self._order)
        return {
            "X-SIC-Stage": name,
            "X-SIC-Elapsed-MS": str(int(self.total_ms)),
            "X-SIC-Elapsed-S": f"{self.total_ms / 1000.0:.3f}",
            "X-SIC-Stage-Breakdown": ";".join(
                f"{k}={self.stages[k]:.1f}ms" for k in self._order),
        }


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler device trace into ``log_dir`` (view with
    TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed_stage(timer: Optional[StageTimer], name: str):
    """StageTimer + device-trace annotation in one context."""
    ctx = timer.stage(name) if timer is not None else contextlib.nullcontext()
    with ctx, jax.profiler.TraceAnnotation(name):
        yield
