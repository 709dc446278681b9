"""Lightweight step timing + optional device tracing.

The reference has no profiling at all (SURVEY.md §5); this adds
  * StepTimer: rolling steps/sec + per-stage wall-time accounting,
    surfaced in the tracker's scalar logs,
  * `device_trace(...)`: context manager around jax.profiler for a
    TensorBoard/Perfetto trace of the compiled step.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class StepTimer:
    """Rolling throughput and cumulative per-stage wall time."""

    def __init__(self, window: int = 50):
        self.window = window
        self._last: Optional[float] = None
        self._deltas = []
        self.stage_seconds: Dict[str, float] = defaultdict(float)
        self.stage_steps: Dict[str, int] = defaultdict(int)

    def tick(self, stage: str = "") -> None:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self._deltas.append(dt)
            if len(self._deltas) > self.window:
                self._deltas.pop(0)
            self.stage_seconds[stage] += dt
            self.stage_steps[stage] += 1
        self._last = now

    def reset_clock(self) -> None:
        """Call when entering a stage so compile time isn't attributed."""
        self._last = None

    @property
    def steps_per_sec(self) -> float:
        if not self._deltas:
            return 0.0
        return len(self._deltas) / sum(self._deltas)

    def summary(self) -> Dict[str, float]:
        out = {"steps_per_sec": round(self.steps_per_sec, 3)}
        for k in self.stage_seconds:
            out[f"seconds/{k}"] = round(self.stage_seconds[k], 2)
        return out


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
