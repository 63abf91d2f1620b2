# profiling.py — first-class tracing + throughput counters.
"""The reference has no profiling (SURVEY.md §5.1); here the samples/s
counter and device tracing are part of the framework surface:

- ``trace(dir)``: jax.profiler trace context (view in TensorBoard/XProf)
- ``Throughput``: rolling samples/s accounting, split by phase
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


@contextlib.contextmanager
def trace(log_dir: str | None):
    """jax.profiler trace context; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield


class Throughput:
    """Phase-tagged wall-clock accounting with a samples/s summary."""

    def __init__(self):
        self.t0 = time.time()
        self.samples = 0
        self.phase_time: Dict[str, float] = defaultdict(float)

    @contextlib.contextmanager
    def phase(self, name: str):
        t = time.time()
        try:
            yield
        finally:
            self.phase_time[name] += time.time() - t

    def add(self, n: int):
        self.samples += n

    @property
    def samples_per_sec(self) -> float:
        return self.samples / max(time.time() - self.t0, 1e-9)

    def summary(self) -> dict:
        total = time.time() - self.t0
        return {
            "samples": self.samples,
            "wall_s": round(total, 3),
            "samples_per_sec": round(self.samples_per_sec, 3),
            "phases": {k: round(v, 3) for k, v in self.phase_time.items()},
        }
