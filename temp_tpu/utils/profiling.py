"""Profiling and observability helpers.

The reference had no tracing at all (SURVEY.md §5.1: --log-gpu-memory is dead
code, objgraph is a vendored manual tool). Here profiling is first-class:

- `trace(dir)`: context manager around jax.profiler (view in XProf/TensorBoard),
- `StepTimer`: wall-clock EMA of step latency with device sync,
- `device_memory_stats()`: live HBM usage per device.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/temp_tpu_trace"):
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema: Optional[float] = None
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_on=None) -> float:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - self._t0
        self.ema = dt if self.ema is None else (
            self.alpha * dt + (1 - self.alpha) * self.ema)
        return dt


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use_mb": s.get("bytes_in_use", 0) / 1e6,
                "peak_bytes_mb": s.get("peak_bytes_in_use", 0) / 1e6,
                "bytes_limit_mb": s.get("bytes_limit", 0) / 1e6,
            }
        except Exception:
            out[str(d)] = {}
    return out
