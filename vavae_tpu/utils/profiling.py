"""Profiling / step-timing utilities (aux subsystem; SURVEY.md §5.1).

The reference's closest equivalents are steps/sec logging with explicit
cuda.synchronize (train.py:224-226) and the CUDACallback epoch/peak-memory
logger (vavae/main.py:433-453). Here:

  - ``StepTimer``: wall-clock steps/sec with block_until_ready fencing
  - ``trace()``: context manager around jax.profiler for TensorBoard traces
  - ``device_memory_stats()``: live/peak HBM per device
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Iterator, Optional

import jax


class StepTimer:
    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._steps = 0

    def step(self) -> None:
        self._steps += 1

    def rate(self, sync_on: Any = None) -> float:
        """steps/sec since last reset; fences on ``sync_on`` if given."""
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - self._t0
        return self._steps / dt if dt > 0 else float("inf")


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace for TensorBoard / xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    stats = {}
    for d in jax.local_devices():
        try:
            m = d.memory_stats()
            if m:
                stats[str(d)] = {
                    "bytes_in_use": m.get("bytes_in_use", 0),
                    "peak_bytes_in_use": m.get("peak_bytes_in_use", 0),
                    "bytes_limit": m.get("bytes_limit", 0),
                }
        except Exception:
            pass
    return stats
