"""Profiling / step-timing utilities (aux subsystem; SURVEY.md §5.1).

The reference's closest equivalents are steps/sec logging with explicit
cuda.synchronize (train.py:224-226) and the CUDACallback epoch/peak-memory
logger (vavae/main.py:433-453). Here:

  - ``StepTimer``: wall-clock steps/sec fenced by a VALUE FETCH
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
        """steps/sec since last reset; fences on ``sync_on`` if given.

        The fence FETCHES a value: on the tunneled axon backend
        block_until_ready can return before completion (CLAUDE.md), so any
        array leaf of ``sync_on`` is pulled to host via np.asarray."""
        if sync_on is not None:
            import numpy as np

            leaves = [x for x in jax.tree_util.tree_leaves(sync_on)
                      if hasattr(x, "dtype")]
            if leaves:
                np.asarray(jax.device_get(leaves[0]))
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


class WindowTracer:
    """Trace a window of training steps, driven by env vars.

    Set ``VAVAE_PROFILE=/dir`` on any training CLI to capture a
    TensorBoard/xprof trace of steps [VAVAE_PROFILE_AT,
    VAVAE_PROFILE_AT + VAVAE_PROFILE_STEPS) (defaults 10 and 5 — past
    compile and the donated-state settle steps, per the benchmarking
    rules in CLAUDE.md). Call ``step(i, sync_on=...)`` once per step and
    ``close()`` at loop end (also stops a window cut short by early
    exit/preemption). Rank 0 only; no-op when the env var is unset."""

    def __init__(self) -> None:
        import os

        self.log_dir = os.environ.get("VAVAE_PROFILE")
        if self.log_dir and jax.process_index() != 0:
            self.log_dir = None
        self.at = int(os.environ.get("VAVAE_PROFILE_AT", "10"))
        self.n = int(os.environ.get("VAVAE_PROFILE_STEPS", "5"))
        self._active = False
        self._done = False
        self._start_i = 0

    def step(self, i: int, sync_on: Any = None) -> None:
        if not self.log_dir:
            return
        # >= (not ==): a checkpoint-resumed loop feeds absolute step numbers
        # that may already be past `at` — trace the first window we see
        if i >= self.at and not self._active and not self._done:
            if sync_on is not None:
                jax.block_until_ready(sync_on)
            jax.profiler.start_trace(self.log_dir)
            self._active = True
            self._start_i = i
        elif self._active and i >= self._start_i + self.n:
            if sync_on is not None:
                jax.block_until_ready(sync_on)
            jax.profiler.stop_trace()
            self._active = False
            self._done = True

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True


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
