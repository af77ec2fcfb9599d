"""Preemption-safe training: catch SIGTERM/SIGINT, finish the in-flight step,
checkpoint, exit cleanly.

The reference has no failure handling (SURVEY.md §5.3 — recovery is "resume
from the newest checkpoint" only). TPU pods ARE preempted in production
(maintenance events send SIGTERM); this hook turns a preemption into a clean
checkpoint + resume instead of losing up to ckpt_every steps of work.
"""
from __future__ import annotations

import signal
import threading
from typing import Iterable, Optional


class PreemptionGuard:
    """Install as a context manager around the training loop; poll
    ``should_stop`` once per step (cheap: a bool read)."""

    def __init__(self, signals: Iterable[int] = (signal.SIGTERM,)):
        self._signals = tuple(signals)
        self._stop = threading.Event()
        self._prev = {}

    def _handler(self, signum, frame):
        self._stop.set()

    def __enter__(self) -> "PreemptionGuard":
        for s in self._signals:
            try:
                self._prev[s] = signal.signal(s, self._handler)
            except (ValueError, OSError):  # non-main thread / unsupported
                pass
        return self

    def __exit__(self, *exc):
        for s, prev in self._prev.items():
            try:
                signal.signal(s, prev)
            except (ValueError, OSError):
                pass
        return False

    @property
    def should_stop(self) -> bool:
        return self._stop.is_set()

    def request_stop(self) -> None:  # tests / manual triggering
        self._stop.set()
