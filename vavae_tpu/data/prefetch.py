"""Host-side input pipelining: background prefetch + threaded batch loads.

The training loops are device-bound; every millisecond the host spends
decoding images SERIALLY with the device idle is lost throughput (the
reference gets this from torch DataLoader worker processes — here a
daemon-thread producer with a bounded queue plays that role; PIL/numpy
release the GIL for the heavy parts).
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, TypeVar

T = TypeVar("T")

_END = object()


def prefetch(it: Iterator[T], depth: int = 2) -> Iterator[T]:
    """Run a producer iterator in a background thread with a bounded queue.

    Producer exceptions re-raise in the CONSUMER — a corrupt image must
    abort the run, not silently truncate the dataset.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)

    def worker():
        try:
            for item in it:
                q.put(item)
            q.put(_END)
        except BaseException as e:  # noqa: BLE001 - forwarded to consumer
            q.put(e)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
