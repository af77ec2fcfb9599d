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
    abort the run, not silently truncate the dataset. If the consumer
    abandons the iterator (exception in the loop body, early break, GC),
    the producer thread is unblocked and the source iterator is closed from
    the producer's own thread, so generator ``finally`` blocks (e.g. the
    decode thread-pool shutdown in ``ImageFolderDataset.batches``) run
    promptly instead of leaking.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            try:
                for item in it:
                    if not _put(item):
                        return
                _put(_END)
            except BaseException as e:  # noqa: BLE001 - forwarded to consumer
                _put(e)
        finally:
            close = getattr(it, "close", None)
            if close is not None:
                close()  # safe: same thread that iterates the generator

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        # drain so a producer blocked mid-put unblocks on its next timeout
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
