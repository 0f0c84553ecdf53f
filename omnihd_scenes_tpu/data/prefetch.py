"""Threaded batch prefetching.

Parity target: the reference's ``workers_per_gpu=4`` DataLoader worker
processes (``datasets/builder.py``, SURVEY.md §3.1 "a real process
boundary via torch DataLoader").  Here threads suffice: the native
decode path (csrc/host_ops.cpp) and NumPy release the GIL, so sample
preparation overlaps JAX dispatch on the single host core.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator


class PrefetchIterator:
    """Wraps any batch iterator with a background prefetch thread."""

    _SENTINEL = object()

    def __init__(self, iterable, buffer_size: int = 2):
        self._iterable = iterable
        self._q: queue.Queue = queue.Queue(maxsize=buffer_size)
        self._err = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for item in self._iterable:
                self._q.put(item)
        except BaseException as e:  # propagate into the consumer
            self._err = e
        finally:
            self._q.put(self._SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch(iterable, buffer_size: int = 2) -> Iterator:
    """Prefetch batches from ``iterable`` on a background thread."""
    return PrefetchIterator(iterable, buffer_size)
