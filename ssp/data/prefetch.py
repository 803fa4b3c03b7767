"""Background-thread batch prefetcher.

The reference hides decode latency behind 16 torch DataLoader workers
(``configs/*:training.workers_train``); here augmentation is on-device,
so a single decode/pad thread keeping a small queue full is enough to
overlap host IO with the device step.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterator


class Prefetcher:
    """Wrap an iterator; a daemon thread keeps ``depth`` items ready."""

    _SENTINEL = object()

    def __init__(self, it: Iterator[Any], depth: int = 4):
        self._queue: "queue.Queue[Any]" = queue.Queue(maxsize=max(depth, 1))
        self._error = None

        def worker() -> None:
            try:
                for item in it:
                    self._queue.put(item)
            except BaseException as e:  # surface in the consumer thread
                self._error = e
            finally:
                self._queue.put(self._SENTINEL)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self) -> "Prefetcher":
        return self

    def __next__(self) -> Any:
        item = self._queue.get()
        if item is self._SENTINEL:
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item
