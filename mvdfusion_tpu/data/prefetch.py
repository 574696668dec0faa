"""Background scene prefetching.

The reference overlaps host data loading with GPU compute via torch
DataLoader workers (train.py:48-53, num_workers=4). Here a single background
thread drives the (GIL-releasing, internally multithreaded) native decoder
ahead of the training loop through a bounded queue — host decode overlaps
device steps without multiprocessing.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, List


class PrefetchIterator:
    """Wrap an index iterable + fetch function with lookahead prefetch."""

    def __init__(self, indices: Iterable, fetch: Callable, depth: int = 2):
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._indices = list(indices)
        self._fetch = fetch
        self._err = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            for idx in self._indices:
                self._q.put(("ok", self._fetch(idx)))
        except Exception as e:  # surface in consumer thread
            self._err = e
            self._q.put(("err", e))
            return
        self._q.put(("done", None))

    def __iter__(self) -> Iterator:
        while True:
            kind, item = self._q.get()
            if kind == "done":
                return
            if kind == "err":
                raise item
            yield item

    def __len__(self):
        return len(self._indices)
