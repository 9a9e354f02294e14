"""Host-side prefetching iterator.

ref: the reference overlaps dataloading with GPU compute via torch
DataLoader(num_workers=2, pin_memory=True) worker processes
(train_mp3d.py:404-413, 564-573). Here a thread pool does the same job —
h5py/PIL/JPEG decode release the GIL, and the device scan runs async — so
chunk N+1 loads while chunk N computes.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional, Sequence


def prefetch_iterator(fetch: Callable[[int], object], indices: Sequence[int],
                      num_workers: int = 2, buffer: int = 4) -> Iterator:
    """Yield fetch(i) for i in indices, loading `buffer` items ahead with
    `num_workers` threads. Order-preserving."""
    if num_workers <= 0:
        for i in indices:
            yield fetch(i)
        return
    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        pending = []
        it = iter(indices)
        try:
            for _ in range(buffer):
                pending.append(pool.submit(fetch, next(it)))
        except StopIteration:
            pass
        while pending:
            fut = pending.pop(0)
            try:
                pending.append(pool.submit(fetch, next(it)))
            except StopIteration:
                pass
            yield fut.result()
