"""Host-side prefetching: overlap dataloading/collation with device compute.

The reference leans on torch DataLoader workers with ``prefetch_factor=2``
(``data/dataloader.py:26-51``).  Here a background thread runs the Python
loader (SQL queries, graph building, padding) and eagerly ``device_put``s
batches, so the accelerator never waits on the host between steps —
double-buffered input pipeline (SURVEY.md §7 "host prefetch →
jax.device_put double-buffered").
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax


class PrefetchingLoader:
    """Wrap any EventBatch iterable with background prefetch + device_put.

    Args:
        loader: the underlying DataLoader (re-iterable).
        prefetch: number of batches to stage ahead (2 = double buffer).
        device: target device or sharding for ``jax.device_put``
            (None = default device).
    """

    def __init__(self, loader, prefetch: int = 2, device=None):
        self.loader = loader
        self.prefetch = max(1, prefetch)
        self.device = device

    def __len__(self) -> int:
        return len(self.loader)

    def __iter__(self) -> Iterator:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err: list = []

        def worker() -> None:
            try:
                for batch in self.loader:
                    if self.device is not None:
                        batch = jax.device_put(batch, self.device)
                    else:
                        batch = jax.device_put(batch)
                    q.put(batch)
            except BaseException as e:  # propagate into the consumer
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()
        if err:
            raise err[0]
