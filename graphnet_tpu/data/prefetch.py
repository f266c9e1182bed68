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

    def set_epoch(self, epoch: int) -> None:
        """Forward epoch pinning to the wrapped loader (no-op if the
        inner loader has no shuffle schedule) — Trainer.fit sees this
        wrapper, not the loader inside it."""
        inner = getattr(self.loader, "set_epoch", None)
        if inner is not None:
            inner(epoch)

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


class EpochPipeline:
    """Warm cross-epoch prefetch: ONE background thread iterates the
    loader for all epochs (calling ``set_epoch`` per epoch) and eagerly
    ``device_put``s batches; the consumer pulls per-epoch slices with
    :meth:`epoch`.

    Re-wrapping a :class:`PrefetchingLoader` every epoch drains and
    restarts the pipeline at each boundary — measured ~14 ms per
    boundary on the 4-core e2e host, 18% of a 16-batch epoch at the
    canonical DynEdge shape (``docs/architecture.md`` §5).  Keeping one
    producer alive lets the host build epoch e+1's first batches while
    the device finishes epoch e.

    Epoch boundaries travel IN-BAND as queue markers, so there is no
    producer/consumer race on a shared counter.  ``close()`` stops the
    producer promptly (it checks a stop flag around every blocking
    put) — call it when training ends early (early stopping,
    exception), or use the context-manager form.

    Args:
        loader: re-iterable batch source (DataLoader, CachingLoader,
            MaterializedLoader ...); ``set_epoch`` is forwarded when
            present.
        n_epochs: number of epochs to stream, starting at
            ``start_epoch``.
        prefetch: queue depth in yielded items (stacked batches count
            as one).  Deeper absorbs host/device jitter; 4-8 measured
            best on the tunneled runtime.
        device: target device or sharding for ``jax.device_put``
            (None = default device).
        start_epoch: first epoch index (resume support).
    """

    def __init__(self, loader, n_epochs: int, prefetch: int = 4,
                 device=None, start_epoch: int = 0):
        self.loader = loader
        self.n_epochs = int(n_epochs)
        self.prefetch = max(1, int(prefetch))
        self.device = device
        self.start_epoch = int(start_epoch)
        self._q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._produce, daemon=True
        )
        self._started = False

    def _put(self, item) -> bool:
        """Blocking put that aborts promptly when close() is called."""
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _produce(self) -> None:
        try:
            for e in range(self.start_epoch, self.n_epochs):
                if self._stop.is_set():
                    return
                se = getattr(self.loader, "set_epoch", None)
                if se is not None:
                    se(e)
                for batch in self.loader:
                    if self.device is not None:
                        batch = jax.device_put(batch, self.device)
                    else:
                        batch = jax.device_put(batch)
                    if not self._put(("batch", batch)):
                        return
                if not self._put(("end", e)):
                    return
        except BaseException as exc:  # propagate into the consumer
            self._put(("error", exc))

    def epoch(self) -> Iterator:
        """Iterator over the NEXT epoch's batches (consume in order;
        each call ends at the next in-band epoch marker)."""
        if not self._started:
            self._thread.start()
            self._started = True
        while True:
            kind, payload = self._q.get()
            if kind == "batch":
                yield payload
            elif kind == "end":
                return
            else:
                raise payload

    def close(self) -> None:
        """Stop the producer (idempotent).  Safe mid-epoch: the thread
        exits at its next put/loop check."""
        self._stop.set()
        # unblock a producer waiting on a full queue
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

    def __enter__(self) -> "EpochPipeline":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class CachingLoader:
    """Materialise the wrapped loader's batches on first iteration, then
    replay them from memory — the host pipeline (SQL, graph building,
    padding, transfer) runs exactly once, and epochs >= 1 stream straight
    from the cache at device speed.

    Graph rebuilding is deterministic per event, so replaying padded
    batches is exact, not an approximation; only the batch *order* is
    re-randomised each epoch (``shuffle=True``).  The reference has no
    equivalent (its torch loader re-runs the Python pipeline every
    epoch); on TPU the padded dense batches are small enough to make
    caching the natural production mode for datasets that fit:

    * ``store="device"``: batches stay in HBM.  Canonical DynEdge shape
      (B=128, L=128, D=4) is ~0.4 MB/batch — 1 GB of HBM holds ~300k
      events.  Replay is free (no transfer, no host work).
    * ``store="host"``: batches are pulled back to pinned host numpy and
      re-``device_put`` on replay — bounded by host RAM instead of HBM.
      Note: on tunneled runtimes the D2H pull can permanently degrade
      subsequent transfers (see ``docs/architecture.md`` §2); prefer
      ``"device"`` unless the dataset truly exceeds HBM.

    Interop: yields the same ``EventBatch`` objects, so it drops into
    ``Trainer.fit`` / ``PrefetchingLoader`` anywhere a DataLoader fits.
    """

    def __init__(self, loader, shuffle: bool = True, seed: int = 0,
                 store: str = "device"):
        assert store in ("device", "host"), store
        self.loader = loader
        self.shuffle = shuffle
        self.seed = seed
        self.store = store
        self._cache: Optional[list] = None
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Pin the replay-shuffle schedule to ``epoch`` (see
        ``MaterializedLoader.set_epoch``); on a cold cache the epoch is
        ignored — the first iteration materialises in loader order."""
        self._epoch = int(epoch) if self._cache is not None else 0

    def __len__(self) -> int:
        if self._cache is not None:
            return len(self._cache)
        return len(self.loader)

    def _to_host(self, batch):
        import numpy as np

        return jax.tree_util.tree_map(
            lambda x: np.asarray(x), batch
        )

    def __iter__(self) -> Iterator:
        if self._cache is None:
            cache = []
            for batch in self.loader:
                if self.store == "host":
                    cache.append(self._to_host(batch))
                    yield batch
                else:
                    batch = jax.device_put(batch)
                    cache.append(batch)
                    yield batch
            self._cache = cache
            self._epoch = 1
            return
        order = range(len(self._cache))
        if self.shuffle:
            import numpy as np

            order = np.random.default_rng(
                self.seed + self._epoch
            ).permutation(len(self._cache))
        self._epoch += 1
        for i in order:
            b = self._cache[i]
            yield jax.device_put(b) if self.store == "host" else b
