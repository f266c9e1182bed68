"""Disk-materialised batch store: pack padded batches once, replay forever.

SURVEY.md §7 ("hard parts") flags SQLite random-access throughput feeding
a pod and suggests pre-materialising padded buckets to disk.  This module
is that production input path:

* :func:`materialize` — run the full host pipeline (SQL queries, graph
  building, padding/collation) ONE time, streaming every
  :class:`~graphnet_tpu.batch.EventBatch` to a directory of contiguous
  binary files grouped by batch shape.  An offline ETL step, like
  :class:`~graphnet_tpu.data.dataconverter.DataConverter` — run it in its
  own process (pulling device batches back to host is a D2H readback,
  which on tunneled runtimes degrades subsequent ``device_put``
  throughput for that process; see ``docs/architecture.md`` §2).
* :class:`MaterializedLoader` — replay the packed batches from
  ``np.memmap`` views (zero-copy reads straight from the page cache) with
  fresh batch-order shuffling per epoch.  Every epoch of every later run
  costs one sequential read + ``device_put`` per batch — no SQL, no graph
  build, no padding.

Compared to :class:`~graphnet_tpu.data.prefetch.CachingLoader` (which
materialises into HBM or host RAM within one process), the disk store is
bounded by disk, persists across processes/preemptions, and can be packed
once per dataset and shared by every training run.  Graph building is
deterministic per event, so the replay is exact, not an approximation —
only the batch order differs between epochs.

The reference has no equivalent: its torch ``DataLoader`` re-runs the
Python pipeline (SQL + per-event graph build) every epoch
(``/root/reference/src/graphnet/data/dataloader.py:26-51``).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import numpy as np

from graphnet_tpu.batch import EventBatch

_VERSION = 1
_META = "meta.json"

_OPTIONAL_FIELDS = (
    "edges",
    "edge_mask",
    "event_weight",
    "packed_f",
    "packed_i",
    "packed_nl",
)


def _tuplify(x):
    """JSON round-trips tuples as lists; restore nested tuples (the
    ``label_spec`` static field must be hashable for jit caching)."""
    if isinstance(x, list):
        return tuple(_tuplify(i) for i in x)
    return x


def _batch_leaves(batch: EventBatch) -> Dict[str, np.ndarray]:
    """Flatten an EventBatch into named host arrays (stable order)."""
    leaves = {
        "x": batch.x,
        "mask": batch.mask,
        "n_pulses": batch.n_pulses,
    }
    for k in sorted(batch.labels):
        leaves[f"labels/{k}"] = batch.labels[k]
    for k in sorted(batch.node_labels):
        leaves[f"node_labels/{k}"] = batch.node_labels[k]
    for name in _OPTIONAL_FIELDS:
        v = getattr(batch, name)
        if v is not None:
            leaves[name] = v
    return {k: np.ascontiguousarray(v) for k, v in leaves.items()}


def _group_key(leaves: Dict[str, np.ndarray], label_spec) -> str:
    sig = [
        (name, str(a.dtype), list(a.shape)) for name, a in leaves.items()
    ]
    return json.dumps({"leaves": sig, "label_spec": label_spec})


class _GroupWriter:
    def __init__(self, root: str, gi: int, leaves: Dict[str, np.ndarray],
                 label_spec):
        self.dir = os.path.join(root, f"g{gi:03d}")
        os.makedirs(self.dir, exist_ok=True)
        self.n = 0
        self.names: List[str] = list(leaves)
        self.meta = {
            "dir": os.path.basename(self.dir),
            "label_spec": label_spec,
            "leaves": [
                {
                    "name": name,
                    "file": f"leaf_{i:03d}.bin",
                    "dtype": str(a.dtype),
                    "shape": list(a.shape),
                }
                for i, (name, a) in enumerate(leaves.items())
            ],
        }
        self._fh = [
            open(os.path.join(self.dir, m["file"]), "wb")
            for m in self.meta["leaves"]
        ]

    def append(self, leaves: Dict[str, np.ndarray]) -> None:
        for fh, m in zip(self._fh, self.meta["leaves"]):
            fh.write(leaves[m["name"]].tobytes())
        self.n += 1

    def close(self) -> dict:
        for fh in self._fh:
            fh.close()
        self.meta["n"] = self.n
        return self.meta


def materialize(loader, path: str, overwrite: bool = False) -> dict:
    """Pack every batch of ``loader`` into a replayable store at ``path``.

    Offline ETL step — run it once per dataset (in its own process on
    tunneled runtimes; see module docstring).  Returns the written
    metadata (also stored as ``meta.json``).
    """
    meta_path = os.path.join(path, _META)
    if os.path.exists(meta_path):
        if not overwrite:
            raise FileExistsError(
                f"{meta_path} exists; pass overwrite=True to repack"
            )
        # invalidate BEFORE truncating any leaf file: a crash mid-repack
        # (or a concurrent reader) must see "no store", never a stale
        # meta.json pointing at half-rewritten data
        os.remove(meta_path)
    os.makedirs(path, exist_ok=True)
    writers: Dict[str, _GroupWriter] = {}
    n_batches = 0
    for batch in loader:
        host = jax.tree_util.tree_map(np.asarray, batch)
        leaves = _batch_leaves(host)
        key = _group_key(leaves, host.label_spec)
        w = writers.get(key)
        if w is None:
            w = writers[key] = _GroupWriter(
                path, len(writers), leaves, host.label_spec
            )
        w.append(leaves)
        n_batches += 1
    if n_batches == 0:
        raise ValueError("loader yielded no batches; nothing to pack")
    meta = {
        "version": _VERSION,
        "n_batches": n_batches,
        "groups": [w.close() for w in writers.values()],
    }
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, meta_path)  # meta.json appearing = pack complete
    return meta


class _Group:
    def __init__(self, root: str, meta: dict):
        self.n = meta["n"]
        self.label_spec = _tuplify(meta["label_spec"])
        self.maps: Dict[str, np.memmap] = {}
        for m in meta["leaves"]:
            shape = (self.n, *m["shape"])
            self.maps[m["name"]] = np.memmap(
                os.path.join(root, meta["dir"], m["file"]),
                dtype=np.dtype(m["dtype"]),
                mode="r",
                shape=shape,
            )

    def batch(self, i: int) -> EventBatch:
        leaves = {name: mm[i] for name, mm in self.maps.items()}
        labels = {
            k.split("/", 1)[1]: v
            for k, v in leaves.items()
            if k.startswith("labels/")
        }
        node_labels = {
            k.split("/", 1)[1]: v
            for k, v in leaves.items()
            if k.startswith("node_labels/")
        }
        return EventBatch(
            x=leaves["x"],
            mask=leaves["mask"],
            n_pulses=leaves["n_pulses"],
            labels=labels,
            node_labels=node_labels,
            label_spec=self.label_spec,
            **{f: leaves.get(f) for f in _OPTIONAL_FIELDS},
        )


class MaterializedLoader:
    """Replay a :func:`materialize`d batch store.

    Batches stream from ``np.memmap`` views (the OS page cache serves
    repeat epochs from RAM) through one ``device_put`` each; order is
    re-shuffled per epoch.  Drop-in anywhere a DataLoader fits
    (``Trainer.fit``, :class:`~graphnet_tpu.data.prefetch.PrefetchingLoader`).

    Args:
    Multi-host: pass ``process_index``/``process_count`` (e.g.
    ``jax.process_index()``/``jax.process_count()``) and each process
    reads a disjoint, SHAPE-ALIGNED shard: at step ``t`` every process
    serves a batch from the same shape group (hosts assembling a global
    array must agree on its shape), drawn from its own slice of that
    group's shared permutation, truncated to equal per-process step
    counts so collectives stay in lockstep.  Both the per-group
    permutations and the step→group schedule are seed+epoch-
    deterministic, so all hosts agree without communicating.

    Args:
        path: directory written by :func:`materialize`.
        shuffle: re-randomise batch order each epoch.
        seed: shuffle seed (epoch index is folded in).
        device: target device or sharding for ``jax.device_put``
            (None = default device).
        to_device: False yields host numpy batches (memmap views) with
            NO ``device_put`` — for consumers that assemble global
            arrays themselves (multi-host ``shard_host_local``) or must
            stay off-device.
        process_index / process_count: this host's shard of the batch
            stream (None = serve everything).
        stack_k: >1 groups consecutive same-shape batches, stacks their
            leaves host-side and transfers the stack in ONE
            ``device_put``, yielding :class:`~graphnet_tpu.batch.
            StackedBatches` (the ``DataLoader(stack_k=k)`` protocol —
            pairs with ``Trainer(steps_per_dispatch=k)``); tunneled
            runtimes pay per transfer dispatch, so this cuts delivery
            overhead k-fold.
    """

    def __init__(self, path: str, shuffle: bool = True, seed: int = 0,
                 device=None, to_device: bool = True,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None,
                 stack_k: int = 0):
        with open(os.path.join(path, _META)) as f:
            meta = json.load(f)
        if meta.get("version") != _VERSION:
            raise ValueError(
                f"unsupported store version {meta.get('version')!r}"
            )
        self.path = path
        self.shuffle = shuffle
        self.seed = seed
        self.device = device
        self.to_device = to_device
        self.stack_k = int(stack_k)
        self._groups = [_Group(path, g) for g in meta["groups"]]
        self._index: List[Tuple[int, int]] = [
            (gi, i)
            for gi, g in enumerate(self._groups)
            for i in range(g.n)
        ]
        self._epoch = 0
        if (process_index is None) != (process_count is None):
            raise ValueError(
                "pass process_index and process_count together"
            )
        if process_count is not None:
            if not 0 <= process_index < process_count:
                raise ValueError(
                    f"process_index {process_index} out of range for "
                    f"process_count {process_count}"
                )
            if not any(
                g.n >= process_count for g in self._groups
            ):
                raise ValueError(
                    f"no shape group has >= {process_count} batches; "
                    "nothing can be sharded in lockstep"
                )
            # no silent caps: per-group lockstep truncation drops
            # g.n % P batches per group, which can be a large fraction
            # when small/ragged shape groups dominate
            dropped = sum(g.n % process_count for g in self._groups)
            if dropped:
                from graphnet_tpu.utils.logging import Logger

                Logger(__name__).warning(
                    f"shape-aligned sharding over {process_count} "
                    f"processes drops {dropped}/{len(self._index)} "
                    "batches (per-group remainders); repack with "
                    "batch counts divisible by process_count to "
                    "serve everything"
                )
        self.process_index = process_index
        self.process_count = process_count

    @classmethod
    def from_loader(cls, loader, path: str, **kwargs
                    ) -> "MaterializedLoader":
        """Open ``path``, packing it first from ``loader`` if absent."""
        if not os.path.exists(os.path.join(path, _META)):
            materialize(loader, path)
        return cls(path, **kwargs)

    def set_epoch(self, epoch: int) -> None:
        """Pin the shuffle schedule to ``epoch`` (the torch
        ``DistributedSampler.set_epoch`` pattern).  ``Trainer.fit``
        calls this at every epoch start when available, which makes a
        resumed run replay exactly the batch order of the uninterrupted
        one — without it, a fresh loader restarts its internal epoch
        counter at 0."""
        self._epoch = int(epoch)

    def __len__(self) -> int:
        if self.process_count is not None:
            return sum(
                g.n // self.process_count for g in self._groups
            )
        return len(self._index)

    def _epoch_order(self) -> List[Tuple[int, int]]:
        """(group, batch) sequence for this epoch (deterministic in
        seed+epoch; identical on every process)."""
        rng = np.random.default_rng(self.seed + self._epoch)
        if self.process_count is None:
            order = np.arange(len(self._index))
            if self.shuffle:
                order = rng.permutation(order)
            return [self._index[j] for j in order]
        # shape-aligned shards: per group, a SHARED permutation sliced
        # disjointly per process; the step->group schedule is shared, so
        # at any step every process serves the same batch shape
        mine: List[Iterator[int]] = []
        schedule: List[int] = []
        for gi, g in enumerate(self._groups):
            order = np.arange(g.n)
            if self.shuffle:
                order = rng.permutation(order)
            per = g.n // self.process_count
            lo = self.process_index * per
            mine.append(iter(order[lo : lo + per].tolist()))
            schedule.extend([gi] * per)
        sched = np.asarray(schedule, dtype=np.int64)
        if self.shuffle:
            sched = rng.permutation(sched)
        return [(int(gi), next(mine[gi])) for gi in sched]

    def __iter__(self) -> Iterator[EventBatch]:
        order = self._epoch_order()
        self._epoch += 1
        if self.stack_k > 1 and self.to_device:
            yield from self._iter_stacked(order)
            return
        for gi, i in order:
            batch = self._groups[gi].batch(i)
            if not self.to_device:
                yield batch
            elif self.device is not None:
                yield jax.device_put(batch, self.device)
            else:
                yield jax.device_put(batch)

    def _iter_stacked(self, order) -> Iterator:
        """Group CONSECUTIVE same-shape batches in the epoch order,
        ``np.stack`` their (memmap) leaves host-side and ``device_put``
        the stack once — one transfer and (with the Trainer's
        ``steps_per_dispatch`` scan) one dispatch per ``stack_k``
        steps, mirroring ``DataLoader(stack_k=k)``.  Consecutive-run
        grouping (never reordering) keeps the multi-host shape-aligned
        schedule in lockstep; group-boundary remainders are yielded as
        single batches."""
        from graphnet_tpu.batch import StackedBatches

        def flush(group):
            if len(group) == self.stack_k:
                stacked = jax.tree_util.tree_map(
                    lambda *xs: np.stack(xs), *group
                )
                yield StackedBatches(
                    batches=(
                        jax.device_put(stacked, self.device)
                        if self.device is not None
                        else jax.device_put(stacked)
                    ),
                    k=self.stack_k,
                )
            else:
                for b in group:
                    yield (
                        jax.device_put(b, self.device)
                        if self.device is not None
                        else jax.device_put(b)
                    )

        group: List[EventBatch] = []
        last_gi = None
        for gi, i in order:
            if last_gi is not None and (
                gi != last_gi or len(group) == self.stack_k
            ):
                yield from flush(group)
                group = []
            group.append(self._groups[gi].batch(i))
            last_gi = gi
        if group:
            yield from flush(group)
