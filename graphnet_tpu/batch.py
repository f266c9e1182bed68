"""Dense-padded event batches — the core data structure of the TPU framework.

The reference (GraphNeT) batches irregular per-event graphs by concatenating
node sets and carrying a ``batch`` index vector (PyG ``Batch``;
``/root/reference/src/graphnet/data/dataloader.py:12-18``).  That layout forces
sparse gather/scatter kernels.  On TPU we instead use a dense-padded layout

    ``x: [B, L, D]`` node features, ``mask: [B, L]`` validity,

chosen so that every hot op (kNN, EdgeConv, attention, pooling) is a batched
dense op that XLA tiles straight onto the MXU.  Events are grouped into
length *buckets* (power-of-two-ish L) so only a handful of shapes are ever
compiled — the policy mirrors the reference's own ``LenMatchBatchSampler``
(``/root/reference/src/graphnet/data/dataset/samplers.py:160``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class EventBatch:
    """A batch of padded events.

    Attributes:
        x: ``[B, L, D]`` float node (pulse) features, zero-padded.
        mask: ``[B, L]`` bool; True where the node is a real pulse.
        n_pulses: ``[B]`` int32 number of valid pulses per event.
        labels: dict of per-event truth arrays, each ``[B]`` or ``[B, d]``.
        node_labels: dict of per-node truth arrays, each ``[B, L]``.
        edges: optional precomputed neighbor indices ``[B, L, k]`` (static-edge
            models); None when the backbone computes its own (DynEdge).
        edge_mask: optional ``[B, L, k]`` bool mask for ``edges``.
        event_weight: optional ``[B]`` float loss weights per event.  Used by
            the Trainer to pad ragged batches up to a mesh-divisible size:
            real events carry ``B_padded / B_real`` and pad events ``0`` so
            the plain-mean loss reduction equals the unpadded batch exactly.
    """

    x: jax.Array
    mask: jax.Array
    n_pulses: jax.Array
    labels: Dict[str, jax.Array] = struct.field(default_factory=dict)
    node_labels: Dict[str, jax.Array] = struct.field(default_factory=dict)
    edges: Optional[jax.Array] = None
    edge_mask: Optional[jax.Array] = None
    event_weight: Optional[jax.Array] = None
    # Packed-label transport: all float labels concatenated into one
    # ``[B, Kf]`` block, int/bool labels into one ``[B, Ki]`` int32 block,
    # node labels into ``[B, L, Kn]``, with the (static) column layout in
    # ``label_spec``.  Keeping labels packed until inside the consumer's
    # jit keeps the batch at ~5 leaves instead of ~40 — per-dispatch host
    # cost on dispatch-latency-sensitive runtimes scales with the LEAF
    # COUNT of the arguments, not their bytes (measured ~5 ms/step at 41
    # leaves on the tunneled TPU runtime).  ``unpack()`` (traceable) or
    # ``unpacked()`` (jitted, for host-side use) restores the dicts.
    packed_f: Optional[jax.Array] = None
    packed_i: Optional[jax.Array] = None
    packed_nl: Optional[jax.Array] = None
    label_spec: Optional[Tuple] = struct.field(
        pytree_node=False, default=None
    )

    def unpack(self) -> "EventBatch":
        """Split packed label blocks back into the per-key dicts.

        Pure slicing — traceable, call it at the top of any jitted
        consumer (``StandardModel.loss_from_batch`` does).  No-op when
        the batch already carries dicts.
        """
        if self.label_spec is None:
            return self
        fspec, ispec, nspec = self.label_spec
        out: Dict[str, jax.Array] = dict(self.labels)
        o = 0
        for k, w, scalar in fspec:
            col = self.packed_f[:, o : o + w]
            out[k] = col[:, 0] if scalar else col
            o += w
        o = 0
        for k, w, scalar, isbool in ispec:
            col = self.packed_i[:, o : o + w]
            if isbool:
                col = col.astype(bool)
            out[k] = col[:, 0] if scalar else col
            o += w
        nout = dict(self.node_labels)
        for i, k in enumerate(nspec):
            nout[k] = self.packed_nl[..., i]
        return self.replace(
            labels=out,
            node_labels=nout,
            packed_f=None,
            packed_i=None,
            packed_nl=None,
            label_spec=None,
        )

    def unpacked(self) -> "EventBatch":
        """``unpack()`` through a cached jit — one dispatch instead of
        ~40 eager slice ops.  For host-side consumers (predict attach,
        tests); inside a trace just call ``unpack()``."""
        if self.label_spec is None:
            return self
        global _UNPACK_JIT
        if _UNPACK_JIT is None:
            _UNPACK_JIT = jax.jit(lambda b: b.unpack())
        return _UNPACK_JIT(self)

    @property
    def batch_size(self) -> int:
        return self.x.shape[0]

    @property
    def max_length(self) -> int:
        return self.x.shape[1]

    @property
    def num_features(self) -> int:
        return self.x.shape[2]


_UNPACK_JIT = None


@struct.dataclass
class StackedBatches:
    """k same-shape :class:`EventBatch`es transferred as ONE stacked tree
    (every leaf carries a leading ``k`` dimension).

    Produced by ``DataLoader(stack_k=k)``: the k batches are
    ``np.stack``-ed on the HOST and ``device_put`` once, so the transfer
    dispatch count drops k× (tunneled-runtime put cost scales with leaf
    count, not bytes).  The Trainer consumes these directly in its
    ``steps_per_dispatch`` ``lax.scan`` path — no on-device re-stacking.
    """

    batches: "EventBatch"  # leaves: [k, B, ...]
    k: int = struct.field(pytree_node=False)

    @property
    def batch_size(self) -> int:
        """Total events across the k stacked batches."""
        return self.k * int(self.batches.x.shape[1])

    def unstack(self) -> List["EventBatch"]:
        """Split back into k individual EventBatches (device slices)."""
        return [
            jax.tree_util.tree_map(lambda a: a[i], self.batches)
            for i in range(self.k)
        ]


DEFAULT_BUCKETS: Tuple[int, ...] = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096)


def bucket_for_length(n: int, buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    """Smallest bucket length >= n (last bucket truncates longer events)."""
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def pad_events(
    events: List[np.ndarray],
    length: Optional[int] = None,
    buckets: Sequence[int] = DEFAULT_BUCKETS,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad a list of ``[n_i, D]`` arrays to ``([B, L, D], [B, L], [B])``.

    Events longer than the largest bucket are truncated (mirrors the
    subsampling escape hatch of the reference's IceMixNodes,
    ``graphs/nodes/nodes.py:404-430``).
    """
    assert events, "empty event list"
    d = events[0].shape[1]
    max_n = max(e.shape[0] for e in events)
    L = length if length is not None else bucket_for_length(max_n, buckets)
    B = len(events)
    x = np.zeros((B, L, d), dtype=np.float32)
    mask = np.zeros((B, L), dtype=bool)
    n_pulses = np.zeros((B,), dtype=np.int32)
    for i, e in enumerate(events):
        n = min(e.shape[0], L)
        x[i, :n] = e[:n]
        mask[i, :n] = True
        n_pulses[i] = n
    return x, mask, n_pulses


def make_batch(
    events: List[np.ndarray],
    labels: Optional[Dict[str, np.ndarray]] = None,
    node_labels: Optional[List[Dict[str, np.ndarray]]] = None,
    length: Optional[int] = None,
    buckets: Sequence[int] = DEFAULT_BUCKETS,
) -> EventBatch:
    """Build an :class:`EventBatch` from per-event numpy arrays."""
    x, mask, n_pulses = pad_events(events, length=length, buckets=buckets)
    label_dict: Dict[str, np.ndarray] = {}
    if labels:
        for k, v in labels.items():
            label_dict[k] = np.asarray(v)
    nl_dict: Dict[str, np.ndarray] = {}
    if node_labels:
        L = x.shape[1]
        for key in node_labels[0]:
            arr = np.zeros((len(events), L), dtype=np.float32)
            for i, dct in enumerate(node_labels):
                v = np.asarray(dct[key])
                n = min(v.shape[0], L)
                arr[i, :n] = v[:n]
            nl_dict[key] = arr
    # one batched transfer for the whole pytree (single RPC on remote
    # runtimes; see collate_events)
    return jax.device_put(
        EventBatch(
            x=x,
            mask=mask,
            n_pulses=n_pulses,
            labels=label_dict,
            node_labels=nl_dict,
        )
    )
