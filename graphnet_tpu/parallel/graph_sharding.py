"""Node-axis sharding of one large padded batch — the TPU analogue of the
reference's missing "intra-batch graph partitioning" (SURVEY.md §2.6 row 3).

Events with 10k+ pulses (TITO/Gen2 config) can exceed one chip's useful
occupancy; here the padded node axis L is sharded over a ``graph`` mesh
axis.  The design is GSPMD-first: we annotate shardings and let XLA insert
the ICI collectives —

  * the pairwise-distance matmul ``[B, Ls, D] x [B, D, L]`` keeps the query
    rows local and all-gathers only the small coordinate block (halo
    exchange of node positions);
  * per-row ``top_k`` then runs fully locally on ``[B, Ls, L]``;
  * the EdgeConv neighbour gather all-gathers node features once per layer
    (boundary-feature exchange), while the 2E x d edge-MLP matmul — the
    FLOPs — stays local to each shard.

This mirrors the hand-written halo-exchange design but lets the compiler
schedule/overlap the collectives.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# ---------------------------------------------------------------------------
# sharding hints: which mesh the model is being traced for
# ---------------------------------------------------------------------------

_GRAPH_MESH: contextvars.ContextVar[Optional[Mesh]] = (
    contextvars.ContextVar("graphnet_graph_mesh", default=None)
)


@contextlib.contextmanager
def graph_sharding_hints(mesh: Optional[Mesh]):
    """Make ``mesh`` visible to model code during tracing.

    Wrap the *call* of a jitted step (tracing happens inside the first
    call, so the context is live exactly when module code runs); later
    cache-hit dispatches don't re-trace and don't need it.  Only meshes
    with a ``graph`` axis change behaviour — EdgeConv inserts
    ``with_sharding_constraint`` halo hints (see
    ``models/components/layers.py``); everything else is a no-op.
    """
    if mesh is None or "graph" not in getattr(mesh, "axis_names", ()):
        yield
        return
    token = _GRAPH_MESH.set(mesh)
    try:
        yield
    finally:
        _GRAPH_MESH.reset(token)


def current_graph_mesh() -> Optional[Mesh]:
    """The mesh set by :func:`graph_sharding_hints`, or None."""
    return _GRAPH_MESH.get()


def make_dp_graph_mesh(
    n_data: int, n_graph: int, devices=None
) -> Mesh:
    """2D mesh ``(data, graph)``: DP over events x node-sharding within
    events."""
    devices = list(devices if devices is not None else jax.devices())
    assert n_data * n_graph == len(devices)
    arr = np.asarray(devices).reshape(n_data, n_graph)
    return Mesh(arr, axis_names=("data", "graph"))


def shard_batch_nodes(batch, mesh: Mesh):
    """Place an EventBatch with batch axis on ``data`` and node axis on
    ``graph``.  Per-event labels stay sharded over ``data`` only."""

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    x = put(batch.x, P("data", "graph", None))
    mask = put(batch.mask, P("data", "graph"))
    n_pulses = put(batch.n_pulses, P("data"))
    labels = {
        k: put(v, P("data"))
        for k, v in batch.labels.items()
    }
    node_labels = {
        k: put(v, P("data", "graph"))
        for k, v in batch.node_labels.items()
    }
    # packed-label transport (batch.py): per-event blocks shard over
    # ``data`` only, the node-label block over ``data`` x ``graph``
    packed = {
        name: (
            put(v, spec) if v is not None else None
        )
        for name, v, spec in (
            ("packed_f", batch.packed_f, P("data")),
            ("packed_i", batch.packed_i, P("data")),
            ("packed_nl", batch.packed_nl, P("data", "graph")),
        )
    }
    return batch.replace(
        x=x,
        mask=mask,
        n_pulses=n_pulses,
        labels=labels,
        node_labels=node_labels,
        **packed,
    )
