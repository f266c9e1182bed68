"""Device-mesh construction and sharding helpers.

TPU-native replacement for the reference's single line of distribution
policy (Lightning ``strategy="ddp"`` → NCCL; ``easy_model.py:90,127``):
explicit ``jax.sharding.Mesh`` axes + NamedSharding.  Supported axes:

  * ``data``  — batch (event) dimension; gradient psum rides ICI/DCN.
  * ``model`` — reserved for tensor-parallel sharding of wide layers.
  * ``graph`` — node-dimension sharding of one huge padded batch
    (edge-partitioned graphs; see ``graphnet_tpu.parallel.graph_dp``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1D/2D mesh over the available devices: ``(data, model)``."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, PartitionSpec("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def fsdp_sharding(
    mesh: Mesh,
    tree,
    axis: str = "data",
    min_size: int = 2**14,
):
    """FSDP / ZeRO-3 style sharding specs for a parameter (or optimizer
    state) pytree: each large leaf is sharded along its largest
    mesh-divisible dimension over ``axis``; small leaves and scalars stay
    replicated.

    Under ``jit`` with a batch sharded over the same axis, XLA's SPMD
    partitioner inserts the all-gather before each parameter use and a
    reduce-scatter for its gradient — the ZeRO-3 communication pattern —
    with no hand-written collectives.  Sharding decisions are shape-based
    only, so a matching optimizer-state tree (Adam ``m``/``v`` mirror the
    parameter shapes) gets identical, consistent placements.

    The reference has no counterpart (Lightning DDP replicates the full
    model + optimizer per rank, ``easy_model.py:90``); this exists so
    DeepIce-scale transformers keep fitting per chip as they grow.
    """
    n = mesh.shape[axis]

    def spec_for(x):
        if (
            not hasattr(x, "shape")
            or getattr(x, "ndim", 0) == 0
            or x.size < min_size
        ):
            return NamedSharding(mesh, PartitionSpec())
        for d in sorted(
            range(x.ndim), key=lambda d: x.shape[d], reverse=True
        ):
            if x.shape[d] % n == 0:
                spec = [None] * x.ndim
                spec[d] = axis
                return NamedSharding(mesh, PartitionSpec(*spec))
        return NamedSharding(mesh, PartitionSpec())

    return jax.tree_util.tree_map(spec_for, tree)


def shard_fsdp(tree, mesh: Mesh, axis: str = "data", min_size: int = 2**14):
    """Place ``tree`` with :func:`fsdp_sharding` placements."""
    return jax.device_put(tree, fsdp_sharding(mesh, tree, axis, min_size))


def shard_batch(batch, mesh: Mesh):
    """Place every array leaf of an EventBatch with its batch axis sharded
    over ``data`` (labels/scalars included — all are leading-B)."""
    ds = data_sharding(mesh)

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, ds)
        return x

    return jax.tree_util.tree_map(put, batch)
