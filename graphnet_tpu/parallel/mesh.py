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


def shard_batch(batch, mesh: Mesh):
    """Place every array leaf of an EventBatch with its batch axis sharded
    over ``data`` (labels/scalars included — all are leading-B)."""
    ds = data_sharding(mesh)

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, ds)
        return x

    return jax.tree_util.tree_map(put, batch)
