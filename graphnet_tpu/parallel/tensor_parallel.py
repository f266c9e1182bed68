"""Tensor parallelism for the transformer backbones (TITO / DeepIce /
ISeeCube) via GSPMD sharding rules — no model-code changes.

Megatron-style placement expressed purely as parameter shardings on a
``(data, model)`` mesh (``parallel/mesh.py:make_mesh``):

  * column-parallel: qkv / q / k / v projections and the first MLP layer
    shard their OUTPUT features over ``model`` — after the head reshape
    this is attention-head sharding, so the whole softmax(QK^T)V block
    runs per-device with zero communication;
  * row-parallel: the attention out-projection and second MLP layer shard
    their INPUT features over ``model`` — XLA inserts the single
    all-reduce per block that Megatron-LM does by hand.

The reference has no counterpart (Lightning DDP replicates everything,
``easy_model.py:90``); this exists so DeepIce-scale models can grow past
one chip's HBM while the ``data`` axis keeps scaling throughput.

Requirements for a clean (communication-minimal) propagation:
``num_heads % n_model == 0`` and MLP hidden dim divisible by
``n_model``.  Correctness does not depend on either — GSPMD falls back
to resharding — but efficiency does, so :func:`tensor_parallel_sharding`
warns when a matched layer's dimension is not divisible.
"""

from __future__ import annotations

import warnings
from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

# Column-parallel layers (output-feature sharding): attention input
# projections and first FFN layers across MHA / Attention_rel / Mlp /
# TransformerEncoderLayer / DynTrans (models/components/layers.py).
_COL = ("qkv", "proj_q", "proj_k", "proj_v", "fc1", "linear1")
# Row-parallel layers (input-feature sharding): attention out-projections
# and second FFN layers.
_ROW = ("out", "proj", "fc2", "linear2")


def _module_name(path: Tuple) -> str:
    """Name of the module owning the leaf (path is (..., module, leaf))."""
    return str(path[-2].key) if len(path) >= 2 else ""


def tensor_parallel_sharding(
    mesh: Mesh, params, axis: str = "model"
):
    """Sharding-spec pytree for ``params``: Megatron column/row placement
    for recognised attention/FFN layers, replicated elsewhere.

    Compose with data parallelism by building the mesh with both axes
    (``make_mesh(n_data, n_model)``) and sharding the batch over
    ``data`` as usual — XLA overlaps the per-block model all-reduce with
    the per-step gradient psum.
    """
    n = mesh.shape[axis]

    def spec_for(path, x):
        if not hasattr(x, "shape") or x.ndim == 0:
            return NamedSharding(mesh, PartitionSpec())
        mod = _module_name(path)
        leaf = str(path[-1].key)
        if mod in _COL:
            # kernel [in, out] → shard out; bias [out] → shard
            d = x.ndim - 1
            if x.shape[d] % n:
                warnings.warn(
                    f"TP: {mod}/{leaf} dim {x.shape[d]} not divisible "
                    f"by model={n}; replicating"
                )
                return NamedSharding(mesh, PartitionSpec())
            spec = [None] * x.ndim
            spec[d] = axis
            return NamedSharding(mesh, PartitionSpec(*spec))
        if mod in _ROW and leaf == "kernel" and x.ndim >= 2:
            # kernel [in, out] → shard in; bias stays replicated (added
            # after the all-reduce)
            if x.shape[0] % n:
                warnings.warn(
                    f"TP: {mod}/kernel dim {x.shape[0]} not divisible "
                    f"by model={n}; replicating"
                )
                return NamedSharding(mesh, PartitionSpec())
            spec = [None] * x.ndim
            spec[0] = axis
            return NamedSharding(mesh, PartitionSpec(*spec))
        return NamedSharding(mesh, PartitionSpec())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_tensor_parallel(params, mesh: Mesh, axis: str = "model"):
    """Place ``params`` with :func:`tensor_parallel_sharding` placements."""
    return jax.device_put(
        params, tensor_parallel_sharding(mesh, params, axis)
    )


def count_tp_sharded(params, mesh: Mesh, axis: str = "model") -> int:
    """Number of leaves that received a model-axis sharding (diagnostics
    and tests: a TP run where nothing sharded is a silent no-op)."""
    specs = tensor_parallel_sharding(mesh, params, axis)
    return sum(
        1
        for s in jax.tree_util.tree_leaves(
            specs, is_leaf=lambda x: isinstance(x, NamedSharding)
        )
        if any(e == axis for e in tuple(s.spec))
    )
