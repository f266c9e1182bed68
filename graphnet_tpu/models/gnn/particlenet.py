"""ParticleNeT — DynEdgeConv stack with mean aggregation and BatchNorm
(mirror of reference ``src/graphnet/models/gnn/particlenet.py:20-255``,
after arXiv:1902.08570).

BatchNorm inside the conv MLPs uses masked batch statistics over valid
edges by default (train and eval alike). Checkpoints ported from the
reference instead use ``frozen_batchnorm=True``: the torch running
averages are ported into frozen ``mean``/``var`` params and applied as
eval-mode statistics (see utils/weight_port.py; when fine-tuning such a
model with decoupled weight decay, mask the frozen statistics with
``weight_port.frozen_stat_decay_mask``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from graphnet_tpu.batch import EventBatch
from graphnet_tpu.models.components.layers import resolve_activation
from graphnet_tpu.models.gnn.gnn import GNN
from graphnet_tpu.ops import (
    edge_reduce,
    gather_neighbors,
    global_pool,
    knn_graph,
)


class MaskedBatchNorm(nn.Module):
    """BatchNorm with statistics over valid (masked) elements only.

    With ``frozen=True`` the statistics come from stored ``mean``/``var``
    params instead — torch's eval-mode ``BatchNorm1d`` semantics, used for
    checkpoints ported from the reference (utils/weight_port.py fills the
    running averages).
    """

    frozen: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        D = x.shape[-1]
        if self.frozen:
            mean = jax.lax.stop_gradient(
                self.param("mean", nn.initializers.zeros, (D,))
            )
            var = jax.lax.stop_gradient(
                self.param("var", nn.initializers.ones, (D,))
            )
        else:
            m = mask[..., None].astype(x.dtype)
            n = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(x * m, axis=tuple(range(x.ndim - 1))) / n
            var = (
                jnp.sum((x - mean) ** 2 * m, axis=tuple(range(x.ndim - 1)))
                / n
            )
        scale = self.param("scale", nn.initializers.ones, (D,))
        bias = self.param("bias", nn.initializers.zeros, (D,))
        return (x - mean) / jnp.sqrt(var + 1e-5) * scale + bias


class ParticleNeTConv(nn.Module):
    """EdgeConv with per-layer [Dense, BatchNorm, act] and optional dynamic
    kNN recompute."""

    nn_sizes: Sequence[int]
    aggr: str = "mean"
    activation: str = "relu"
    add_batchnorm: bool = True
    frozen_batchnorm: bool = False

    @nn.compact
    def __call__(self, x, idx, edge_mask):
        act = resolve_activation(self.activation)
        # First layer linearised (same rewrite as EdgeConv,
        # layers.py:92): cat[x_i, x_j - x_i] @ [W1; W2] =
        # x_i @ (W1 - W2) + x_j @ W2, so the [B, L, k, 2D] message
        # input tensor is never materialised and the first Dense runs
        # per node instead of per edge (k x fewer matmul rows). Exact.
        h0 = self.nn_sizes[0]
        a = nn.Dense(h0, name="self_dense")(x)
        b = nn.Dense(h0, use_bias=False, name="nbr_dense")(x)
        h = a[:, :, None, :] + gather_neighbors(b, idx)
        for i, size in enumerate(self.nn_sizes):
            if i > 0:
                h = nn.Dense(size, name=f"dense_{i}")(h)
            if self.add_batchnorm:
                h = MaskedBatchNorm(
                    frozen=self.frozen_batchnorm, name=f"bn_{i}"
                )(h, edge_mask)
            h = act(h)
        return edge_reduce(h, edge_mask, self.aggr)


class ParticleNeT(GNN):
    nb_inputs: int
    nb_neighbours: int = 16
    features_subset: Tuple[int, ...] = (0, 1, 2)
    dynamic: bool = True
    dynedge_layer_sizes: Tuple[Tuple[int, ...], ...] = (
        (64, 64, 64),
        (128, 128, 128),
        (256, 256, 256),
    )
    readout_layer_sizes: Tuple[int, ...] = (256,)
    global_pooling_schemes: Tuple[str, ...] = ("mean",)
    activation_layer: str = "relu"
    add_batchnorm_layer: bool = True
    dropout_readout: float = 0.1
    skip_readout: bool = False
    deterministic: bool = True
    # torch eval-mode BatchNorm (stored running statistics) — set on models
    # ported from trained reference checkpoints (utils/weight_port.py)
    frozen_batchnorm: bool = False

    @property
    def nb_outputs(self) -> int:
        return self.readout_layer_sizes[-1]

    @nn.compact
    def __call__(self, batch: EventBatch) -> jax.Array:
        x, mask = batch.x, batch.mask
        if batch.edges is not None:
            idx, edge_mask = batch.edges, batch.edge_mask
        else:
            idx, edge_mask = knn_graph(
                x[..., list(self.features_subset)],
                mask,
                k=self.nb_neighbours,
            )

        for i, sizes in enumerate(self.dynedge_layer_sizes):
            x = ParticleNeTConv(
                nn_sizes=tuple(sizes),
                aggr="mean",
                activation=self.activation_layer,
                add_batchnorm=self.add_batchnorm_layer,
                frozen_batchnorm=self.frozen_batchnorm,
                name=f"conv_{i}",
            )(x, idx, edge_mask)
            if self.dynamic:
                idx, edge_mask = knn_graph(
                    x[..., list(self.features_subset)],
                    mask,
                    k=self.nb_neighbours,
                )

        if self.skip_readout:
            return x

        act = resolve_activation(self.activation_layer)
        # None pooling → node-level readout (reference `particlenet.py:
        # 245-252`: pooling is optional, readout then applies per node)
        if self.global_pooling_schemes:
            h = global_pool(x, mask, self.global_pooling_schemes)
        else:
            h = x
        for i, size in enumerate(self.readout_layer_sizes):
            h = act(nn.Dense(size, name=f"readout_{i}")(h))
            h = nn.Dropout(
                self.dropout_readout, deterministic=self.deterministic
            )(h)
        return h
