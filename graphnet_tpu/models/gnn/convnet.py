"""ConvNet backbone — TAGConv stack (mirror of reference
``src/graphnet/models/gnn/convnet.py:16-118``, after arXiv:1810.05165).

TAGConv (k-hop topology-adaptive conv) on the dense layout: the normalised
adjacency is a ``[B, L, L]`` matrix and each hop is one batched MXU matmul —
exactly the "k-hop propagation = matmul" design from SURVEY.md §7.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from graphnet_tpu.batch import EventBatch
from graphnet_tpu.models.gnn.gnn import GNN
from graphnet_tpu.ops import knn_graph, masked_max, masked_sum


def adjacency_from_neighbors(
    idx: jax.Array, edge_mask: jax.Array, L: int
) -> jax.Array:
    """Dense directed adjacency ``A[b, i, j] = 1`` iff ``j`` is a neighbour
    of ``i`` (edge j -> i, PyG source_to_target flow)."""
    B = idx.shape[0]
    onehot = jax.nn.one_hot(idx, L, dtype=jnp.float32)  # [B, L, k, L]
    return jnp.sum(onehot * edge_mask[..., None], axis=2)


def tag_normalised_adjacency(
    idx: jax.Array, edge_mask: jax.Array, L: int
) -> jax.Array:
    """Symmetrically-normalised adjacency ``D^-1/2 A D^-1/2`` as used by
    PyG ``TAGConv`` (gcn_norm without self loops)."""
    A = adjacency_from_neighbors(idx, edge_mask, L)
    deg = jnp.sum(A, axis=-1)  # in-degree of each target i
    dis = jnp.where(deg > 0, 1.0 / jnp.sqrt(jnp.maximum(deg, 1e-12)), 0.0)
    return A * dis[:, :, None] * dis[:, None, :]


class TAGConv(nn.Module):
    """``x' = sum_{h=0..K} W_h (A_norm)^h x``."""

    features: int
    K: int = 2

    @nn.compact
    def __call__(self, x: jax.Array, A_norm: jax.Array) -> jax.Array:
        out = nn.Dense(self.features, name="lin_0")(x)
        h = x
        for hop in range(1, self.K + 1):
            h = jnp.einsum(
                "blm,bmd->bld", A_norm, h,
                preferred_element_type=jnp.float32,
            )
            out = out + nn.Dense(
                self.features, use_bias=False, name=f"lin_{hop}"
            )(h)
        return out


class ConvNet(GNN):
    nb_inputs: int
    nb_outputs_: int = 1
    nb_intermediate: int = 128
    dropout_ratio: float = 0.3
    deterministic: bool = True
    # Use stored statistics (``bn_mean``/``bn_var`` params) instead of batch
    # statistics — the torch eval-mode semantics of ``batchnorm1``
    # (reference ``gnn/convnet.py:49,102``).  Enabled on models ported from
    # trained reference checkpoints (utils/weight_port.py), whose running
    # averages are filled into the params.
    frozen_batchnorm: bool = False

    @property
    def nb_outputs(self) -> int:
        return self.nb_outputs_

    @nn.compact
    def __call__(self, batch: EventBatch) -> jax.Array:
        x, mask = batch.x, batch.mask
        L = x.shape[1]
        if batch.edges is not None:
            idx, edge_mask = batch.edges, batch.edge_mask
        else:
            idx, edge_mask = knn_graph(x[..., :3], mask, k=8)
        A = tag_normalised_adjacency(idx, edge_mask, L)

        inter2 = 6 * self.nb_intermediate
        pools = []
        h = x
        for i in range(3):
            h = nn.leaky_relu(
                TAGConv(self.nb_intermediate, K=2, name=f"conv{i+1}")(
                    h, A
                ),
                negative_slope=0.01,
            )
            # zero out padded nodes so add-pool is exact
            h = jnp.where(mask[..., None], h, 0.0)
            pools.append(
                jnp.concatenate(
                    [masked_sum(h, mask), masked_max(h, mask)], axis=1
                )
            )

        z = jnp.concatenate(pools, axis=1)
        # BatchNorm over the event dimension (reference batchnorm1); batch
        # statistics by default (no running averages), frozen stored
        # statistics when ``frozen_batchnorm`` (ported checkpoints)
        if self.frozen_batchnorm:
            mean = jax.lax.stop_gradient(
                self.param("bn_mean", nn.initializers.zeros, (inter2,))
            )[None, :]
            var = jax.lax.stop_gradient(
                self.param("bn_var", nn.initializers.ones, (inter2,))
            )[None, :]
        else:
            mean = jnp.mean(z, axis=0, keepdims=True)
            var = jnp.var(z, axis=0, keepdims=True)
        scale = self.param(
            "bn_scale", nn.initializers.ones, (inter2,)
        )
        bias = self.param("bn_bias", nn.initializers.zeros, (inter2,))
        z = (z - mean) / jnp.sqrt(var + 1e-5) * scale + bias

        for i in range(5):
            z = nn.leaky_relu(
                nn.Dense(inter2, name=f"linear{i+1}")(z),
                negative_slope=0.01,
            )
            z = nn.Dropout(
                self.dropout_ratio, deterministic=self.deterministic
            )(z)
        return nn.Dense(self.nb_outputs_, name="out")(z)
