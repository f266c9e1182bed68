"""DynEdgeJINST — the exact arXiv:2209.03042 architecture (mirror of
reference ``src/graphnet/models/gnn/dynedge_jinst.py:16-152``)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from graphnet_tpu.batch import EventBatch
from graphnet_tpu.models.components.layers import DynEdgeConv
from graphnet_tpu.models.gnn.gnn import GNN
from graphnet_tpu.ops import (
    homophily,
    knn_graph,
    masked_max,
    masked_mean,
    masked_min,
    masked_sum,
)


class DynEdgeJINST(GNN):
    nb_inputs: int
    layer_size_scale: int = 4

    @property
    def nb_outputs(self) -> int:
        return self.layer_size_scale * 16 * 2

    @nn.compact
    def __call__(self, batch: EventBatch) -> jax.Array:
        x, mask = batch.x, batch.mask
        c = self.layer_size_scale
        l1 = self.nb_inputs
        l2, l3, l4, l5, l6 = (
            c * 16 * 2,
            c * 32 * 2,
            c * 42 * 2,
            c * 32 * 2,
            c * 16 * 2,
        )

        if batch.edges is not None:
            idx, edge_mask = batch.edges, batch.edge_mask
        else:
            idx, edge_mask = knn_graph(x[..., :3], mask, k=8)

        homs = homophily(idx, edge_mask, x[..., :4])  # [B, 4], one call
        h_x, h_y, h_z, h_t = (
            homs[:, 0:1], homs[:, 1:2], homs[:, 2:3], homs[:, 3:4]
        )

        a, idx, edge_mask = DynEdgeConv(
            nn_sizes=(l2, l3),
            aggr="add",
            nb_neighbors=8,
            activation="leaky_relu",
            name="conv_add1",
        )(x, mask, idx, edge_mask)
        b, idx, edge_mask = DynEdgeConv(
            nn_sizes=(l4, l3),
            aggr="add",
            nb_neighbors=8,
            activation="leaky_relu",
            name="conv_add2",
        )(a, mask, idx, edge_mask)
        d1, idx, edge_mask = DynEdgeConv(
            nn_sizes=(l4, l3),
            aggr="add",
            nb_neighbors=8,
            activation="leaky_relu",
            name="conv_add3",
        )(b, mask, idx, edge_mask)
        d2, idx, edge_mask = DynEdgeConv(
            nn_sizes=(l4, l3),
            aggr="add",
            nb_neighbors=8,
            activation="leaky_relu",
            name="conv_add4",
        )(d1, mask, idx, edge_mask)

        h = jnp.concatenate([x, a, b, d1, d2], axis=-1)
        h = nn.leaky_relu(nn.Dense(l4, name="nn1")(h), negative_slope=0.01)
        h = nn.Dense(l5, name="nn2")(h)

        pooled = jnp.concatenate(
            [
                masked_max(h, mask),
                masked_min(h, mask),
                masked_sum(h, mask),
                masked_mean(h, mask),
                h_t,
                h_x,
                h_y,
                h_z,
                batch.n_pulses.astype(h.dtype)[:, None],
            ],
            axis=-1,
        )
        out = nn.leaky_relu(pooled, negative_slope=0.01)
        out = nn.Dense(l6, name="nn3")(out)
        return nn.leaky_relu(out, negative_slope=0.01)
