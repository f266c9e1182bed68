"""Edge definitions — specs evaluated on device.

Mirror of reference ``src/graphnet/models/graphs/edges/edges.py`` and
``minkowski.py``.  Where the reference computes ``edge_index`` per event on
CPU dataloader workers (``edges.py:74-78``), the TPU framework stores the
edge *rule* and evaluates it on device for the whole padded batch at once —
one MXU distance matmul + top_k (see ``graphnet_tpu.ops.knn``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from graphnet_tpu.ops import knn_graph, minkowski_knn_graph, radius_graph
from graphnet_tpu.ops.knn import pairwise_sq_dists


@dataclass(frozen=True)
class EdgeDefinition:
    """Base edge rule: ``build(x, mask) -> (idx [B,L,k], edge_mask)``."""

    def build(
        self, x: jax.Array, mask: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        raise NotImplementedError


@dataclass(frozen=True)
class KNNEdges(EdgeDefinition):
    """kNN on selected columns (reference ``edges.py:47-78``; defaults k=8,
    columns xyz)."""

    nb_nearest_neighbours: int = 8
    columns: Tuple[int, ...] = (0, 1, 2)

    def build(self, x, mask):
        return knn_graph(
            x[..., list(self.columns)],
            mask,
            k=self.nb_nearest_neighbours,
        )


@dataclass(frozen=True)
class RadialEdges(EdgeDefinition):
    """Neighbours within a sphere, capped at ``max_neighbours``
    (reference ``edges.py:83-117``; the cap replaces the unbounded sparse
    edge list with a static shape)."""

    radius: float = 1.0
    columns: Tuple[int, ...] = (0, 1, 2)
    max_neighbours: int = 32

    def build(self, x, mask):
        return radius_graph(
            x[..., list(self.columns)],
            mask,
            r=self.radius,
            k=self.max_neighbours,
        )


@dataclass(frozen=True)
class MinkowskiKNNEdges(EdgeDefinition):
    """kNN under ``|dx|^2 - (c dt)^2`` (reference ``minkowski.py:37-99``)."""

    nb_nearest_neighbours: int = 8
    c: float = 0.299792458
    time_like_weight: float = 1.0
    space_coords: Tuple[int, int, int] = (0, 1, 2)
    time_coord: int = 3

    def build(self, x, mask):
        return minkowski_knn_graph(
            x,
            mask,
            k=self.nb_nearest_neighbours,
            c=self.c,
            space_coords=self.space_coords,
            time_coord=self.time_coord,
        )


@dataclass(frozen=True)
class EuclideanEdges(EdgeDefinition):
    """Dense Gaussian-affinity adjacency thresholded to kNN-style neighbour
    lists (legacy arXiv:1809.06166 construction, reference
    ``edges.py:120-185``).  The softmax-normalised affinity row is
    materialised; neighbours below ``threshold`` are masked out.
    """

    sigma: float = 1.0
    threshold: float = 0.0
    columns: Tuple[int, ...] = (0, 1, 2)
    max_neighbours: int = 32

    def build(self, x, mask):
        coords = x[..., list(self.columns)]
        d2 = pairwise_sq_dists(coords, mask)
        affinity = jnp.exp(-d2 / (2.0 * self.sigma**2))
        # mask invalid/self before normalising
        L = coords.shape[1]
        eye = jnp.eye(L, dtype=bool)[None]
        valid = mask[:, :, None] & mask[:, None, :] & ~eye
        affinity = jnp.where(valid, affinity, 0.0)
        norm = affinity / jnp.maximum(
            jnp.sum(affinity, axis=-1, keepdims=True), 1e-12
        )
        _, idx = jax.lax.top_k(norm, self.max_neighbours)
        chosen = jnp.take_along_axis(norm, idx, axis=-1)
        edge_mask = (chosen > self.threshold) & mask[:, :, None]
        return idx.astype(jnp.int32), edge_mask
