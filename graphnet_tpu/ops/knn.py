"""Batched k-nearest-neighbour graph construction on dense-padded events.

Replaces ``torch_cluster.knn_graph`` (used by the reference at
``src/graphnet/models/components/layers.py:63-67`` and
``src/graphnet/models/graphs/edges/edges.py:74-78``).  On TPU the whole batch
is one ``[B, L, L]`` squared-distance computation: ``|xi - xj|^2 =
|xi|^2 + |xj|^2 - 2 xi.xj`` where the cross term is a batched matmul that
lands on the MXU, followed by ``lax.top_k`` per row.

Semantics matched to ``torch_cluster.knn_graph(loop=False)``:
  * self-edges excluded;
  * ties broken toward the lower index (``top_k`` guarantee);
  * events with fewer than ``k+1`` valid nodes yield fewer valid neighbours —
    reported through ``edge_mask`` so aggregations can ignore the padding.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_BIG = jnp.float32(1e30)


def pairwise_sq_dists(coords: jax.Array, mask: jax.Array) -> jax.Array:
    """``[B, L, D], [B, L] -> [B, L, L]`` squared distances; invalid -> +BIG.

    The cross term is computed with a matmul in fp32 (coords are physical
    positions in O(100 m) units after detector standardization, so fp32 is
    exact enough for neighbour ranking).
    """
    # Center per event to reduce fp32 cancellation in the |a|^2+|b|^2-2ab
    # expansion (neighbour ranking is translation invariant).
    denom = jnp.maximum(jnp.sum(mask, axis=1), 1)[:, None]
    center = (
        jnp.sum(jnp.where(mask[..., None], coords, 0.0), axis=1) / denom
    )
    coords = coords - center[:, None, :]
    sq = jnp.sum(coords * coords, axis=-1)  # [B, L]
    cross = jnp.einsum(
        "bld,bmd->blm", coords, coords, preferred_element_type=jnp.float32
    )
    d2 = sq[:, :, None] + sq[:, None, :] - 2.0 * cross
    d2 = jnp.maximum(d2, 0.0)
    invalid = ~(mask[:, :, None] & mask[:, None, :])
    return jnp.where(invalid, _BIG, d2)


def knn_graph(
    coords: jax.Array,
    mask: jax.Array,
    k: int,
    exclude_self: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Batched kNN on padded point sets.

    Dispatches to the fused Pallas kernel on TPU (≈10x faster than the
    XLA distance-matrix + ``top_k`` path at L=1024); falls back to the XLA
    implementation elsewhere and for shapes the kernel does not support.

    Args:
        coords: ``[B, L, D]`` positions (already sliced to the kNN feature
            subset, e.g. xyz).
        mask: ``[B, L]`` validity mask.
        k: number of neighbours.

    Returns:
        ``(indices, edge_mask)``: ``[B, L, k]`` int32 neighbour indices (rows
        for invalid nodes are arbitrary) and ``[B, L, k]`` bool mask marking
        real edges (valid source, valid & distinct neighbour).
    """
    L = coords.shape[1]
    if (
        exclude_self
        and jax.default_backend() == "tpu"
        and (L % min(L, 128) == 0)
        and L >= 8
    ):
        from graphnet_tpu.ops.knn_pallas import knn_graph_pallas

        return knn_graph_pallas(coords, mask, k=k, tile=min(L, 128))
    return _knn_graph_xla(coords, mask, k, exclude_self)


def _knn_graph_xla(
    coords: jax.Array,
    mask: jax.Array,
    k: int,
    exclude_self: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """XLA implementation: [B, L, L] distances + lax.top_k.

    Under node-axis (``graph``) sharding the top_k is replaced by a
    streaming k-selection: GSPMD's partitioning rule for sort/TopK
    replicates the operand, which all-gathers the full ``[B, L, L]``
    distance matrix (measured 100 of 107 MB/step of halo volume at
    B=4, L=1024, g=4); k rounds of (min, argmin, mask) are pure
    row-local reduces that stay sharded.  The streaming decision is a
    static argument of the jitted impl (NOT read inside it — an inner
    jit's jaxpr cache is keyed on avals only, so a context read inside
    would go stale across outer traces).
    """
    from graphnet_tpu.parallel.graph_sharding import current_graph_mesh

    streaming = current_graph_mesh() is not None
    return _knn_graph_xla_impl(
        coords, mask, k, exclude_self, streaming
    )


@partial(
    jax.jit, static_argnames=("k", "exclude_self", "streaming")
)
def _knn_graph_xla_impl(
    coords: jax.Array,
    mask: jax.Array,
    k: int,
    exclude_self: bool = True,
    streaming: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    B, L, _ = coords.shape
    d2 = pairwise_sq_dists(coords, mask)
    if exclude_self:
        eye = jnp.eye(L, dtype=bool)
        d2 = jnp.where(eye[None, :, :], _BIG, d2)
    if streaming:
        return _streaming_select(d2, mask, k)
    # top_k over negated distances: smallest distances, ties -> lower index.
    neg = -d2
    _, idx = jax.lax.top_k(neg, k)  # [B, L, k]
    # An edge is real iff its distance is < BIG (i.e. neighbor valid, not self).
    chosen = jnp.take_along_axis(d2, idx, axis=-1)
    edge_mask = (chosen < _BIG * 0.5) & mask[:, :, None]
    return idx.astype(jnp.int32), edge_mask


def _streaming_select(
    d2: jax.Array, mask: jax.Array, k: int
) -> Tuple[jax.Array, jax.Array]:
    """k rounds of (row-min, lowest-index argmin, mask out) over the
    last axis — identical results (incl. tie order) to the top_k path,
    but expressed in ops whose GSPMD rules keep the row sharding."""
    B, L = d2.shape[0], d2.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (B, L, L), 2)
    idxs = []
    dists = []
    for _ in range(k):
        m = jnp.min(d2, axis=2, keepdims=True)  # [B, L, 1]
        cand = jnp.where(d2 == m, col, L)
        a = jnp.min(cand, axis=2)  # [B, L] lowest-index argmin
        idxs.append(a)
        dists.append(m[..., 0])
        d2 = jnp.where(col == a[:, :, None], _BIG, d2)
    idx = jnp.stack(idxs, axis=2).astype(jnp.int32)
    chosen = jnp.stack(dists, axis=2)
    edge_mask = (chosen < _BIG * 0.5) & mask[:, :, None]
    return idx, edge_mask


@partial(jax.jit, static_argnames=("k",))
def radius_graph(
    coords: jax.Array,
    mask: jax.Array,
    r: float,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Neighbours within radius ``r``, capped at ``k`` per node (replaces
    ``torch_cluster.radius_graph``, reference ``graphs/edges/edges.py:111``)."""
    idx, edge_mask = knn_graph(coords, mask, k=k, exclude_self=True)
    d2 = pairwise_sq_dists(coords, mask)
    chosen = jnp.take_along_axis(d2, idx, axis=-1)
    return idx, edge_mask & (chosen <= r * r)


def minkowski_knn_graph(
    coords_xyzt: jax.Array,
    mask: jax.Array,
    k: int,
    c: float = 0.299792458,  # m/ns
    space_coords: Tuple[int, int, int] = (0, 1, 2),
    time_coord: int = 3,
) -> Tuple[jax.Array, jax.Array]:
    """kNN under the Minkowski pseudo-metric ``|dx|^2 - (c*dt)^2``.

    Replaces ``MinkowskiKNNEdges`` (reference
    ``src/graphnet/models/graphs/edges/minkowski.py:10-63``), which loops over
    events densely on CPU.  Here it is one batched computation.  Note the
    pseudo-metric can be negative; the reference ranks by the signed value,
    which we replicate (no clamping).
    """
    xyz = coords_xyzt[..., list(space_coords)]
    t = coords_xyzt[..., time_coord] * c
    sq = jnp.sum(xyz * xyz, axis=-1) - t * t  # [B, L] Minkowski "norm"
    cross = jnp.einsum(
        "bld,bmd->blm", xyz, xyz, preferred_element_type=jnp.float32
    ) - t[:, :, None] * t[:, None, :]
    d2 = sq[:, :, None] + sq[:, None, :] - 2.0 * cross
    L = coords_xyzt.shape[1]
    invalid = ~(mask[:, :, None] & mask[:, None, :])
    d2 = jnp.where(invalid | jnp.eye(L, dtype=bool)[None], _BIG, d2)
    _, idx = jax.lax.top_k(-d2, k)
    chosen = jnp.take_along_axis(d2, idx, axis=-1)
    edge_mask = (chosen < _BIG * 0.5) & mask[:, :, None]
    return idx.astype(jnp.int32), edge_mask
