"""Neighbour gather + masked reductions for dense-padded graphs.

These replace the torch_scatter segment reductions of the reference
(``scatter_sum/mean/min/max/std``, used at
``src/graphnet/models/gnn/dynedge.py:7-18`` and
``src/graphnet/models/components/pool.py``).  Because the TPU layout is
dense-padded ``[B, L, D]`` with a ``[B, L]`` mask, "scatter over batch ids"
becomes a masked reduction over the L axis, and "scatter over edges" becomes a
reduction over the regular neighbour axis k — both plain dense ops XLA fuses
well.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

_NEG = jnp.float32(-1e30)
# max L for homophily's one-hot-matmul gather — the cost-model
# break-even (see ``homophily``); the 512 MB transient cap below guards
# big-batch long-event shapes independently.  The measured TITO L=1024
# number (727 ev/s, BENCH r2) ran on the matmul path.  Override for A/B.
_HOMOPHILY_MATMUL_MAX_L = int(
    os.environ.get("GRAPHNET_HOMOPHILY_MATMUL_MAX_L", "1600")
)
_POS = jnp.float32(1e30)


def gather_neighbors(x: jax.Array, idx: jax.Array) -> jax.Array:
    """``[B, L, D] gathered at [B, L, k] -> [B, L, k, D]``."""
    B, L, D = x.shape
    return jnp.take_along_axis(x[:, :, None, :], idx[:, :, :, None], axis=1)


def edge_reduce(
    msgs: jax.Array,
    edge_mask: jax.Array,
    aggr: str,
) -> jax.Array:
    """Reduce messages ``[B, L, k, D]`` over the neighbour axis.

    ``aggr`` in {"sum"/"add", "mean", "max", "min"}.  Masked edges are
    ignored; nodes with zero valid edges give 0 (matching scatter semantics
    where absent segments stay at the zero-initialised output).
    """
    m = edge_mask[..., None]
    if aggr in ("sum", "add"):
        return jnp.sum(jnp.where(m, msgs, 0.0), axis=2)
    if aggr == "mean":
        s = jnp.sum(jnp.where(m, msgs, 0.0), axis=2)
        n = jnp.sum(edge_mask, axis=2)[..., None]
        return s / jnp.maximum(n, 1)
    if aggr == "max":
        r = jnp.max(jnp.where(m, msgs, _NEG), axis=2)
        has = jnp.any(edge_mask, axis=2)[..., None]
        return jnp.where(has, r, 0.0)
    if aggr == "min":
        r = jnp.min(jnp.where(m, msgs, _POS), axis=2)
        has = jnp.any(edge_mask, axis=2)[..., None]
        return jnp.where(has, r, 0.0)
    raise ValueError(f"unknown aggregation {aggr!r}")


def masked_sum(x: jax.Array, mask: jax.Array) -> jax.Array:
    """``[B, L, D], [B, L] -> [B, D]`` (sum_pool, reference pool.py:125)."""
    return jnp.sum(jnp.where(mask[..., None], x, 0.0), axis=1)


def masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    s = masked_sum(x, mask)
    n = jnp.sum(mask, axis=1)[:, None]
    return s / jnp.maximum(n, 1)


def masked_max(x: jax.Array, mask: jax.Array) -> jax.Array:
    r = jnp.max(jnp.where(mask[..., None], x, _NEG), axis=1)
    has = jnp.any(mask, axis=1)[:, None]
    return jnp.where(has, r, 0.0)


def masked_min(x: jax.Array, mask: jax.Array) -> jax.Array:
    r = jnp.min(jnp.where(mask[..., None], x, _POS), axis=1)
    has = jnp.any(mask, axis=1)[:, None]
    return jnp.where(has, r, 0.0)


def masked_std(x: jax.Array, mask: jax.Array, eps: float = 0.0) -> jax.Array:
    """Population std per event (reference ``std_pool_x``, pool.py:137)."""
    mean = masked_mean(x, mask)
    d = jnp.where(mask[..., None], x - mean[:, None, :], 0.0)
    n = jnp.maximum(jnp.sum(mask, axis=1)[:, None], 1)
    var = jnp.sum(d * d, axis=1) / n
    return jnp.sqrt(var + eps)


POOLS = {
    "sum": masked_sum,
    "add": masked_sum,
    "mean": masked_mean,
    "max": masked_max,
    "min": masked_min,
    "std": masked_std,
}


def global_pool(x: jax.Array, mask: jax.Array, schemes) -> jax.Array:
    """Concat of pooled features per scheme, ``[B, len(schemes)*D]``.

    Mirrors DynEdge's multi-scheme readout pooling
    (reference ``gnn/dynedge.py:251-264``); a bare string means one
    scheme (the reference's ``isinstance(str)`` normalisation,
    ``particlenet.py:135-137``).
    """
    if isinstance(schemes, str):
        schemes = (schemes,)
    return jnp.concatenate([POOLS[s](x, mask) for s in schemes], axis=-1)


def broadcast_to_nodes(g: jax.Array, L: int) -> jax.Array:
    """``[B, D] -> [B, L, D]`` — replaces the reference's one-hot matmul
    distribute trick (``gnn/dynedge.py:308-319``); in dense layout it is a
    broadcast."""
    return jnp.broadcast_to(g[:, None, :], (g.shape[0], L, g.shape[1]))


def homophily(
    idx: jax.Array, edge_mask: jax.Array, values: jax.Array
) -> jax.Array:
    """Fraction of edges whose endpoints share a value, per event.

    Replaces PyG ``homophily`` used for DynEdge global variables
    (reference ``models/utils.py:25-28``, ``gnn/dynedge.py:266-293``).

    The neighbour gather is a one-hot selection matmul, NOT
    ``take_along_axis``: XLA lowers the latter to a serial row gather
    that costs ~1 ms per channel at B=128, L=128 (profiled — it was 60%
    of the DynEdge train step); the 0/1 matmul runs on the MXU in ~50 us
    for all channels at once and is exact (single-term sums of f32).

    Args:
        idx: ``[B, L, k]`` neighbour indices.
        edge_mask: ``[B, L, k]`` valid-edge mask.
        values: ``[B, L]`` per-node scalar feature, or ``[B, L, C]`` for
            C features at once.

    Returns:
        ``[B]`` (scalar input) or ``[B, C]``.
    """
    single = values.ndim == 2
    if single:
        values = values[..., None]
    B, L, k = idx.shape
    C = values.shape[-1]
    # The one-hot operand is [B, L*k, L].  Cost model: the serial gather
    # XLA emits for take_along_axis costs ~rows (B·L·k) at ~8 ns/row
    # (profiled: ~1 ms/channel at B=128, L=128); the matmul costs its
    # HBM traffic, B·L·k·L·4 B at ~820 GB/s — so the matmul wins for
    # L ≲ 1600 *independent of B*, and the profiled DynEdge win (67 MB
    # one-hot → ~50 us) sits comfortably inside.  Cap the transient at
    # 512 MB so huge-batch long-event shapes take the gather instead of
    # blowing HBM working set.  L threshold env-tunable for A/B.
    if (
        L <= _HOMOPHILY_MATMUL_MAX_L
        and B * L * k * L * 4 <= 512 * 1024 * 1024
    ):
        onehot = (
            idx.reshape(B, L * k)[..., None]
            == jnp.arange(L, dtype=idx.dtype)[None, None, :]
        ).astype(values.dtype)
        vj = jnp.einsum(
            "bel,blc->bec", onehot, values
        ).reshape(B, L, k, C)
    else:
        vj = jnp.take_along_axis(
            values[:, :, None, :],
            idx[..., None],
            axis=1,
        )  # [B, L, k, C]
    same = (values[:, :, None, :] == vj) & edge_mask[..., None]
    n_edges = jnp.sum(edge_mask, axis=(1, 2))
    hom = jnp.sum(same, axis=(1, 2)) / jnp.maximum(n_edges, 1)[:, None]
    return hom[..., 0] if single else hom
