"""Pallas TPU kernel for batched kNN on padded point sets.

Fuses the pairwise-distance computation (MXU matmul) with streaming
k-selection: instead of materialising ``[B, L, L]`` distances in HBM and
running XLA's generic ``top_k`` sort, each distance tile lives in VMEM
and the k=8 nearest are extracted with k iterations of
(min, argmin, mask) — O(kL) work per row with no sorting network.

Layout: the distance tile is kept TRANSPOSED, ``[L_keys, TL_queries]``,
so every per-round reduction (min, argmin-by-lowest-index) runs over the
*sublane* axis — a handful of vreg-pairwise mins plus a short sublane
tree — instead of a 128-wide lane shuffle tree per vreg.  Measured ~2x
on the selection-bound kernel (the r3 row-layout kernel was
selection-math-bound at 0.34 ms/build, B=128 L=128 k=8).  Results are
written as ``[k, TL]`` rows (natural store layout) and swapped to the
``[L, k]`` contract outside the kernel (a trivial 0.5 MB XLA transpose).

Same contract as :func:`graphnet_tpu.ops.knn.knn_graph` (no self loops,
ties toward lower index, per-event centering for fp32 accuracy).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30


def _knn_kernel(q_ref, kx_ref, kmask_ref, idx_ref, d_ref, *, k, tl, bb):
    """One (batch-block, query-tile) program handling ``bb`` whole events
    (multi-event blocks amortise per-program launch overhead for small L,
    same trick as the fused EdgeConv kernel's ``_events_per_program``).

    q_ref:    [bb, TL, D]  query coords
    kx_ref:   [bb, L, D]   all coords of these events
    kmask_ref:[bb, 1, L]   validity of keys (float32 0/1)
    idx_ref:  [bb, k, TL]  out neighbour indices (transposed rows)
    d_ref:    [bb, k, TL]  out neighbour squared distances (transposed)
    """
    t = pl.program_id(1)
    L = kx_ref.shape[1]
    for e in range(bb):
        q = q_ref[e]  # [TL, D]
        kx = kx_ref[e]  # [L, D]
        kmask = kmask_ref[e, 0]  # [L]

        qsq = jnp.sum(q * q, axis=1)[None, :]  # [1, TL]
        ksq = jnp.sum(kx * kx, axis=1, keepdims=True)  # [L, 1]
        cross = jax.lax.dot_general(
            kx,
            q,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [L, TL] keys x queries
        d2 = jnp.maximum(ksq + qsq - 2.0 * cross, 0.0)
        # mask invalid keys and self edges (key index == global query idx)
        d2 = jnp.where(kmask[:, None] > 0.5, d2, _BIG)
        key_row = jax.lax.broadcasted_iota(jnp.int32, (L, tl), 0)
        q_col = jax.lax.broadcasted_iota(jnp.int32, (L, tl), 1) + t * tl
        d2 = jnp.where(key_row == q_col, _BIG, d2)

        # streaming k-selection over the SUBLANE axis: k rounds of
        # (min, argmin-by-lowest-index, mask)
        for kk in range(k):
            m = jnp.min(d2, axis=0)  # [TL]
            is_min = d2 == m[None, :]
            # lowest key index among the minima (tie-break parity with
            # top_k)
            cand = jnp.where(is_min, key_row, L)
            a = jnp.min(cand, axis=0)  # [TL]
            idx_ref[e, kk, :] = a
            d_ref[e, kk, :] = m
            d2 = jnp.where(key_row == a[None, :], _BIG, d2)


@functools.partial(jax.jit, static_argnames=("k", "tile", "events_per_program"))
def knn_graph_pallas(
    coords: jax.Array,
    mask: jax.Array,
    k: int = 8,
    tile: int = 128,
    events_per_program: int = 2,
) -> Tuple[jax.Array, jax.Array]:
    """Batched kNN via the fused Pallas kernel.

    Args/returns identical to :func:`graphnet_tpu.ops.knn.knn_graph`.
    Requires ``L % tile == 0`` (bucket lengths are powers of two >= 16, so
    pass ``tile=min(L, 128)``).
    """
    B, L, D = coords.shape
    tile = min(tile, L)
    assert L % tile == 0, f"L={L} not a multiple of tile={tile}"

    # neighbour indices are non-differentiable; cut tangents so the kernel
    # is never traced under JVP (pallas_call has no JVP rule)
    coords = jax.lax.stop_gradient(coords)

    # per-event centering (translation-invariant ranking, better fp32)
    denom = jnp.maximum(jnp.sum(mask, axis=1), 1)[:, None]
    center = (
        jnp.sum(jnp.where(mask[..., None], coords, 0.0), axis=1) / denom
    )
    coords = (coords - center[:, None, :]).astype(jnp.float32)
    fmask = mask.astype(jnp.float32)

    # events per program (swept on an idle v5e at B=128, L=128, k=8 —
    # tools/bench_knn_kernel.py, 2026-08-19: bb=1 0.48 ms, bb=2 0.34 ms,
    # bb=4 0.56 ms, bb=8 0.77 ms, XLA 1.79 ms.  bb=2 halves the
    # per-program launch count while the two events' DMAs still overlap
    # compute; larger blocks serialise the pipeline.  An earlier bb=1
    # default came from a measurement polluted by host load.)
    bb = events_per_program if (L // tile == 1 and B % events_per_program == 0) else 1

    grid = (B // bb, L // tile)
    idx_t, d2_t = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, tl=tile, bb=bb),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (bb, tile, D),
                lambda b, t: (b, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bb, L, D), lambda b, t: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bb, 1, L), lambda b, t: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (bb, k, tile),
                lambda b, t: (b, 0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bb, k, tile),
                lambda b, t: (b, 0, t),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, k, L), jnp.int32),
            jax.ShapeDtypeStruct((B, k, L), jnp.float32),
        ],
    )(coords, coords, fmask[:, None, :])
    idx = jnp.swapaxes(idx_t, 1, 2)  # [B, L, k]
    d2 = jnp.swapaxes(d2_t, 1, 2)
    edge_mask = (d2 < _BIG * 0.5) & mask[:, :, None]
    return idx, edge_mask
