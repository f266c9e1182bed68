"""Fused Pallas EdgeConv kernel.

Computes ``out[i] = sum_k mask[i,k] * relu(relu(a[i] + b[idx[i,k]]) @ W2 + b2)``
— the per-edge half of a linearised EdgeConv layer (see
``graphnet_tpu.models.components.layers.EdgeConv``) — without ever
materialising the ``[B, L, k, H1]`` message tensor in HBM:

  * gather AND self-term addition are one selection matmul on the MXU:
    rows of a ``[TL*K, L+TL]`` 0/1 matrix select the neighbour row of
    ``b`` (first L columns) and the node's own row of ``a`` (last TL
    columns), so ``sel @ [b; a] = b[idx] + a`` in a single contraction —
    no 3D broadcasts (which Mosaic restricts under bf16 tiling);
  * messages live in VMEM only; the second linear layer and the masked
    sum-reduction happen in-register;
  * the backward pass recomputes messages (rematerialisation); the
    *transposed* selection matmul yields both gradients at once:
    ``sel^T @ g_z = [d_b (scatter-add); d_a]``.  TPU grids execute
    sequentially per core, so grid-accumulated outputs (dW2, db2, d_b)
    are race-free.

Supports the "add" aggregation (DynEdge's configuration,
reference ``gnn/dynedge.py:209``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _selection_matrix(idx, tl, k, L, dtype):
    """[TL*K, L+TL] 0/1: row i*k+kk selects b[idx[i,kk]] and a[i]."""
    col = jax.lax.broadcasted_iota(jnp.int32, (tl, k, L + tl), 2)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (tl, k, L + tl), 0)
    sel = (col == idx[:, :, None]) | (col == L + row_i)
    # merging leading dims keeps the lane dimension -> Mosaic-legal
    return sel.astype(dtype).reshape(tl * k, L + tl)


def _lrelu(x, slope):
    return jnp.where(x > 0.0, x, slope * x) if slope else jnp.maximum(x, 0.0)


def _fwd_kernel(
    a_ref, b_ref, idx_ref, em_ref, w2_ref, b2_ref, out_ref, *, tl, k,
    aggr, slope, bb
):
    """Grid (B//bb, L//TL); each program handles ``bb`` whole events
    (amortises per-program launch/DMA overhead when L is small).

    a_ref:  [bb, TL, H1] self-term (pre-activation, incl. bias)
    b_ref:  [bb, L, H1]  neighbour-term for the whole event
    idx_ref:[bb, TL, k]  neighbour indices
    em_ref: [bb, TL, k]  edge mask (float 0/1)
    w2_ref: [H1, H2]     second-layer weights
    b2_ref: [1, H2]      second-layer bias
    out_ref:[bb, TL, H2]
    """
    L = b_ref.shape[1]
    for e in range(bb):
        a = a_ref[e]  # [TL, H1]
        b = b_ref[e]  # [L, H1]
        idx = idx_ref[e]  # [TL, k]
        em = em_ref[e]  # [TL, k]

        sel = _selection_matrix(idx, tl, k, L, b.dtype)
        ba = jnp.concatenate([b, a], axis=0)  # [L+TL, H1]
        z = jnp.dot(
            sel, ba, preferred_element_type=jnp.float32
        )  # [TL*K, H1] = b[idx] + a
        msgs = _lrelu(z, slope)
        out = jnp.dot(
            msgs.astype(w2_ref.dtype),
            w2_ref[...],
            preferred_element_type=jnp.float32,
        ) + b2_ref[0][None, :]
        # the conv MLPs apply the activation after every linear
        # (dynedge.py:190-210 / DynTrans layers.py:152-158)
        out = _lrelu(out, slope)
        H2 = out.shape[1]
        out3 = out.reshape(tl, k, H2)
        if aggr == "add":
            out_ref[e] = jnp.sum(out3 * em[:, :, None], axis=1)
        else:  # masked max; nodes with no valid edge -> 0
            neg = jnp.float32(-1e30)
            m = jnp.max(
                jnp.where(em[:, :, None] > 0.5, out3, neg), axis=1
            )
            has = jnp.max(em, axis=1)[:, None]
            out_ref[e] = jnp.where(has > 0.5, m, 0.0)


def _bwd_kernel(
    a_ref,
    b_ref,
    idx_ref,
    em_ref,
    w2_ref,
    b2_ref,
    g_ref,
    da_ref,
    db_ref,
    dw2_ref,
    db2_ref,
    *,
    tl,
    k,
    aggr,
    slope,
    bb,
):
    """Grid (B//bb, L//TL); each program handles ``bb`` events;
    db/dw2/db2 accumulate across grid steps."""
    t = pl.program_id(1)
    bi = pl.program_id(0)
    L = b_ref.shape[1]

    # zero accumulators at the start of their accumulation scope
    @pl.when(jnp.logical_and(bi == 0, t == 0))
    def _():
        dw2_ref[...] = jnp.zeros_like(dw2_ref[...])
        db2_ref[...] = jnp.zeros_like(db2_ref[...])

    for e in range(bb):
        a = a_ref[e]
        b = b_ref[e]
        idx = idx_ref[e]
        em = em_ref[e]
        g = g_ref[e]  # [TL, H2]
        H2 = g.shape[1]

        @pl.when(t == 0)
        def _():
            db_ref[e] = jnp.zeros_like(db_ref[e])

        sel = _selection_matrix(idx, tl, k, L, b.dtype)
        ba = jnp.concatenate([b, a], axis=0)
        z = jnp.dot(sel, ba, preferred_element_type=jnp.float32)
        msgs = _lrelu(z, slope)

        # recompute second-layer pre-activation (incl. bias) to gate
        # grads through the final activation, matching the forward
        pre2 = jnp.dot(
            msgs.astype(w2_ref.dtype),
            w2_ref[...],
            preferred_element_type=jnp.float32,
        ) + b2_ref[0][None, :]
        gate2 = jnp.where(pre2 > 0.0, 1.0, jnp.float32(slope))
        if aggr == "add":
            g_route = (
                g[:, None, :] * em[:, :, None]
            ).reshape(tl * k, H2)
        else:
            # max aggregation: route the gradient to the first valid
            # argmax edge per (node, channel) — scatter_max semantics
            vals = _lrelu(pre2, slope).reshape(tl, k, H2)
            neg = jnp.float32(-1e30)
            masked = jnp.where(em[:, :, None] > 0.5, vals, neg)
            mx = jnp.max(masked, axis=1, keepdims=True)
            is_max = (masked == mx) & (em[:, :, None] > 0.5)
            # first argmax via min-index (cumsum is not lowerable in
            # Pallas TPU)
            kio = jax.lax.broadcasted_iota(
                jnp.int32, is_max.shape, 1
            )
            kidx = jnp.min(
                jnp.where(is_max, kio, k), axis=1, keepdims=True
            )
            first = kio == kidx
            g_route = (
                g[:, None, :] * first.astype(jnp.float32)
            ).reshape(tl * k, H2)
        g_msgs = g_route * gate2

        # big backward matmuls at the layer's compute dtype (bf16 in
        # mixed-precision mode) with fp32 accumulation
        cdt = b.dtype
        g_msgs_c = g_msgs.astype(cdt)
        dw2_ref[...] += jax.lax.dot_general(
            msgs.astype(cdt),
            g_msgs_c,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dw2_ref.dtype)
        db2_ref[...] += jnp.sum(
            g_msgs, axis=0, keepdims=True
        ).astype(db2_ref.dtype)

        g_z = jnp.dot(
            g_msgs_c,
            w2_ref[...].T.astype(cdt),
            preferred_element_type=jnp.float32,
        ) * jnp.where(z > 0.0, 1.0, jnp.float32(slope))
        # transposed selection matmul: rows 0..L-1 scatter-add into
        # d_b, rows L..L+TL-1 are d_a for this tile
        contrib = jax.lax.dot_general(
            sel,
            g_z.astype(cdt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [L+TL, H1]
        db_ref[e] += contrib[:L]
        da_ref[e] = contrib[L:]


def _events_per_program(B: int, L: int, H1: int) -> int:
    """Events handled by one grid program: amortise per-program overhead
    for small L while keeping block VMEM below ~4MB."""
    budget = max(1, 512 // L)
    bb = 1
    for cand in (8, 4, 2):
        if cand <= budget and B % cand == 0:
            bb = cand
            break
    # VMEM guard: bb * (L + tl) * H1 * 4B per operand
    while bb > 1 and bb * 2 * L * H1 * 4 > 4 * 1024 * 1024:
        bb //= 2
    return bb if B % bb == 0 else 1


def _edgeconv_fwd_impl(
    a, b, idx, edge_mask, w2, b2, *, tile, aggr="add", slope=0.0
):
    B, L, H1 = a.shape
    H2 = w2.shape[1]
    k = idx.shape[2]
    tl = min(tile, L)
    assert L % tl == 0
    bb = _events_per_program(B, L, H1) if tl == L else 1
    em = edge_mask.astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel, tl=tl, k=k, aggr=aggr, slope=slope, bb=bb
        ),
        grid=(B // bb, L // tl),
        in_specs=[
            pl.BlockSpec(
                (bb, tl, H1), lambda bi, t: (bi, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bb, L, H1), lambda bi, t: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bb, tl, k), lambda bi, t: (bi, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bb, tl, k), lambda bi, t: (bi, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (H1, H2), lambda bi, t: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, H2), lambda bi, t: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (bb, tl, H2), lambda bi, t: (bi, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, L, H2), jnp.float32),
    )(a, b, idx, em, w2, b2.reshape(1, -1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_edgeconv(
    a, b, idx, edge_mask, w2, b2, tile=128, aggr="add", slope=0.0
):
    """``aggr_k em[i,k] act(act(a[i] + b[idx[i,k]]) @ w2 + b2)`` per node,
    where ``act`` is (leaky-)relu with ``slope`` and ``aggr`` is
    "add" (DynEdge) or "max" (TITO's EdgeConvTito).

    a: [B, L, H1]; b: [B, L, H1]; idx: [B, L, k]; edge_mask: [B, L, k];
    w2: [H1, H2]; b2: [H2].  Returns [B, L, H2] (fp32).
    """
    return _edgeconv_fwd_impl(
        a, b, idx, edge_mask, w2, b2, tile=tile, aggr=aggr, slope=slope
    )


def _fused_fwd(a, b, idx, edge_mask, w2, b2, tile, aggr, slope):
    out = _edgeconv_fwd_impl(
        a, b, idx, edge_mask, w2, b2, tile=tile, aggr=aggr, slope=slope
    )
    return out, (a, b, idx, edge_mask, w2, b2)


def _fused_bwd(tile, aggr, slope, res, g):
    a, b, idx, edge_mask, w2, b2 = res
    B, L, H1 = a.shape
    H2 = w2.shape[1]
    k = idx.shape[2]
    tl = min(tile, L)
    bb = _events_per_program(B, L, H1) if tl == L else 1
    em = edge_mask.astype(jnp.float32)
    da, db, dw2, db2 = pl.pallas_call(
        functools.partial(
            _bwd_kernel, tl=tl, k=k, aggr=aggr, slope=slope, bb=bb
        ),
        grid=(B // bb, L // tl),
        in_specs=[
            pl.BlockSpec(
                (bb, tl, H1), lambda bi, t: (bi, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bb, L, H1), lambda bi, t: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bb, tl, k), lambda bi, t: (bi, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bb, tl, k), lambda bi, t: (bi, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (H1, H2), lambda bi, t: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, H2), lambda bi, t: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bb, tl, H2), lambda bi, t: (bi, t, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (bb, tl, H1), lambda bi, t: (bi, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bb, L, H1), lambda bi, t: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (H1, H2), lambda bi, t: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, H2), lambda bi, t: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L, H1), jnp.float32),
            jax.ShapeDtypeStruct((B, L, H1), jnp.float32),
            jax.ShapeDtypeStruct((H1, H2), jnp.float32),
            jax.ShapeDtypeStruct((1, H2), jnp.float32),
        ],
    )(a, b, idx, em, w2, b2.reshape(1, -1), g.astype(jnp.float32))
    return (
        da,
        db,
        None,
        None,
        dw2.astype(w2.dtype),
        db2.reshape(-1),
    )


fused_edgeconv.defvjp(_fused_fwd, _fused_bwd)
