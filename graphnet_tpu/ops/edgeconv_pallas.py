"""Fused Pallas EdgeConv kernel.

Computes ``out[i] = sum_k mask[i,k] * relu(relu(a[i] + b[idx[i,k]]) @ W2 + b2)``
— the per-edge half of a linearised EdgeConv layer (see
``graphnet_tpu.models.components.layers.EdgeConv``) — without ever
materialising the ``[B, L, k, H1]`` message tensor in HBM:

  * the gather is a selection matmul on the MXU: rows of a
    ``[K*TL, L]`` 0/1 matrix select the neighbour row of ``b``.  Edge
    rows are K-MAJOR (row ``kk*TL + i`` is edge ``kk`` of node ``i``)
    so the self-term ``a[i]`` is added with a plain leading-dim tile
    repeat (``concatenate([a]*k, axis=0)``) and the k-reduction is a
    leading-dim reshape — both Mosaic-legal (a node-major ``i*k+kk``
    ordering needs a middle-dim broadcast, which Mosaic rejects:
    "infer-vector-layout: unsupported shape cast");
  * messages live in VMEM only; the second linear layer and the masked
    sum-reduction happen in-register;
  * the backward pass recomputes messages (rematerialisation); the
    *transposed* selection matmul is the scatter-add ``d_b = sel^T @
    g_z`` and ``d_a`` is the per-node sum over its k edge rows (the
    transpose of the repeat).  TPU grids execute sequentially per core,
    so grid-accumulated outputs (dW2, db2, d_b) are race-free.

Vs the r1-r3 kernels (which folded the self-term into the selection as
``[TL*K, L+TL]`` extra columns): the gather contraction dim halves in
both forward and backward, and the selection-matrix build halves —
exact same math (the matmul summed the two selected rows; now the sum
is an explicit VPU add).

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


def _selection_matrix(idx_t, tl, k, L, dtype):
    """[K*TL, L] 0/1: row kk*TL+i selects b[idx_t[kk, i]] (K-MAJOR edge
    rows; ``idx_t`` is the [k, TL] transposed index block)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (k, tl, L), 2)
    sel = col == idx_t[:, :, None]
    # merging leading dims keeps the lane dimension -> Mosaic-legal
    return sel.astype(dtype).reshape(k * tl, L)


def _repeat_rows(a, k):
    """[TL, H] -> [K*TL, H]: k tiled copies of ``a`` (the self-term of
    every edge row, K-MAJOR ordering).  A leading-dim concat — the
    Mosaic-legal repeat (an interleaved per-row repeat needs a
    middle-dim broadcast, which Mosaic rejects)."""
    return jnp.concatenate([a] * k, axis=0)


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
    idx_ref:[bb, k, TL]  neighbour indices (k-major / transposed)
    em_ref: [bb, k, TL]  edge mask (float 0/1, k-major)
    w2_ref: [H1, H2]     second-layer weights
    b2_ref: [1, H2]      second-layer bias
    out_ref:[bb, TL, H2]
    """
    L = b_ref.shape[1]
    for e in range(bb):
        a = a_ref[e]  # [TL, H1]
        b = b_ref[e]  # [L, H1]
        idx_t = idx_ref[e]  # [k, TL]
        em_t = em_ref[e]  # [k, TL]

        sel = _selection_matrix(idx_t, tl, k, L, b.dtype)
        z = jnp.dot(
            sel, b, preferred_element_type=jnp.float32
        ) + _repeat_rows(a, k).astype(
            jnp.float32
        )  # [K*TL, H1] = b[idx] + a
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
        out3 = out.reshape(k, tl, H2)
        if aggr == "add":
            out_ref[e] = jnp.sum(out3 * em_t[:, :, None], axis=0)
        else:  # masked max; nodes with no valid edge -> 0
            neg = jnp.float32(-1e30)
            m = jnp.max(
                jnp.where(em_t[:, :, None] > 0.5, out3, neg), axis=0
            )
            has = jnp.max(em_t, axis=0)[:, None]
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
        idx_t = idx_ref[e]  # [k, TL]
        em_t = em_ref[e]  # [k, TL]
        g = g_ref[e]  # [TL, H2]
        H2 = g.shape[1]

        @pl.when(t == 0)
        def _():
            db_ref[e] = jnp.zeros_like(db_ref[e])

        sel = _selection_matrix(idx_t, tl, k, L, b.dtype)
        z = jnp.dot(
            sel, b, preferred_element_type=jnp.float32
        ) + _repeat_rows(a, k).astype(jnp.float32)
        msgs = _lrelu(z, slope)

        # recompute second-layer pre-activation (incl. bias) to gate
        # grads through the final activation, matching the forward
        pre2 = jnp.dot(
            msgs.astype(w2_ref.dtype),
            w2_ref[...],
            preferred_element_type=jnp.float32,
        ) + b2_ref[0][None, :]
        gate2 = jnp.where(pre2 > 0.0, 1.0, jnp.float32(slope))
        # broadcast g over the leading (k) dim — Mosaic-legal
        g_rep = jnp.broadcast_to(g[None, :, :], (k, tl, H2))
        if aggr == "add":
            g_route = (g_rep * em_t[:, :, None]).reshape(k * tl, H2)
        else:
            # max aggregation: route the gradient to the first valid
            # argmax edge per (node, channel) — scatter_max semantics
            vals = _lrelu(pre2, slope).reshape(k, tl, H2)
            neg = jnp.float32(-1e30)
            masked = jnp.where(em_t[:, :, None] > 0.5, vals, neg)
            mx = jnp.max(masked, axis=0, keepdims=True)
            is_max = (masked == mx) & (em_t[:, :, None] > 0.5)
            # first argmax via min-index (cumsum is not lowerable in
            # Pallas TPU)
            kio = jax.lax.broadcasted_iota(
                jnp.int32, is_max.shape, 0
            )
            kidx = jnp.min(
                jnp.where(is_max, kio, k), axis=0, keepdims=True
            )
            first = kio == kidx
            g_route = (
                g_rep * first.astype(jnp.float32)
            ).reshape(k * tl, H2)
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
        # transposed selection matmul scatter-adds into d_b; d_a is the
        # per-node sum over its k outgoing edges (the transpose of the
        # broadcast-repeat) — a cheap sublane reduce instead of the
        # r1-r3 kernels' TL extra matmul columns
        db_ref[e] += jax.lax.dot_general(
            sel,
            g_z.astype(cdt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [L, H1]
        da_ref[e] = jnp.sum(
            g_z.reshape(k, tl, g_z.shape[1]), axis=0
        )


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
    # k-major [B, k, L] index/mask layout (the kernel's edge-row order);
    # a trivial XLA transpose of ~0.5 MB int32 — and a no-op once the
    # kNN kernel's native [B, k, L] output is plumbed straight through
    idx_t = jnp.swapaxes(idx, 1, 2)
    em_t = jnp.swapaxes(edge_mask, 1, 2).astype(jnp.float32)
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
                (bb, k, tl), lambda bi, t: (bi, 0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bb, k, tl), lambda bi, t: (bi, 0, t),
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
    )(a, b, idx_t, em_t, w2, b2.reshape(1, -1))


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
    idx_t = jnp.swapaxes(idx, 1, 2)
    em_t = jnp.swapaxes(edge_mask, 1, 2).astype(jnp.float32)
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
                (bb, k, tl), lambda bi, t: (bi, 0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bb, k, tl), lambda bi, t: (bi, 0, t),
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
    )(a, b, idx_t, em_t, w2, b2.reshape(1, -1), g.astype(jnp.float32))
    return (
        da,
        db,
        None,
        None,
        dw2.astype(w2.dtype),
        db2.reshape(-1),
    )


fused_edgeconv.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# fused EdgeConv + next-layer kNN
# ---------------------------------------------------------------------------


_KNN_BIG = 1e30


def _fwd_knn_kernel(
    a_ref,
    b_ref,
    idx_ref,
    em_ref,
    nm_ref,
    w2_ref,
    b2_ref,
    out_ref,
    nidx_ref,
    nem_ref,
    *,
    tl,
    k,
    aggr,
    slope,
    bb,
    knn_k,
    sub_lo,
    sub_hi,
):
    """Fused EdgeConv + next-layer kNN: one program per ``bb`` whole
    events (requires TL == L, i.e. L <= 128 buckets).  After the conv
    output is computed it is STILL IN VMEM — the kNN of the next layer
    (coords slice, per-event centering, distance matmul, streaming
    k-selection) runs right here, deleting the HBM round-trip + relayout
    glue between the conv and kNN kernels (the dominant kNN cost: the
    standalone kNN kernel is ~2us while its glue costs ~0.9 ms of the
    canonical forward).

    The conv math is IDENTICAL to :func:`_fwd_kernel` (same
    concat-selection contraction — the only 3D ops are the iota
    selection build and the masked reduce, both proven Mosaic-legal
    under bf16 in the production kernel).

    Extra refs vs ``_fwd_kernel``:
      nm_ref:   [bb, 1, L]   node validity (float 0/1)
      nidx_ref: [bb, L, knn_k] out neighbour indices (int32)
      nem_ref:  [bb, L, knn_k] out edge validity (float 0/1)
    """
    L = b_ref.shape[1]
    big = jnp.float32(_KNN_BIG)
    for e in range(bb):
        a = a_ref[e]
        b = b_ref[e]
        idx_t = idx_ref[e]  # [k, TL]
        em_t = em_ref[e]  # [k, TL]
        nm = nm_ref[e, 0]  # [L]

        sel = _selection_matrix(idx_t, tl, k, L, b.dtype)
        z = jnp.dot(
            sel, b, preferred_element_type=jnp.float32
        ) + _repeat_rows(a, k).astype(jnp.float32)
        msgs = _lrelu(z, slope)
        out = jnp.dot(
            msgs.astype(w2_ref.dtype),
            w2_ref[...],
            preferred_element_type=jnp.float32,
        ) + b2_ref[0][None, :]
        out = _lrelu(out, slope)
        H2 = out.shape[1]
        out3 = out.reshape(k, tl, H2)
        if aggr == "add":
            red = jnp.sum(out3 * em_t[:, :, None], axis=0)
        else:
            neg = jnp.float32(-1e30)
            m = jnp.max(
                jnp.where(em_t[:, :, None] > 0.5, out3, neg), axis=0
            )
            has = jnp.max(em_t, axis=0)[:, None]
            red = jnp.where(has > 0.5, m, 0.0)
        out_ref[e] = red

        # ---- kNN of the conv output (knn_graph semantics) ----
        coords = red[:, sub_lo:sub_hi]  # [L, D_sub]
        # per-event centering (translation-invariant ranking, fp32
        # accuracy — mirrors knn_graph_pallas's pre-pass)
        n_valid = jnp.maximum(jnp.sum(nm), 1.0)
        center = jnp.sum(coords * nm[:, None], axis=0) / n_valid
        coords = coords - center[None, :]
        csq = jnp.sum(coords * coords, axis=1)
        cross = jax.lax.dot_general(
            coords,
            coords,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d2 = jnp.maximum(csq[:, None] + csq[None, :] - 2.0 * cross, 0.0)
        d2 = jnp.where(nm[None, :] > 0.5, d2, big)
        col = jax.lax.broadcasted_iota(jnp.int32, (tl, L), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (tl, L), 0)
        d2 = jnp.where(col == row, big, d2)
        # streaming k-selection: ties go to the LOWER index, matching
        # knn_graph (min over candidate columns at the row minimum)
        for kk in range(knn_k):
            m = jnp.min(d2, axis=1, keepdims=True)
            is_min = d2 == m
            cand = jnp.where(is_min, col, L)
            argm = jnp.min(cand, axis=1)
            nidx_ref[e, :, kk] = argm
            nem_ref[e, :, kk] = jnp.where(
                (m[:, 0] < big * 0.5) & (nm > 0.5), 1.0, 0.0
            )
            d2 = jnp.where(col == argm[:, None], big, d2)


def _edgeconv_knn_fwd_impl(
    a, b, idx, edge_mask, nmask, w2, b2, *, aggr, slope, knn_k, sub_lo,
    sub_hi
):
    B, L, H1 = a.shape
    H2 = w2.shape[1]
    k = idx.shape[2]
    tl = L  # whole-event tiles only (L <= 128 buckets)
    bb = _events_per_program(B, L, H1)
    idx_t = jnp.swapaxes(idx, 1, 2)
    em_t = jnp.swapaxes(edge_mask, 1, 2).astype(jnp.float32)
    fm = nmask.astype(jnp.float32)[:, None, :]
    out, nidx, nem = pl.pallas_call(
        functools.partial(
            _fwd_knn_kernel,
            tl=tl,
            k=k,
            aggr=aggr,
            slope=slope,
            bb=bb,
            knn_k=knn_k,
            sub_lo=sub_lo,
            sub_hi=sub_hi,
        ),
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec(
                (bb, tl, H1), lambda bi: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bb, L, H1), lambda bi: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bb, k, tl), lambda bi: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bb, k, tl), lambda bi: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bb, 1, L), lambda bi: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (H1, H2), lambda bi: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, H2), lambda bi: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (bb, tl, H2), lambda bi: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bb, tl, knn_k), lambda bi: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bb, tl, knn_k), lambda bi: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L, H2), jnp.float32),
            jax.ShapeDtypeStruct((B, L, knn_k), jnp.int32),
            jax.ShapeDtypeStruct((B, L, knn_k), jnp.float32),
        ],
    )(a, b, idx_t, em_t, fm, w2, b2.reshape(1, -1))
    return out, nidx, nem > 0.5


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11)
)
def fused_edgeconv_knn(
    a, b, idx, edge_mask, nmask, w2, b2, aggr="add", slope=0.0,
    knn_k=8, sub_lo=0, sub_hi=3
):
    """Fused EdgeConv forward + kNN of its output in one kernel.

    Same conv math as :func:`fused_edgeconv`; additionally returns the
    next layer's adjacency computed from ``out[..., sub_lo:sub_hi]``
    with :func:`graphnet_tpu.ops.knn.knn_graph` semantics (per-event
    centering, no self loops, ties toward lower index).  Deletes the
    HBM round-trip and relayout glue between the conv and kNN kernels
    (VERDICT r2 item 2 — measured ~0.9 ms of the 2.9 ms forward).

    a/b/idx/edge_mask/w2/b2 as in fused_edgeconv; nmask: [B, L] node
    validity.  Requires L <= 128 (whole-event tiles).
    Returns ``(out [B,L,H2] fp32, new_idx [B,L,knn_k] int32,
    new_edge_mask [B,L,knn_k] bool)``.
    """
    return _edgeconv_knn_fwd_impl(
        a, b, idx, edge_mask, nmask, w2, b2,
        aggr=aggr, slope=slope, knn_k=knn_k, sub_lo=sub_lo, sub_hi=sub_hi
    )


def _fused_knn_fwd(
    a, b, idx, edge_mask, nmask, w2, b2, aggr, slope, knn_k, sub_lo,
    sub_hi
):
    res = _edgeconv_knn_fwd_impl(
        a, b, idx, edge_mask, nmask, w2, b2,
        aggr=aggr, slope=slope, knn_k=knn_k, sub_lo=sub_lo, sub_hi=sub_hi
    )
    return res, (a, b, idx, edge_mask, w2, b2)


def _fused_knn_bwd(aggr, slope, knn_k, sub_lo, sub_hi, res, g):
    a, b, idx, edge_mask, w2, b2 = res
    g_out = g[0]  # idx/edge_mask cotangents are zero (non-diff outputs)
    da, db, _, _, dw2, db2 = _fused_bwd(
        a.shape[1], aggr, slope, (a, b, idx, edge_mask, w2, b2), g_out
    )
    return (da, db, None, None, None, dw2, db2)


fused_edgeconv_knn.defvjp(_fused_knn_fwd, _fused_knn_bwd)
