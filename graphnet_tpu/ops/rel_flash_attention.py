"""Streaming (flash-style) attention WITH the DeepIce relative
spacetime bias — O(L·ts) memory instead of the O(L²) materialised
pair tensor.

DeepIce's ``AttentionRel`` (reference ``models/components/layers.py:389-499``)
uses pairwise features ``rel[b,i,j,:] = SinEmb(d(x_i,x_j)) @ W + b`` as
BOTH a relative key (contracted with the scaled query into the logits)
and a relative value (attention-weighted into the output).  Naively
that forces three O(L²·e) tensors through HBM per block — the measured
reason DeepIce sits at MFU 0.02 (BENCH_r03 ``deepice_l768.roofline``).

Two algebraic folds make the bias streamable with NO in-tile dense
layer (the projection moves to O(L) work outside the scan):

* relative key::

      logits[h,i,j] += Σ_c q[h,i,c]·(emb[i,j,:]@W + b)[c]
                     = Σ_e (q[h]@Wᵀ)[i,e]·emb[i,j,e] + (q[h]@b)[i]

  so the tile kernel contracts the *unprojected* sin/cos features with
  a pre-computed ``q̃ = q@Wᵀ``, and the ``q·b`` term is a per-row logit
  offset independent of j.

* relative value: softmax rows sum to 1 over valid keys, so::

      out[h,i,:] += Σ_j a[h,i,j]·(emb[i,j,:]@W + b)
                  = (Σ_j a[h,i,j]·emb[i,j,:])@W + b

  the scan accumulates attention-weighted *embeddings* ``oe`` and the
  single ``oe@W + b`` GEMM runs once per block outside the scan.

The pair feature itself is recomputed per (query-tile × key-tile) from
the O(L) node coordinates — exactly the SpacetimeEncoder math
(``models/components/embedding.py:107``): signed sqrt of the spacetime
interval, clipped, sinusoidally embedded with geometric frequencies.

This module provides the tiled pure-JAX implementation (lax.scan over
key tiles with online-softmax rescaling — identical numerics contract
to ``ops/flash_attention.py``); it runs on any backend and is the
lowering spec for the Pallas TPU kernel (round-4 work: same tiling,
tiles resident in VMEM).  Verified against the materialised
``AttentionRel`` path in ``tests/test_rel_flash_attention.py``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

__all__ = [
    "pair_distance",
    "sinusoidal_pair_emb",
    "rel_attention_streaming",
    "rel_flash_attention",
]

# light speed in the scaled detector units (embedding.py:128)
_C = 3e4 / 500 * 3e-1
_CLIP = 4.0
_ARG_SCALE = 1024.0


def pair_distance(x_q: jax.Array, x_k: jax.Array) -> jax.Array:
    """Signed sqrt spacetime interval between node blocks.

    Args:
        x_q: ``[B, Lq, >=4]`` (pos xyz + time in scaled units).
        x_k: ``[B, Lk, >=4]``.
    Returns:
        ``[B, Lq, Lk]`` fp32, clipped to ±4 and pre-scaled by 1024 —
        ready for :func:`sinusoidal_pair_emb`.
    """
    pos_q, t_q = x_q[..., :3], x_q[..., 3]
    pos_k, t_k = x_k[..., :3], x_k[..., 3]
    interval = jnp.sum(
        (pos_q[:, :, None, :] - pos_k[:, None, :, :]) ** 2, axis=-1
    ) - ((t_q[:, :, None] - t_k[:, None, :]) * _C) ** 2
    d = jnp.sign(interval) * jnp.sqrt(jnp.abs(interval))
    return _ARG_SCALE * jnp.clip(d, -_CLIP, _CLIP)


def _freqs(dim: int) -> np.ndarray:
    """Geometric frequencies, bit-matching SinusoidalPosEmb
    (embedding.py:31-35, incl. the fp32-rounded log)."""
    half = dim // 2
    log_nf = np.float32(np.log(np.float32(10000.0)))
    return np.exp(
        np.arange(half, dtype=np.float32)
        * np.float32(-log_nf / np.float32(half))
    )


def sinusoidal_pair_emb(d: jax.Array, dim: int) -> jax.Array:
    """``[..., ] -> [..., dim]``: ``[sin(d f), cos(d f)]``."""
    arg = d[..., None] * jnp.asarray(_freqs(dim))
    return jnp.concatenate([jnp.sin(arg), jnp.cos(arg)], axis=-1)


def rel_attention_streaming(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    x0: jax.Array,
    w_proj: jax.Array,
    b_proj: jax.Array,
    key_padding_mask: Optional[jax.Array] = None,
    ts: int = 128,
) -> jax.Array:
    """Relative-bias attention, streamed over key tiles.

    Exact same math as ``AttentionRel``'s materialised biased path
    (softmax in fp32, bias applied as relative key AND value) without
    ever holding an ``[B, L, L, e]`` tensor: peak extra memory is one
    ``[B, H?, Lq, ts]`` logits tile and one ``[B, Lq, ts, e]`` embedding
    tile.

    Args:
        q: ``[B, H, L, hd]`` — ALREADY scaled by ``hd**-0.5`` (the
            caller applies the scale, as ``AttentionRel`` does).
        k, v: ``[B, H, L, hd]``.
        x0: ``[B, L, >=4]`` raw node coordinates (pos xyz, time).
        w_proj: ``[e, e]`` SpacetimeEncoder projection kernel
            (``e == hd``; flax Dense layout: out = emb @ w + b).
        b_proj: ``[e]``.
        key_padding_mask: ``[B, L]`` bool, True = valid key.
        ts: key-tile size (L must be a multiple or it is right-padded
            internally).
    Returns:
        ``[B, L, H, hd]`` fp32 — NOTE the layout: heads last, matching
        the ``transpose(0, 2, 1, 3)`` point in ``AttentionRel`` where
        the relative-value term is added.
    """
    B, H, L, hd = q.shape
    e = w_proj.shape[0]
    if L % ts:
        pad = ts - L % ts
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        x0 = jnp.pad(x0, ((0, 0), (0, pad), (0, 0)))
        mask = (
            key_padding_mask
            if key_padding_mask is not None
            else jnp.ones((B, L), bool)
        )
        key_padding_mask = jnp.pad(mask, ((0, 0), (0, pad)))
    Lp = k.shape[2]
    n_tiles = Lp // ts

    # fold the projection into the query (relative-key term) --------
    q_tilde = jnp.einsum("bhld,ed->bhle", q, w_proj)  # [B,H,L,e]
    q_dot_b = jnp.einsum("bhld,d->bhl", q, b_proj)  # [B,H,L]

    k_tiles = k.reshape(B, H, n_tiles, ts, hd)
    v_tiles = v.reshape(B, H, n_tiles, ts, hd)
    x_tiles = x0.reshape(B, n_tiles, ts, x0.shape[-1])
    m_tiles = (
        key_padding_mask.reshape(B, n_tiles, ts)
        if key_padding_mask is not None
        else None
    )

    neg = jnp.finfo(jnp.float32).min

    def step(carry, tile):
        m_run, l_run, o_run, oe_run = carry
        k_t, v_t, x_t, msk = tile
        # logits tile [B,H,L,ts]: qk term + relative-key term + q·b
        s = jnp.einsum(
            "bhld,bhtd->bhlt", q, k_t, preferred_element_type=jnp.float32
        )
        d = pair_distance(x0[:, :L], x_t)  # [B,L,ts]
        emb = sinusoidal_pair_emb(d, e)  # [B,L,ts,e] fp32
        s = s + jnp.einsum(
            "bhle,blte->bhlt",
            q_tilde,
            emb,
            preferred_element_type=jnp.float32,
        )
        s = s + q_dot_b[..., None]
        if msk is not None:
            s = jnp.where(msk[:, None, None, :], s, neg)
        # online softmax rescale
        m_new = jnp.maximum(m_run, s.max(axis=-1))
        alpha = jnp.exp(m_run - m_new)
        p = jnp.exp(s - m_new[..., None])  # [B,H,L,ts]
        l_new = l_run * alpha + p.sum(axis=-1)
        o_new = o_run * alpha[..., None] + jnp.einsum(
            "bhlt,bhtd->bhld", p, v_t, preferred_element_type=jnp.float32
        )
        # attention-weighted embedding accumulator (relative value,
        # pre-projection)
        oe_new = oe_run * alpha[..., None] + jnp.einsum(
            "bhlt,blte->bhle", p, emb, preferred_element_type=jnp.float32
        )
        return (m_new, l_new, o_new, oe_new), None

    init = (
        jnp.full((B, H, L), neg, jnp.float32),
        jnp.zeros((B, H, L), jnp.float32),
        jnp.zeros((B, H, L, hd), jnp.float32),
        jnp.zeros((B, H, L, e), jnp.float32),
    )
    tiles = (
        jnp.moveaxis(k_tiles, 2, 0),
        jnp.moveaxis(v_tiles, 2, 0),
        jnp.moveaxis(x_tiles, 1, 0),
        jnp.moveaxis(m_tiles, 1, 0) if m_tiles is not None else None,
    )
    if tiles[3] is None:
        tiles = tiles[:3] + (
            jnp.ones((n_tiles, B, ts), bool),
        )
    (m_f, l_f, o_f, oe_f), _ = jax.lax.scan(step, init, tiles)

    inv_l = 1.0 / l_f  # rows with no valid key never occur in DeepIce
    o = o_f * inv_l[..., None]
    oe = oe_f * inv_l[..., None]
    # un-fold the relative-value projection: Σ_j a·(emb@W + b)
    #   = (Σ_j a·emb)@W + b  (softmax rows sum to 1)
    o_rel = jnp.einsum("bhle,ed->bhld", oe, w_proj) + b_proj
    out = (o + o_rel).transpose(0, 2, 1, 3)  # [B, L, H, hd]
    return out


# ---------------------------------------------------------------------------
# Pallas TPU kernel (forward) — same math, tiles resident in VMEM
# ---------------------------------------------------------------------------

# see ops/flash_attention.py:_NEG for the magnitude rationale
_NEG_K = -1e5

_TWO_PI = float(2.0 * np.pi)


def _sincos_rr(x):
    """sin/cos with explicit range reduction.

    The embedding argument spans ±4096; Mosaic's fp32 sin/cos loses
    ~12% absolute accuracy out there (measured vs XLA on a v5e —
    logs/tpu_rel_flash.log), while XLA's lowering does proper range
    reduction.  One fp32 round-trip (x − 2π·round(x/2π)) bounds the
    argument to ±π at ≤5e-4 rad rounding error — below the bf16
    noise floor of the surrounding attention math."""
    r = x - _TWO_PI * jnp.round(x * (1.0 / _TWO_PI))
    return jnp.sin(r), jnp.cos(r)


def _dot(a, b, dims):
    return jax.lax.dot_general(
        a, b, (dims, ((), ())), preferred_element_type=jnp.float32
    )


def _pair_arg(xq, ones_q, xk):
    """Spacetime-interval sin/cos argument for one key chunk.

    Computes per-coordinate DIFFERENCES then squares (the quadratic
    expansion ``|a|²+|b|²−2ab`` cancels catastrophically near the
    light cone and the ×1024·sin() downstream amplifies sqrt-of-ε to
    O(1) — measured 2e-2 output error).  All operands 2D (Mosaic: no
    lane-dim reshapes/transposes); the j-indexed row broadcasts ride
    exact K=1 matmuls (``ones_q @ colᵀ``, 1·x == x in fp32).
    ``xq [tq,>=4]``, ``ones_q [tq,1]``, ``xk [ts,>=4]`` → ``[tq,ts]``.
    """
    interval = jnp.zeros((xq.shape[0], xk.shape[0]), jnp.float32)
    c2 = jnp.asarray(_C, jnp.float32) ** 2
    for c in range(4):
        row = _dot(ones_q, xk[:, c : c + 1], ((1,), (1,)))  # [tq, ts]
        delta = xq[:, c : c + 1] - row
        interval = interval + (delta * delta if c < 3 else -c2 * delta * delta)
    d = jnp.sign(interval) * jnp.sqrt(jnp.abs(interval))
    return jnp.asarray(_ARG_SCALE, jnp.float32) * jnp.clip(
        d, -_CLIP, _CLIP
    )


def _rel_fwd_kernel(
    q_ref,  # [1, tq, hd]  (pre-scaled)
    qt_ref,  # [1, tq, e]   q̃ = q_scaled @ Wᵀ
    qb_ref,  # [1, tq, 1]   q_scaled · b
    k_ref,  # [1, L, hd]
    v_ref,  # [1, L, hd]
    xq_ref,  # [1, tq, xf]  query-side coordinates
    xk_ref,  # [1, L, xf]   key-side coordinates (same array)
    mask_ref,  # [1, 1, L]
    o_ref,  # [1, tq, hd]
    oe_ref,  # [1, tq, e]   Σ_j a·emb (normalised)
    lse_ref,  # [1, tq, 1]
    *,
    tq: int,
    ts: int,
    e: int,
    freqs: tuple,
):
    dt = q_ref.dtype
    q = q_ref[0]
    qt = qt_ref[0].astype(jnp.float32)
    qb = qb_ref[0].astype(jnp.float32)
    xq = xq_ref[0].astype(jnp.float32)
    L = k_ref.shape[1]
    hd = q.shape[-1]
    half = e // 2

    ones_q = jnp.ones((tq, 1), jnp.float32)
    # one-hot lane masks for assembling [tq, e] accumulator columns
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, e), 1)

    m = jnp.full((tq, 1), _NEG_K, jnp.float32)
    l = jnp.zeros((tq, 1), jnp.float32)
    acc = jnp.zeros((tq, hd), jnp.float32)
    acc_e = jnp.zeros((tq, e), jnp.float32)
    for s in range(L // ts):
        kc = k_ref[0, s * ts : (s + 1) * ts, :]
        vc = v_ref[0, s * ts : (s + 1) * ts, :]
        xk = xk_ref[0, s * ts : (s + 1) * ts, :].astype(jnp.float32)
        arg = _pair_arg(xq, ones_q, xk)  # [tq, ts]
        logits = _dot(q, kc, ((1,), (1,))) + qb  # [tq, ts]
        for h in range(half):
            sin_h, cos_h = _sincos_rr(arg * freqs[h])
            logits = (
                logits
                + qt[:, h : h + 1] * sin_h
                + qt[:, half + h : half + h + 1] * cos_h
            )
        valid = mask_ref[0, 0:1, s * ts : (s + 1) * ts]  # [1, ts]
        logits = jnp.where(valid > 0, logits, _NEG_K)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.exp(logits - m_new)  # [tq, ts] fp32
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + _dot(p.astype(dt), vc, ((1,), (0,)))
        # attention-weighted embedding: recompute sin/cos (cheaper than
        # keeping e live [tq,ts] planes in VMEM across the softmax)
        upd = jnp.zeros((tq, e), jnp.float32)
        for h in range(half):
            sin_h, cos_h = _sincos_rr(arg * freqs[h])
            s_h = jnp.sum(p * sin_h, axis=-1, keepdims=True)
            c_h = jnp.sum(p * cos_h, axis=-1, keepdims=True)
            upd = (
                upd
                + s_h * (lane == h).astype(jnp.float32)
                + c_h * (lane == half + h).astype(jnp.float32)
            )
        acc_e = acc_e * corr + upd
        m = m_new
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    oe_ref[0] = (acc_e / l_safe).astype(oe_ref.dtype)
    lse_ref[0] = m + jnp.log(l_safe)


def _rel_fwd(q, qt, qb, k, v, x0, mask, tq, ts, freqs, interpret):
    BH, L, hd = q.shape
    e = qt.shape[-1]
    xf = x0.shape[-1]
    grid = (BH, L // tq)
    kern = functools.partial(
        _rel_fwd_kernel, tq=tq, ts=ts, e=e, freqs=freqs
    )
    o, oe, lse = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, tq, e), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, tq, 1), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, L, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, L, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, tq, xf), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, L, xf), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, L), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tq, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, tq, e), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, tq, 1), lambda b, i: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, L, hd), q.dtype),
            jax.ShapeDtypeStruct((BH, L, e), jnp.float32),
            jax.ShapeDtypeStruct((BH, L, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q, qt, qb, k, v, x0, x0, mask)
    return o, oe, lse


def rel_flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    x0: jax.Array,
    w_proj: jax.Array,
    b_proj: jax.Array,
    key_padding_mask: Optional[jax.Array] = None,
    tq: int = 128,
    ts: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Pallas TPU forward of :func:`rel_attention_streaming`.

    Same contract (``q`` pre-scaled; returns ``[B, L, H, hd]`` fp32);
    the ``[B,H,L,ts]`` logits and ``[B,L,ts,e]`` embedding tiles stay
    in VMEM.  FORWARD ONLY for now — gradients raise (the custom VJP
    lands with the TPU validation pass; train-time callers keep the
    chunked-dense path until then).
    """
    B, H, L, hd = q.shape
    e = w_proj.shape[0]
    if L % tq or L % ts:
        raise ValueError(f"L={L} must be divisible by tq={tq}, ts={ts}")
    # fold the projection into the (already scaled) query
    q_tilde = jnp.einsum("bhld,ed->bhle", q, w_proj)
    q_dot_b = jnp.einsum("bhld,d->bhl", q, b_proj)[..., None]
    if key_padding_mask is None:
        key_padding_mask = jnp.ones((B, L), bool)
    mask = jnp.repeat(
        key_padding_mask.astype(jnp.float32), H, axis=0
    )[:, None, :]
    x0r = jnp.repeat(x0[:, None], H, axis=1).reshape(
        B * H, L, x0.shape[-1]
    )

    def bh(t):
        return t.reshape(B * H, L, t.shape[-1])

    freqs = tuple(float(f) for f in _freqs(e))
    o, oe, lse = _rel_fwd(
        bh(q),
        bh(q_tilde),
        bh(q_dot_b),
        bh(k),
        bh(v),
        x0r,
        mask,
        tq,
        ts,
        freqs,
        interpret,
    )
    o = o.reshape(B, H, L, hd).astype(jnp.float32)
    oe = oe.reshape(B, H, L, e)
    o_rel = jnp.einsum("bhle,ed->bhld", oe, w_proj) + b_proj
    return (o + o_rel).transpose(0, 2, 1, 3)
