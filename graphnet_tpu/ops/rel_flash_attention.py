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
from jax.experimental.pallas import tpu as pltpu

# The backward kernels hold more per-chunk planes live than the
# default 16 MB scoped-VMEM stack fits at long L (B=8 L=1536 hg=4
# overflowed it by 3.6 MB — the exact shape the auto policy engages
# at).  v5e has 128 MB of VMEM; raise the scoped limit for all three
# kernels.
_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=64 * 1024 * 1024
)

__all__ = [
    "pair_distance",
    "sinusoidal_pair_emb",
    "rel_attention_streaming",
    "rel_flash_attention",
    "rel_flash_supported",
    "rel_flash_tiles",
]


def rel_flash_tiles(L: int) -> tuple:
    """Pick (tq, ts) for :func:`rel_flash_attention` at sequence
    length ``L`` — the largest of the preferred tile sizes that
    divide L (Mosaic: tq must be sublane-aligned, ts lane-aligned)."""
    tq = next((t for t in (128, 64, 32, 16, 8) if L % t == 0), 0)
    ts = next((t for t in (256, 128) if L % t == 0), 0)
    return tq, ts


def rel_flash_supported(L: int, hd: int) -> bool:
    """Shape gate for the Pallas kernel: the rel-value fold needs the
    pair-feature dim == head dim (DeepIce always satisfies this), an
    even head dim (sin/cos halves) and Mosaic-legal tiles."""
    tq, ts = rel_flash_tiles(L)
    return hd % 2 == 0 and tq >= 8 and ts >= 128

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

def _sincos_rr(x):
    """Plain sin/cos — Mosaic's fp32 transcendentals are exact to
    1.2e-7 even at ±4096 (measured, tools/tpu_check_rel_flash.py probe;
    an explicit fp32 range reduction is WORSE at 2.3e-4).  Kept as a
    seam so the probe and the kernel share one definition."""
    return jnp.sin(x), jnp.cos(x)


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
        # the broadcast MUST be exact: the TPU default matmul precision
        # is bf16 on the MXU even for fp32 operands, which rounds the
        # coordinates and puts ~12% absolute error on the attention
        # output (measured — logs/tpu_rel_flash2.log); HIGHEST runs the
        # K=1 dot in fp32-equivalent passes
        row = jax.lax.dot_general(
            ones_q,
            xk[:, c : c + 1],
            (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # [tq, ts]
        delta = xq[:, c : c + 1] - row
        interval = interval + (delta * delta if c < 3 else -c2 * delta * delta)
    d = jnp.sign(interval) * jnp.sqrt(jnp.abs(interval))
    return jnp.asarray(_ARG_SCALE, jnp.float32) * jnp.clip(
        d, -_CLIP, _CLIP
    )


def _rel_fwd_kernel(
    q_ref,  # [1, 1, tq, hg*hd]  (pre-scaled, group heads in lanes)
    qt_ref,  # [1, 1, tq, hg*e]   q̃ = q_scaled @ Wᵀ per head
    qb_ref,  # [1, 1, tq, hg]     q_scaled · b per head
    k_ref,  # [1, 1, L, hg*hd]
    v_ref,  # [1, 1, L, hg*hd]
    xq_ref,  # [1, tq, xf]  query-side coordinates
    xk_ref,  # [1, L, xf]   key-side coordinates (same array)
    mask_ref,  # [1, 1, L]
    o_ref,  # [1, 1, tq, hg*hd]
    oe_ref,  # [1, 1, tq, hg*e]   Σ_j a·emb per head (normalised)
    lse_ref,  # [1, 1, tq, hg]
    *,
    tq: int,
    ts: int,
    e: int,
    n_heads: int,
    freqs: tuple,
):
    """Grid is (B, L//tq): ALL heads live in one program so the pair
    embedding — the transcendental-bound part — is computed once per
    (query-tile × key-chunk) instead of once per head (the per-head
    grid measured 4.9× slower than the chunked-dense XLA path at
    B=16 H=12 L=768: 69 vs 14 ms — logs/tpu_rel_flash5.log).
    Per-head planes are Python lists of 2D [tq, ts] arrays; head
    slices of the folded lane dimension are static (Mosaic-legal)."""
    dt = q_ref.dtype
    q = q_ref[0, 0]
    qt = qt_ref[0, 0].astype(jnp.float32)
    qb = qb_ref[0, 0].astype(jnp.float32)
    xq = xq_ref[0].astype(jnp.float32)
    L = k_ref.shape[2]
    hd = q.shape[-1] // n_heads
    half = e // 2

    ones_q = jnp.ones((tq, 1), jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, e), 1)

    init = (
        tuple(
            jnp.full((tq, 1), _NEG_K, jnp.float32)
            for _ in range(n_heads)
        ),
        tuple(jnp.zeros((tq, 1), jnp.float32) for _ in range(n_heads)),
        tuple(
            jnp.zeros((tq, hd), jnp.float32) for _ in range(n_heads)
        ),
        tuple(jnp.zeros((tq, e), jnp.float32) for _ in range(n_heads)),
    )

    # the chunk loop is a fori_loop (NOT Python-unrolled): the unrolled
    # version made Mosaic keep every chunk's temporaries live at once —
    # 18 MB of kernel stack at H=4, tq=ts=128 (VMEM OOM at compile)
    def chunk(s, carry):
        m, l, acc, acc_e = (list(c) for c in carry)
        xk = xk_ref[0, pl.ds(s * ts, ts), :].astype(jnp.float32)
        arg = _pair_arg(xq, ones_q, xk)  # [tq, ts]
        valid = mask_ref[0, 0:1, pl.ds(s * ts, ts)]  # [1, ts]
        # per-head qk logits
        logits = []
        for h in range(n_heads):
            qh = q[:, h * hd : (h + 1) * hd]
            kc = k_ref[0, 0, pl.ds(s * ts, ts), h * hd : (h + 1) * hd]
            logits.append(
                _dot(qh, kc, ((1,), (1,))) + qb[:, h : h + 1]
            )
        # shared sin/cos planes, consumed by every head
        for f in range(half):
            sin_f, cos_f = _sincos_rr(arg * freqs[f])
            for h in range(n_heads):
                qth = qt[:, h * e : (h + 1) * e]
                logits[h] = (
                    logits[h]
                    + qth[:, f : f + 1] * sin_f
                    + qth[:, half + f : half + f + 1] * cos_f
                )
        # per-head online softmax + value/embedding accumulation
        p = []
        for h in range(n_heads):
            lg = jnp.where(valid > 0, logits[h], _NEG_K)
            m_new = jnp.maximum(
                m[h], jnp.max(lg, axis=-1, keepdims=True)
            )
            ph = jnp.exp(lg - m_new)
            corr = jnp.exp(m[h] - m_new)
            l[h] = l[h] * corr + jnp.sum(ph, axis=-1, keepdims=True)
            vc = v_ref[0, 0, pl.ds(s * ts, ts), h * hd : (h + 1) * hd]
            acc[h] = acc[h] * corr + _dot(
                ph.astype(dt), vc, ((1,), (0,))
            )
            acc_e[h] = acc_e[h] * corr
            m[h] = m_new
            p.append(ph)
        # attention-weighted embedding: recompute sin/cos once per
        # frequency (shared across heads), reduce per head
        for f in range(half):
            sin_f, cos_f = _sincos_rr(arg * freqs[f])
            oh_sin = (lane == f).astype(jnp.float32)
            oh_cos = (lane == half + f).astype(jnp.float32)
            for h in range(n_heads):
                s_h = jnp.sum(p[h] * sin_f, axis=-1, keepdims=True)
                c_h = jnp.sum(p[h] * cos_f, axis=-1, keepdims=True)
                acc_e[h] = acc_e[h] + s_h * oh_sin + c_h * oh_cos
        return tuple(tuple(c) for c in (m, l, acc, acc_e))

    m, l, acc, acc_e = jax.lax.fori_loop(0, L // ts, chunk, init)
    o_cols, oe_cols, lse_cols = [], [], []
    for h in range(n_heads):
        l_safe = jnp.maximum(l[h], 1e-30)
        o_cols.append((acc[h] / l_safe).astype(o_ref.dtype))
        oe_cols.append((acc_e[h] / l_safe).astype(oe_ref.dtype))
        lse_cols.append(m[h] + jnp.log(l_safe))
    o_ref[0, 0] = jnp.concatenate(o_cols, axis=-1)
    oe_ref[0, 0] = jnp.concatenate(oe_cols, axis=-1)
    lse_ref[0, 0] = jnp.concatenate(lse_cols, axis=-1)


def _rel_fwd(q, qt, qb, k, v, x0, mask, tq, ts, freqs, interpret, hg=0):
    """q/qt/qb/k/v in head-folded layout [B, L, H*dim].

    ``hg`` = heads per program: the third grid axis trades pair-
    embedding recompute (H/hg×) against per-program VMEM (all-heads-
    in-one OOMs the 16 MB kernel stack at H=12, tq=128, ts=256 —
    25.3 MB).  0 = all heads."""
    B, L, Dq = q.shape
    n_heads = qb.shape[-1]
    hd = Dq // n_heads
    e = qt.shape[-1] // n_heads
    xf = x0.shape[-1]
    if hg <= 0 or hg > n_heads:
        hg = n_heads
    if n_heads % hg:
        raise ValueError(f"heads={n_heads} not divisible by hg={hg}")
    G = n_heads // hg

    # head groups get their OWN array axis (a lane-dim group block
    # hg*hd < 128 is Mosaic-illegal); G==1 is a free reshape, G>1 a
    # cheap XLA transpose (~0.1 ms over the ~90 MB at the DeepIce shape)
    def regroup(t, d):  # [B, L, H*d] -> [B, G, L, hg*d]
        if G == 1:
            return t[:, None]
        return t.reshape(B, L, G, hg * d).transpose(0, 2, 1, 3)

    grid = (B, G, L // tq)
    kern = functools.partial(
        _rel_fwd_kernel, tq=tq, ts=ts, e=e, n_heads=hg, freqs=freqs
    )
    o, oe, lse = pl.pallas_call(
        kern,
        grid=grid,
        compiler_params=_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec(
                (1, 1, tq, hg * hd), lambda b, g, i: (b, g, i, 0)
            ),
            pl.BlockSpec(
                (1, 1, tq, hg * e), lambda b, g, i: (b, g, i, 0)
            ),
            pl.BlockSpec((1, 1, tq, hg), lambda b, g, i: (b, g, i, 0)),
            pl.BlockSpec(
                (1, 1, L, hg * hd), lambda b, g, i: (b, g, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, L, hg * hd), lambda b, g, i: (b, g, 0, 0)
            ),
            pl.BlockSpec((1, tq, xf), lambda b, g, i: (b, i, 0)),
            pl.BlockSpec((1, L, xf), lambda b, g, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, L), lambda b, g, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, tq, hg * hd), lambda b, g, i: (b, g, i, 0)
            ),
            pl.BlockSpec(
                (1, 1, tq, hg * e), lambda b, g, i: (b, g, i, 0)
            ),
            pl.BlockSpec((1, 1, tq, hg), lambda b, g, i: (b, g, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, G, L, hg * hd), q.dtype),
            jax.ShapeDtypeStruct((B, G, L, hg * e), jnp.float32),
            jax.ShapeDtypeStruct((B, G, L, hg), jnp.float32),
        ],
        interpret=interpret,
    )(
        regroup(q, hd),
        regroup(qt, e),
        regroup(qb, 1),
        regroup(k, hd),
        regroup(v, hd),
        x0,
        x0,
        mask,
    )

    def ungroup(t, d):  # [B, G, L, hg*d] -> [B, L, H*d]
        if G == 1:
            return t[:, 0]
        return t.transpose(0, 2, 1, 3).reshape(B, L, n_heads * d)

    return ungroup(o, hd), ungroup(oe, e), ungroup(lse, 1)


# ---------------------------------------------------------------------------
# backward (recompute from lse, extended-value formulation)
# ---------------------------------------------------------------------------
#
# Treat the pair embedding as an extension of the value vector:
# û_j(i) = [v_j, emb_ij], ô = [o, oe], ĝ = [do, doe].  The standard
# flash recompute-VJP then applies verbatim:
#   p̂ = exp(logits − lse)                      (normalised probs)
#   delta_i = Σ_d do·o + Σ_e doe·oe
#   dp̂_ij = do_i·v_j + doe_i·emb_ij
#   ds = p̂·(dp̂ − delta)·valid
#   dq += ds@k,  dk += dsᵀ@q,  dv += p̂ᵀ@do
#   dq̃_ie = Σ_j ds·emb_ije,    dq̂b_i = Σ_j ds
# x0 (raw detector coordinates) and the mask are non-differentiable.
# The projection folds (q̃ = q@Wᵀ, q̂b = q·b, out = o + oe@W + b) live
# OUTSIDE the custom_vjp core, so dW/db/dq-through-the-fold compose by
# ordinary autodiff.


def _rel_bwd_dq_kernel(
    q_ref, qt_ref, qb_ref, k_ref, v_ref, xq_ref, xk_ref, mask_ref,
    lse_ref, do_ref, doe_ref, delta_ref,
    dq_ref, dqt_ref, dqb_ref,
    *, tq, ts, e, n_heads, freqs,
):
    """Grid (B, G, L//tq): all ``n_heads`` (= heads-per-group) share
    each chunk's pair-embedding planes, mirroring the forward."""
    dt = q_ref.dtype
    q = q_ref[0, 0]
    qt = qt_ref[0, 0].astype(jnp.float32)
    qb = qb_ref[0, 0].astype(jnp.float32)
    xq = xq_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0]  # [tq, hg]
    do = do_ref[0, 0]  # [tq, hg*hd]
    doe = doe_ref[0, 0].astype(jnp.float32)  # [tq, hg*e]
    delta = delta_ref[0, 0]  # [tq, hg]
    L = k_ref.shape[2]
    hd = q.shape[-1] // n_heads
    half = e // 2
    ones_q = jnp.ones((tq, 1), jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, e), 1)
    init = (
        tuple(jnp.zeros((tq, hd), jnp.float32) for _ in range(n_heads)),
        tuple(jnp.zeros((tq, e), jnp.float32) for _ in range(n_heads)),
        tuple(jnp.zeros((tq, 1), jnp.float32) for _ in range(n_heads)),
    )

    def chunk(s, carry):
        dq, dqt, dqb = (list(c) for c in carry)
        xk = xk_ref[0, pl.ds(s * ts, ts), :].astype(jnp.float32)
        arg = _pair_arg(xq, ones_q, xk)
        valid = mask_ref[0, 0:1, pl.ds(s * ts, ts)]  # [1, ts]
        logits, dp, kcs = [], [], []
        for h in range(n_heads):
            kc = k_ref[0, 0, pl.ds(s * ts, ts), h * hd : (h + 1) * hd]
            vc = v_ref[0, 0, pl.ds(s * ts, ts), h * hd : (h + 1) * hd]
            qh = q[:, h * hd : (h + 1) * hd]
            logits.append(
                _dot(qh, kc, ((1,), (1,))) + qb[:, h : h + 1]
            )
            dph = _dot(do[:, h * hd : (h + 1) * hd], vc, ((1,), (1,)))
            dp.append(dph)
            kcs.append(kc)
        for f in range(half):
            sin_f, cos_f = _sincos_rr(arg * freqs[f])
            for h in range(n_heads):
                qth = qt[:, h * e : (h + 1) * e]
                deh = doe[:, h * e : (h + 1) * e]
                logits[h] = (
                    logits[h]
                    + qth[:, f : f + 1] * sin_f
                    + qth[:, half + f : half + f + 1] * cos_f
                )
                dp[h] = (
                    dp[h]
                    + deh[:, f : f + 1] * sin_f
                    + deh[:, half + f : half + f + 1] * cos_f
                )
        ds = []
        for h in range(n_heads):
            lg = jnp.where(valid > 0, logits[h], _NEG_K)
            p = jnp.exp(lg - lse[:, h : h + 1])  # normalised
            dsh = p * (dp[h] - delta[:, h : h + 1]) * valid
            dq[h] = dq[h] + _dot(dsh.astype(dt), kcs[h], ((1,), (0,)))
            dqb[h] = dqb[h] + jnp.sum(dsh, axis=-1, keepdims=True)
            ds.append(dsh)
        for f in range(half):
            sin_f, cos_f = _sincos_rr(arg * freqs[f])
            oh_sin = (lane == f).astype(jnp.float32)
            oh_cos = (lane == half + f).astype(jnp.float32)
            for h in range(n_heads):
                s_h = jnp.sum(ds[h] * sin_f, axis=-1, keepdims=True)
                c_h = jnp.sum(ds[h] * cos_f, axis=-1, keepdims=True)
                dqt[h] = dqt[h] + s_h * oh_sin + c_h * oh_cos
        return tuple(tuple(c) for c in (dq, dqt, dqb))

    dq, dqt, dqb = jax.lax.fori_loop(0, L // ts, chunk, init)
    dq_ref[0, 0] = jnp.concatenate(dq, axis=-1).astype(dq_ref.dtype)
    dqt_ref[0, 0] = jnp.concatenate(dqt, axis=-1).astype(dqt_ref.dtype)
    dqb_ref[0, 0] = jnp.concatenate(dqb, axis=-1).astype(dqb_ref.dtype)


def _rel_bwd_dkv_kernel(
    q_ref, qt_ref, qb_ref, k_ref, v_ref, xq_ref, xk_ref, mask_ref,
    lse_ref, do_ref, doe_ref, delta_ref,
    dk_ref, dv_ref,
    *, tq, ts, e, n_heads, freqs,
):
    """Grid (B, G, L//ts): the key chunk is resident; loop query tiles,
    sharing each tile's pair-embedding planes across the group."""
    dt = q_ref.dtype
    xk = xk_ref[0].astype(jnp.float32)
    si = pl.program_id(2)
    valid = mask_ref[0, 0:1, pl.ds(si * ts, ts)]  # [1, ts]
    L = q_ref.shape[2]
    hd = k_ref.shape[-1] // n_heads
    half = e // 2
    ones_q = jnp.ones((tq, 1), jnp.float32)
    init = (
        tuple(jnp.zeros((ts, hd), jnp.float32) for _ in range(n_heads)),
        tuple(jnp.zeros((ts, hd), jnp.float32) for _ in range(n_heads)),
    )

    def tile(t, carry):
        dk, dv = (list(c) for c in carry)
        qj = q_ref[0, 0, pl.ds(t * tq, tq), :]
        qtj = qt_ref[0, 0, pl.ds(t * tq, tq), :].astype(jnp.float32)
        qbj = qb_ref[0, 0, pl.ds(t * tq, tq), :].astype(jnp.float32)
        xq = xq_ref[0, pl.ds(t * tq, tq), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(t * tq, tq), :]
        do = do_ref[0, 0, pl.ds(t * tq, tq), :]
        doe = doe_ref[0, 0, pl.ds(t * tq, tq), :].astype(jnp.float32)
        delta = delta_ref[0, 0, pl.ds(t * tq, tq), :]
        arg = _pair_arg(xq, ones_q, xk)
        logits, dp = [], []
        for h in range(n_heads):
            qh = qj[:, h * hd : (h + 1) * hd]
            kc = k_ref[0, 0, :, h * hd : (h + 1) * hd]
            vc = v_ref[0, 0, :, h * hd : (h + 1) * hd]
            logits.append(
                _dot(qh, kc, ((1,), (1,))) + qbj[:, h : h + 1]
            )
            dp.append(
                _dot(do[:, h * hd : (h + 1) * hd], vc, ((1,), (1,)))
            )
        for f in range(half):
            sin_f, cos_f = _sincos_rr(arg * freqs[f])
            for h in range(n_heads):
                qth = qtj[:, h * e : (h + 1) * e]
                deh = doe[:, h * e : (h + 1) * e]
                logits[h] = (
                    logits[h]
                    + qth[:, f : f + 1] * sin_f
                    + qth[:, half + f : half + f + 1] * cos_f
                )
                dp[h] = (
                    dp[h]
                    + deh[:, f : f + 1] * sin_f
                    + deh[:, half + f : half + f + 1] * cos_f
                )
        for h in range(n_heads):
            lg = jnp.where(valid > 0, logits[h], _NEG_K)
            p = jnp.exp(lg - lse[:, h : h + 1])
            dsh = (p * (dp[h] - delta[:, h : h + 1]) * valid).astype(dt)
            qh = qj[:, h * hd : (h + 1) * hd]
            dk[h] = dk[h] + _dot(dsh, qh, ((0,), (0,)))  # [ts, hd]
            dv[h] = dv[h] + _dot(
                p.astype(dt), do[:, h * hd : (h + 1) * hd], ((0,), (0,))
            )
        return tuple(tuple(c) for c in (dk, dv))

    dk, dv = jax.lax.fori_loop(0, L // tq, tile, init)
    dk_ref[0, 0] = jnp.concatenate(dk, axis=-1).astype(dk_ref.dtype)
    dv_ref[0, 0] = jnp.concatenate(dv, axis=-1).astype(dv_ref.dtype)


def _rel_bwd(tq, ts, freqs, interpret, hg, residuals, cot):
    """Backward over the folded-layout core, in the same grouped layout
    as the forward ([B, G, L, hg*d]; the pair embedding is recomputed
    once per GROUP, not once per head)."""
    qf, qtf, qbf, kf, vf, x0b, maskb, of, oef, lsef = residuals
    dof, doef, _dlse = cot
    # the bwd kernels hold more per-chunk planes live than the fwd
    # (logits+dp+ds per head, two freq sweeps); ts=256 at hg=4 blew the
    # 16 MB scoped-vmem stack by 1.7 MB at the DeepIce shape — halve
    # the key tile for the backward only
    ts = min(ts, 128)
    B, L, Dq = qf.shape
    H = qbf.shape[-1]
    hd = Dq // H
    e = qtf.shape[-1] // H
    if hg <= 0 or hg > H:
        hg = H
    G = H // hg
    xf = x0b.shape[-1]

    def regroup(t, d):  # [B, L, H*d] -> [B, G, L, hg*d]
        if G == 1:
            return t[:, None]
        return t.reshape(B, L, G, hg * d).transpose(0, 2, 1, 3)

    # delta_i[h] = do·o + doe·oe per head, fp32
    def per_head_dot(a, b_, d):
        prod = (
            a.astype(jnp.float32) * b_.astype(jnp.float32)
        ).reshape(B, L, H, d)
        return prod.sum(axis=-1)  # [B, L, H]

    delta = per_head_dot(dof, of, hd) + per_head_dot(doef, oef, e)

    q = regroup(qf, hd)
    qt = regroup(qtf, e)
    qb = regroup(qbf, 1)
    k = regroup(kf, hd)
    v = regroup(vf, hd)
    lse = regroup(lsef, 1)
    do = regroup(dof, hd).astype(q.dtype)
    doe = regroup(doef, e)
    delta_g = regroup(delta, 1)
    common_specs = [
        pl.BlockSpec((1, 1, tq, hg * hd), lambda b, g, i: (b, g, i, 0)),
        pl.BlockSpec((1, 1, tq, hg * e), lambda b, g, i: (b, g, i, 0)),
        pl.BlockSpec((1, 1, tq, hg), lambda b, g, i: (b, g, i, 0)),
        pl.BlockSpec((1, 1, L, hg * hd), lambda b, g, i: (b, g, 0, 0)),
        pl.BlockSpec((1, 1, L, hg * hd), lambda b, g, i: (b, g, 0, 0)),
        pl.BlockSpec((1, tq, xf), lambda b, g, i: (b, i, 0)),  # xq
        pl.BlockSpec((1, L, xf), lambda b, g, i: (b, 0, 0)),  # xk
        pl.BlockSpec((1, 1, L), lambda b, g, i: (b, 0, 0)),  # mask
        pl.BlockSpec((1, 1, tq, hg), lambda b, g, i: (b, g, i, 0)),
        pl.BlockSpec((1, 1, tq, hg * hd), lambda b, g, i: (b, g, i, 0)),
        pl.BlockSpec((1, 1, tq, hg * e), lambda b, g, i: (b, g, i, 0)),
        pl.BlockSpec((1, 1, tq, hg), lambda b, g, i: (b, g, i, 0)),
    ]
    dq, dqt, dqb = pl.pallas_call(
        functools.partial(
            _rel_bwd_dq_kernel, tq=tq, ts=ts, e=e, n_heads=hg,
            freqs=freqs,
        ),
        grid=(B, G, L // tq),
        compiler_params=_COMPILER_PARAMS,
        in_specs=common_specs,
        out_specs=[
            pl.BlockSpec(
                (1, 1, tq, hg * hd), lambda b, g, i: (b, g, i, 0)
            ),
            pl.BlockSpec(
                (1, 1, tq, hg * e), lambda b, g, i: (b, g, i, 0)
            ),
            pl.BlockSpec((1, 1, tq, hg), lambda b, g, i: (b, g, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, G, L, hg * hd), q.dtype),
            jax.ShapeDtypeStruct((B, G, L, hg * e), jnp.float32),
            jax.ShapeDtypeStruct((B, G, L, hg), jnp.float32),
        ],
        interpret=interpret,
    )(q, qt, qb, k, v, x0b, x0b, maskb, lse, do, doe, delta_g)
    full_specs = [
        pl.BlockSpec((1, 1, L, hg * hd), lambda b, g, i: (b, g, 0, 0)),
        pl.BlockSpec((1, 1, L, hg * e), lambda b, g, i: (b, g, 0, 0)),
        pl.BlockSpec((1, 1, L, hg), lambda b, g, i: (b, g, 0, 0)),
        pl.BlockSpec(
            (1, 1, ts, hg * hd), lambda b, g, i: (b, g, i, 0)
        ),  # k chunk
        pl.BlockSpec(
            (1, 1, ts, hg * hd), lambda b, g, i: (b, g, i, 0)
        ),  # v chunk
        pl.BlockSpec((1, L, xf), lambda b, g, i: (b, 0, 0)),  # xq
        pl.BlockSpec((1, ts, xf), lambda b, g, i: (b, i, 0)),  # xk
        pl.BlockSpec((1, 1, L), lambda b, g, i: (b, 0, 0)),  # mask
        pl.BlockSpec((1, 1, L, hg), lambda b, g, i: (b, g, 0, 0)),
        pl.BlockSpec((1, 1, L, hg * hd), lambda b, g, i: (b, g, 0, 0)),
        pl.BlockSpec((1, 1, L, hg * e), lambda b, g, i: (b, g, 0, 0)),
        pl.BlockSpec((1, 1, L, hg), lambda b, g, i: (b, g, 0, 0)),
    ]
    dk, dv = pl.pallas_call(
        functools.partial(
            _rel_bwd_dkv_kernel, tq=tq, ts=ts, e=e, n_heads=hg,
            freqs=freqs,
        ),
        grid=(B, G, L // ts),
        compiler_params=_COMPILER_PARAMS,
        in_specs=full_specs,
        out_specs=[
            pl.BlockSpec(
                (1, 1, ts, hg * hd), lambda b, g, i: (b, g, i, 0)
            ),
            pl.BlockSpec(
                (1, 1, ts, hg * hd), lambda b, g, i: (b, g, i, 0)
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, G, L, hg * hd), k.dtype),
            jax.ShapeDtypeStruct((B, G, L, hg * hd), v.dtype),
        ],
        interpret=interpret,
    )(q, qt, qb, k, v, x0b, x0b, maskb, lse, do, doe, delta_g)

    def ungroup(t, d):  # [B, G, L, hg*d] -> [B, L, H*d]
        if G == 1:
            return t[:, 0]
        return t.transpose(0, 2, 1, 3).reshape(B, L, H * d)

    # cotangent dtypes must match the primals: qt/qb promote to fp32
    # under bf16 q (bf16 × fp32-weights einsum)
    return (
        ungroup(dq, hd),
        ungroup(dqt, e).astype(qtf.dtype),
        ungroup(dqb, 1).astype(qbf.dtype),
        ungroup(dk, hd),
        ungroup(dv, hd),
        None,
        None,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _rel_core(q, qt, qb, k, v, x0, mask, tq, ts, freqs, interpret, hg):
    return _rel_fwd(
        q, qt, qb, k, v, x0, mask, tq, ts, freqs, interpret, hg
    )


def _rel_core_fwd(q, qt, qb, k, v, x0, mask, tq, ts, freqs, interpret, hg):
    o, oe, lse = _rel_fwd(
        q, qt, qb, k, v, x0, mask, tq, ts, freqs, interpret, hg
    )
    return (o, oe, lse), (q, qt, qb, k, v, x0, mask, o, oe, lse)


_rel_core.defvjp(_rel_core_fwd, _rel_bwd)


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
    heads_per_program: int = 4,
    interpret: bool = False,
) -> jax.Array:
    """Pallas TPU version of :func:`rel_attention_streaming`.

    Same contract (``q`` pre-scaled; returns ``[B, L, H, hd]`` fp32);
    the ``[B,H,L,ts]`` logits and embedding planes stay in VMEM.
    Differentiable w.r.t. ``q/k/v/w_proj/b_proj`` via a recompute
    custom VJP (``x0`` and the mask are non-differentiable — raw
    detector coordinates).
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
    mask = key_padding_mask.astype(jnp.float32)[:, None, :]  # [B,1,L]

    def fold(t):  # [B, H, L, d] -> [B, L, H*d]
        d = t.shape[-1]
        return t.transpose(0, 2, 1, 3).reshape(B, L, H * d)

    freqs = tuple(float(f) for f in _freqs(e))
    o, oe, lse = _rel_core(
        fold(q),
        fold(q_tilde),
        fold(q_dot_b),
        fold(k),
        fold(v),
        x0,
        mask,
        tq,
        ts,
        freqs,
        interpret,
        heads_per_program if H % max(heads_per_program, 1) == 0 else H,
    )
    o = o.reshape(B, L, H, hd).astype(jnp.float32)
    oe = oe.reshape(B, L, H, e)
    o_rel = jnp.einsum("blhe,ed->blhd", oe, w_proj) + b_proj
    return o + o_rel  # [B, L, H, hd]
