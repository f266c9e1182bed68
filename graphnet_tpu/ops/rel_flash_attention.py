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

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pair_distance", "sinusoidal_pair_emb", "rel_attention_streaming"]

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
