"""Flash attention (Pallas TPU) for the transformer family at long L.

Replaces dense masked attention (``models/components/layers.py:233``,
itself the stand-in for the reference's cuDNN ``nn.MultiheadAttention``,
reference ``layers.py:169-177``) when the ``[B, H, L, L]`` logits tensor
becomes HBM-traffic-dominant (L ≥ 512).

Design notes (docs/architecture.md §5):
  * head_dim is small (32 for TITO) — the QKᵀ contraction runs the MXU at
    K=32, which no packing scheme can improve (a 4-head block-diagonal
    lane-packing does 4x the multiplies at 4x the utilisation — a wash);
    the win here is purely *memory*: logits/probs tiles never leave VMEM,
    deleting ~6·B·H·L² bytes of HBM round-trips per layer.
  * online softmax in fp32 with running (max, sum); the backward pass
    recomputes probabilities from the saved log-sum-exp (standard
    flash-attention recompute VJP; pallas guide §Patterns: Custom VJP).
  * all kernel-internal tensors are 2D per (batch·head) with row-stats
    kept ``[T, 1]``; no lane-dim reshapes or transposes (Mosaic rejects
    them — CLAUDE.md gotcha).

Numerics: exact softmax attention (not an approximation); matches the
dense path to fp32 tolerance (``tests/test_flash_attention.py``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

TQ = 128  # query tile
TS = 128  # key/value chunk
# mask value: large enough that exp(_NEG - lse) underflows to 0 for any
# realistic lse, small enough that fp32 keeps log(l) alongside it — for a
# fully-masked row m = _NEG and lse = _NEG + log(L) must NOT round to
# _NEG, or the backward recompute p = exp(logits - lse) returns 1 per key
# (an L x gradient spike) instead of the dense path's uniform 1/L
_NEG = -1e5


def _dot(a, b, dims):
    return jax.lax.dot_general(
        a, b, (dims, ((), ())), preferred_element_type=jnp.float32
    )


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, *, scale):
    # matmul operands stay in the input dtype (bf16 runs the MXU at native
    # precision); softmax statistics and accumulators are fp32
    dt = q_ref.dtype
    q = q_ref[0] * jnp.asarray(scale, dt)  # [TQ, D]
    L = k_ref.shape[1]
    D = q.shape[-1]
    m = jnp.full((TQ, 1), _NEG, jnp.float32)
    l = jnp.zeros((TQ, 1), jnp.float32)
    acc = jnp.zeros((TQ, D), jnp.float32)
    for s in range(L // TS):
        kc = k_ref[0, s * TS : (s + 1) * TS, :]
        vc = v_ref[0, s * TS : (s + 1) * TS, :]
        logits = _dot(q, kc, ((1,), (1,)))  # [TQ, TS] fp32
        valid = mask_ref[0, 0:1, s * TS : (s + 1) * TS]  # [1, TS]
        logits = jnp.where(valid > 0, logits, _NEG)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.exp(logits - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + _dot(p.astype(dt), vc, ((1,), (0,)))
        m = m_new
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l_safe)  # [TQ, 1]


def _fwd(q, k, v, mask, scale):
    BH, L, D = q.shape
    grid = (BH, L // TQ)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TQ, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, L, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, L, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, L), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, TQ, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, TQ, 1), lambda b, i: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, L, D), q.dtype),
            jax.ShapeDtypeStruct((BH, L, 1), jnp.float32),
        ],
    )(q, k, v, mask)
    return o, lse


# ---------------------------------------------------------------------------
# backward (recompute from lse)
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, mask_ref, lse_ref, g_ref, delta_ref, dq_ref,
    *, scale,
):
    dt = q_ref.dtype
    q = q_ref[0] * jnp.asarray(scale, dt)
    g = g_ref[0]  # [TQ, D]
    lse = lse_ref[0]  # [TQ, 1]
    delta = delta_ref[0]  # [TQ, 1]
    L = k_ref.shape[1]
    D = q.shape[-1]
    dq = jnp.zeros((TQ, D), jnp.float32)
    for s in range(L // TS):
        kc = k_ref[0, s * TS : (s + 1) * TS, :]
        vc = v_ref[0, s * TS : (s + 1) * TS, :]
        logits = _dot(q, kc, ((1,), (1,)))
        valid = mask_ref[0, 0:1, s * TS : (s + 1) * TS]  # [1, TS]
        logits = jnp.where(valid > 0, logits, _NEG)
        p = jnp.exp(logits - lse)  # [TQ, TS] fp32
        dp = _dot(g, vc, ((1,), (1,)))  # [TQ, TS]
        # masked keys carry no gradient through the logits (the dense
        # path's `where` blocks them); p itself still feeds dv
        ds = p * (dp - delta) * valid
        dq = dq + _dot(ds.astype(dt), kc, ((1,), (0,)))  # [TQ, D]
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, mask_ref, lse_ref, g_ref, delta_ref,
    dk_ref, dv_ref, *, scale,
):
    dt = q_ref.dtype
    kc = k_ref[0]  # [TS, D]
    vc = v_ref[0]
    si = pl.program_id(1)
    valid = mask_ref[0, 0:1, pl.ds(si * TS, TS)]  # [1, TS]
    L = q_ref.shape[1]
    D = kc.shape[-1]
    dk = jnp.zeros((TS, D), jnp.float32)
    dv = jnp.zeros((TS, D), jnp.float32)
    for t in range(L // TQ):
        qj = q_ref[0, t * TQ : (t + 1) * TQ, :] * jnp.asarray(scale, dt)
        gj = g_ref[0, t * TQ : (t + 1) * TQ, :]
        lse = lse_ref[0, t * TQ : (t + 1) * TQ, :]  # [TQ, 1]
        delta = delta_ref[0, t * TQ : (t + 1) * TQ, :]
        logits = _dot(qj, kc, ((1,), (1,)))  # [TQ, TS]
        logits = jnp.where(valid > 0, logits, _NEG)
        p = jnp.exp(logits - lse)  # fp32
        dp = _dot(gj, vc, ((1,), (1,)))
        # see _bwd_dq_kernel: masked keys are gradient-blocked in ds
        ds = (p * (dp - delta) * valid).astype(dt)  # [TQ, TS]
        # qj already carries the scale factor, so ds @ qj IS
        # scale * (ds @ q) = dL/dk — no second scale here
        dk = dk + _dot(ds, qj, ((0,), (0,)))  # [TS, D]
        dv = dv + _dot(p.astype(dt), gj, ((0,), (0,)))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd(scale, residuals, go):
    q, k, v, mask, o, lse = residuals
    BH, L, D = q.shape
    delta = jnp.sum(
        go.astype(jnp.float32) * o.astype(jnp.float32),
        axis=-1,
        keepdims=True,
    )  # [BH, L, 1]
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale),
        grid=(BH, L // TQ),
        in_specs=[
            pl.BlockSpec((1, TQ, D), lambda b, i: (b, i, 0)),  # q tile
            pl.BlockSpec((1, L, D), lambda b, i: (b, 0, 0)),  # k
            pl.BlockSpec((1, L, D), lambda b, i: (b, 0, 0)),  # v
            pl.BlockSpec((1, 1, L), lambda b, i: (b, 0, 0)),  # mask
            pl.BlockSpec((1, TQ, 1), lambda b, i: (b, i, 0)),  # lse tile
            pl.BlockSpec((1, TQ, D), lambda b, i: (b, i, 0)),  # g tile
            pl.BlockSpec((1, TQ, 1), lambda b, i: (b, i, 0)),  # delta
        ],
        out_specs=pl.BlockSpec((1, TQ, D), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, L, D), q.dtype),
    )(q, k, v, mask, lse, go, delta)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale),
        grid=(BH, L // TS),
        in_specs=[
            pl.BlockSpec((1, L, D), lambda b, i: (b, 0, 0)),  # q
            pl.BlockSpec((1, TS, D), lambda b, i: (b, i, 0)),  # k chunk
            pl.BlockSpec((1, TS, D), lambda b, i: (b, i, 0)),  # v chunk
            pl.BlockSpec((1, 1, L), lambda b, i: (b, 0, 0)),  # mask
            pl.BlockSpec((1, L, 1), lambda b, i: (b, 0, 0)),  # lse full
            pl.BlockSpec((1, L, D), lambda b, i: (b, 0, 0)),  # g
            pl.BlockSpec((1, L, 1), lambda b, i: (b, 0, 0)),  # delta
        ],
        out_specs=[
            pl.BlockSpec((1, TS, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, TS, D), lambda b, i: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, L, D), k.dtype),
            jax.ShapeDtypeStruct((BH, L, D), v.dtype),
        ],
    )(q, k, v, mask, lse, go, delta)
    return dq, dk, dv, None


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_bh(q, k, v, mask, scale):
    o, _ = _fwd(q, k, v, mask, scale)
    return o


def _flash_bh_fwd(q, k, v, mask, scale):
    o, lse = _fwd(q, k, v, mask, scale)
    return o, (q, k, v, mask, o, lse)


def _flash_bh_vjp(scale, residuals, go):
    return _bwd(scale, residuals, go)


_flash_bh.defvjp(_flash_bh_fwd, _flash_bh_vjp)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def supported(L: int, D_head: int, backend: Optional[str] = None) -> bool:
    """Flash path engages for long, tile-aligned sequences on TPU."""
    if backend is None:
        backend = jax.default_backend()
    return backend == "tpu" and L >= 512 and L % TS == 0 and D_head <= 128


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_padding_mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    interpret_unused: bool = False,
) -> jax.Array:
    """Masked softmax attention, tiles resident in VMEM.

    Args:
        q, k, v: ``[B, H, L, D_head]``.
        key_padding_mask: ``[B, L]`` bool, True = valid key.
        scale: logits scale; default ``1/sqrt(D_head)``.

    Returns:
        ``[B, H, L, D_head]``, same dtype as ``q``.
    """
    B, H, L, D = q.shape
    if scale is None:
        scale = 1.0 / float(np.sqrt(D))
    if key_padding_mask is None:
        key_padding_mask = jnp.ones((B, L), bool)
    mask = jnp.repeat(
        key_padding_mask.astype(jnp.float32), H, axis=0
    )[:, None, :]  # [BH, 1, L] (Mosaic block = full trailing dims)

    def bh(t):
        return t.reshape(B * H, L, D)

    o = _flash_bh(bh(q), bh(k), bh(v), mask, float(scale))
    return o.reshape(B, H, L, D)
