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
from jax.experimental.pallas import tpu as pltpu

# The backward kernels' live per-tile planes overflow Mosaic's default
# 16 MB scoped-VMEM stack at long L (L=3072 exceeded it by 204 KB);
# v5e has 128 MB of VMEM — raise the scoped limit for all kernels.
_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=64 * 1024 * 1024
)

TQ = 1024  # max query tile (picked per-L: largest divisor of L <= TQ)
TS = 512  # max key/value chunk
# Tile sizes were swept on a v5e at B*H=64, L=1024, D=32 (fwd+bwd per
# layer): 128/128 1.71 ms -> 256/256 1.27 -> 512/512 1.00 -> 1024/512
# 0.97 ms.  Large tiles win because D=32 keeps every matmul's
# contraction narrow (25% MXU utilisation ceiling): with small tiles
# the kernel is dominated by per-matmul pipeline fills, so fewer,
# longer matmuls recover almost all of the remaining headroom
# (fwd 0.229 ms vs ~0.18 ms SOL at that utilisation).
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


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, *, scale, tq, ts):
    # matmul operands stay in the input dtype (bf16 runs the MXU at native
    # precision); softmax statistics and accumulators are fp32
    dt = q_ref.dtype
    q = q_ref[0] * jnp.asarray(scale, dt)  # [TQ, D]
    L = k_ref.shape[1]
    D = q.shape[-1]
    m = jnp.full((tq, 1), _NEG, jnp.float32)
    l = jnp.zeros((tq, 1), jnp.float32)
    acc = jnp.zeros((tq, D), jnp.float32)
    for s in range(L // ts):
        kc = k_ref[0, s * ts : (s + 1) * ts, :]
        vc = v_ref[0, s * ts : (s + 1) * ts, :]
        logits = _dot(q, kc, ((1,), (1,)))  # [tq, ts] fp32
        valid = mask_ref[0, 0:1, s * ts : (s + 1) * ts]  # [1, ts]
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


def _fwd(q, k, v, mask, scale, tq, ts):
    BH, L, D = q.shape
    grid = (BH, L // tq)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, tq=tq, ts=ts),
        grid=grid,
        compiler_params=_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((1, tq, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, L, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, L, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, L), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tq, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, tq, 1), lambda b, i: (b, i, 0)),
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
    *, scale, tq, ts,
):
    dt = q_ref.dtype
    q = q_ref[0] * jnp.asarray(scale, dt)
    g = g_ref[0]  # [tq, D]
    lse = lse_ref[0]  # [tq, 1]
    delta = delta_ref[0]  # [tq, 1]
    L = k_ref.shape[1]
    D = q.shape[-1]
    dq = jnp.zeros((tq, D), jnp.float32)
    for s in range(L // ts):
        kc = k_ref[0, s * ts : (s + 1) * ts, :]
        vc = v_ref[0, s * ts : (s + 1) * ts, :]
        logits = _dot(q, kc, ((1,), (1,)))
        valid = mask_ref[0, 0:1, s * ts : (s + 1) * ts]  # [1, ts]
        logits = jnp.where(valid > 0, logits, _NEG)
        p = jnp.exp(logits - lse)  # [tq, ts] fp32
        dp = _dot(g, vc, ((1,), (1,)))  # [tq, ts]
        # masked keys carry no gradient through the logits (the dense
        # path's `where` blocks them); p itself still feeds dv
        ds = p * (dp - delta) * valid
        dq = dq + _dot(ds.astype(dt), kc, ((1,), (0,)))  # [tq, D]
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, mask_ref, lse_ref, g_ref, delta_ref,
    dk_ref, dv_ref, *, scale, tq, ts,
):
    dt = q_ref.dtype
    kc = k_ref[0]  # [ts, D]
    vc = v_ref[0]
    si = pl.program_id(1)
    valid = mask_ref[0, 0:1, pl.ds(si * ts, ts)]  # [1, ts]
    L = q_ref.shape[1]
    D = kc.shape[-1]
    dk = jnp.zeros((ts, D), jnp.float32)
    dv = jnp.zeros((ts, D), jnp.float32)
    for t in range(L // tq):
        qj = q_ref[0, t * tq : (t + 1) * tq, :] * jnp.asarray(scale, dt)
        gj = g_ref[0, t * tq : (t + 1) * tq, :]
        lse = lse_ref[0, t * tq : (t + 1) * tq, :]  # [tq, 1]
        delta = delta_ref[0, t * tq : (t + 1) * tq, :]
        logits = _dot(qj, kc, ((1,), (1,)))  # [tq, ts]
        logits = jnp.where(valid > 0, logits, _NEG)
        p = jnp.exp(logits - lse)  # fp32
        dp = _dot(gj, vc, ((1,), (1,)))
        # see _bwd_dq_kernel: masked keys are gradient-blocked in ds
        ds = (p * (dp - delta) * valid).astype(dt)  # [tq, ts]
        # qj already carries the scale factor, so ds @ qj IS
        # scale * (ds @ q) = dL/dk — no second scale here
        dk = dk + _dot(ds, qj, ((0,), (0,)))  # [ts, D]
        dv = dv + _dot(p.astype(dt), gj, ((0,), (0,)))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd(scale, tq, ts, residuals, go):
    q, k, v, mask, o, lse = residuals
    BH, L, D = q.shape
    delta = jnp.sum(
        go.astype(jnp.float32) * o.astype(jnp.float32),
        axis=-1,
        keepdims=True,
    )  # [BH, L, 1]
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, tq=tq, ts=ts),
        grid=(BH, L // tq),
        compiler_params=_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((1, tq, D), lambda b, i: (b, i, 0)),  # q tile
            pl.BlockSpec((1, L, D), lambda b, i: (b, 0, 0)),  # k
            pl.BlockSpec((1, L, D), lambda b, i: (b, 0, 0)),  # v
            pl.BlockSpec((1, 1, L), lambda b, i: (b, 0, 0)),  # mask
            pl.BlockSpec((1, tq, 1), lambda b, i: (b, i, 0)),  # lse tile
            pl.BlockSpec((1, tq, D), lambda b, i: (b, i, 0)),  # g tile
            pl.BlockSpec((1, tq, 1), lambda b, i: (b, i, 0)),  # delta
        ],
        out_specs=pl.BlockSpec((1, tq, D), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, L, D), q.dtype),
    )(q, k, v, mask, lse, go, delta)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, tq=tq, ts=ts),
        grid=(BH, L // ts),
        compiler_params=_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((1, L, D), lambda b, i: (b, 0, 0)),  # q
            pl.BlockSpec((1, ts, D), lambda b, i: (b, i, 0)),  # k chunk
            pl.BlockSpec((1, ts, D), lambda b, i: (b, i, 0)),  # v chunk
            pl.BlockSpec((1, 1, L), lambda b, i: (b, 0, 0)),  # mask
            pl.BlockSpec((1, L, 1), lambda b, i: (b, 0, 0)),  # lse full
            pl.BlockSpec((1, L, D), lambda b, i: (b, 0, 0)),  # g
            pl.BlockSpec((1, L, 1), lambda b, i: (b, 0, 0)),  # delta
        ],
        out_specs=[
            pl.BlockSpec((1, ts, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, ts, D), lambda b, i: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, L, D), k.dtype),
            jax.ShapeDtypeStruct((BH, L, D), v.dtype),
        ],
    )(q, k, v, mask, lse, go, delta)
    return dq, dk, dv, None


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_bh(q, k, v, mask, scale, tq, ts):
    o, _ = _fwd(q, k, v, mask, scale, tq, ts)
    return o


def _flash_bh_fwd(q, k, v, mask, scale, tq, ts):
    o, lse = _fwd(q, k, v, mask, scale, tq, ts)
    return o, (q, k, v, mask, o, lse)


def _flash_bh_vjp(scale, tq, ts, residuals, go):
    return _bwd(scale, tq, ts, residuals, go)


_flash_bh.defvjp(_flash_bh_fwd, _flash_bh_vjp)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def _pick_tile(L: int, cap: int) -> int:
    """Largest power-of-two tile <= cap that divides L (>= 128)."""
    t = cap
    while t > 128 and L % t:
        t //= 2
    return min(t, L)


# relative kernel speed per key-tile size (v5e sweep in the header:
# fwd+bwd 1.71/1.27/1.00 ms for ts=128/256/512 at fixed work)
_TILE_SPEED = {128: 1.0 / 1.71, 256: 1.0 / 1.27, 512: 1.0}


def _pick_pad(L: int) -> int:
    """Padded length for ragged L: minimise (padded work) x (tile
    slowness).  Small tiles are pipeline-fill-bound at D_head=32, so
    padding PAST the next 128-multiple often wins — e.g. DeepIce's
    L=769 pads to 1024 (tiles 1024/512) rather than 896 (stuck at
    128/128): 1.77x work at 1.0 beats 1.36x work at 1.71."""
    best, best_cost = None, None
    for m in (128, 256, 512):
        Lp = -(-L // m) * m
        ts = _pick_tile(Lp, TS)
        cost = (Lp / L) ** 2 / _TILE_SPEED[min(ts, 512)]
        if best_cost is None or cost < best_cost:
            best, best_cost = Lp, cost
    return best


def supported(L: int, D_head: int, backend: Optional[str] = None) -> bool:
    """Flash path engages for long sequences on TPU.  Ragged L is fine —
    :func:`flash_attention` right-pads to the 128-lane tile internally
    (before this, DeepIce's +1 cls token silently demoted all 12 main
    blocks to the dense [B,H,L,L] path: L=769 % 128 != 0)."""
    if backend is None:
        backend = jax.default_backend()
    return backend == "tpu" and L >= 512 and D_head <= 128


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_padding_mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    interpret_unused: bool = False,
    tq: Optional[int] = None,
    ts: Optional[int] = None,
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
    if key_padding_mask is None:
        key_padding_mask = jnp.ones((B, L), bool)
    # ragged L: right-pad to the 128-lane tile.  Padded KEYS are masked
    # out; padded QUERY rows attend the valid keys with a zero query
    # (finite, uniform) and are sliced off below.
    Lq = L
    Lp = _pick_pad(L)
    if Lp != L:
        pad = ((0, 0), (0, 0), (0, Lp - L), (0, 0))
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
        key_padding_mask = jnp.pad(
            key_padding_mask, ((0, 0), (0, Lp - L))
        )
        L = Lp
    if tq is None:
        tq = _pick_tile(L, TQ)
    if ts is None:
        ts = _pick_tile(L, TS)
    # the pallas grids are L // tq and L // ts — a non-dividing tile
    # would silently leave output tail rows unwritten
    if L % tq or L % ts:
        raise ValueError(
            f"L={L} must be divisible by tq={tq} and ts={ts}"
        )
    if scale is None:
        scale = 1.0 / float(np.sqrt(D))
    mask = jnp.repeat(
        key_padding_mask.astype(jnp.float32), H, axis=0
    )[:, None, :]  # [BH, 1, L] (Mosaic block = full trailing dims)

    def bh(t):
        return t.reshape(B * H, L, D)

    o = _flash_bh(bh(q), bh(k), bh(v), mask, float(scale), tq, ts)
    return o.reshape(B, H, L, D)[:, :, :Lq]
