"""Real-TPU validation of ops/rel_flash_attention.py: Mosaic compile,
numerics vs the streaming reference, and a microbench vs the
chunked-dense rel path at the DeepIce bench shape.

Run in a FRESH process (scalar readbacks degrade device_puts;
CLAUDE.md).  Prints JSON lines."""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from graphnet_tpu.ops.rel_flash_attention import (
    pair_distance,
    rel_attention_streaming,
    rel_flash_attention,
    sinusoidal_pair_emb,
)

print(json.dumps({"backend": jax.default_backend()}), flush=True)


def setup(B, H, L, hd, dtype, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, H, L, hd)), dtype) * hd**-0.5
    k = jnp.asarray(rng.standard_normal((B, H, L, hd)), dtype)
    v = jnp.asarray(rng.standard_normal((B, H, L, hd)), dtype)
    x0 = jnp.asarray(
        np.concatenate(
            [
                rng.standard_normal((B, L, 3)) * 0.5,
                rng.random((B, L, 1)) * 0.03,
            ],
            axis=-1,
        ),
        jnp.float32,
    )
    w = jnp.asarray(rng.standard_normal((hd, hd)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((hd,)) * 0.1, jnp.float32)
    mask = jnp.asarray(rng.random((B, L)) > 0.2)
    mask = mask.at[:, 0].set(True)
    return q, k, v, x0, w, b, mask


# --- 0. Mosaic sin precision probe at large arguments ----------------------
from jax.experimental import pallas as pl


def _sin_kernel(x_ref, o_ref, rr_ref):
    import graphnet_tpu.ops.rel_flash_attention as rfa

    x = x_ref[...]
    o_ref[...] = jnp.sin(x)
    rr_ref[...] = rfa._sincos_rr(x)[0]


xs = jnp.asarray(
    np.linspace(-4096, 4096, 8 * 1024, dtype=np.float32).reshape(8, 1024)
)
raw, rr = pl.pallas_call(
    _sin_kernel,
    out_shape=[
        jax.ShapeDtypeStruct(xs.shape, jnp.float32),
        jax.ShapeDtypeStruct(xs.shape, jnp.float32),
    ],
)(xs)
truth = np.sin(np.asarray(xs, np.float64))
print(
    json.dumps(
        {
            "mosaic_sin_max_err": float(np.max(np.abs(raw - truth))),
            "range_reduced_sin_max_err": float(np.max(np.abs(rr - truth))),
        }
    ),
    flush=True,
)

# --- 1. compile + numerics at a small shape -------------------------------
q, k, v, x0, w, b, mask = setup(2, 4, 256, 32, jnp.float32)
got = jax.jit(
    lambda *a: rel_flash_attention(*a, key_padding_mask=mask, tq=128, ts=128)
)(q, k, v, x0, w, b)
want = rel_attention_streaming(q, k, v, x0, w, b, key_padding_mask=mask)
err = float(jnp.max(jnp.abs(got - want)))
ref = float(jnp.max(jnp.abs(want)))
print(json.dumps({"fp32_max_abs_err": err, "ref_max": ref}), flush=True)
# both sides are 'correct' at different roundings: the kernel's
# q~*emb term is exact fp32 VPU math while the XLA reference runs
# it through default-precision (bf16) MXU einsums -> ~2e-3 rel
assert err < 5e-3 * max(1.0, ref), err

# bf16 inputs (DeepIce compute dtype)
qb_, kb_, vb_ = (t.astype(jnp.bfloat16) for t in (q, k, v))
got_bf = jax.jit(
    lambda *a: rel_flash_attention(*a, key_padding_mask=mask, tq=128, ts=128)
)(qb_, kb_, vb_, x0, w, b)
err_bf = float(jnp.max(jnp.abs(got_bf - want)))
print(json.dumps({"bf16_max_abs_err": err_bf}), flush=True)
assert err_bf < 0.05 * max(1.0, ref), err_bf

# head-grouping must not change numerics (H=4: hg in {1, 2, 4})
for hg in (1, 2):
    got_hg = jax.jit(
        lambda *a: rel_flash_attention(
            *a, key_padding_mask=mask, tq=128, ts=128,
            heads_per_program=hg,
        )
    )(q, k, v, x0, w, b)
    err_hg = float(jnp.max(jnp.abs(got_hg - got)))
    print(json.dumps({"hg": hg, "vs_all_heads_max_err": err_hg}),
          flush=True)
    assert err_hg < 1e-5 * max(1.0, ref), (hg, err_hg)

# --- 1b. bwd kernels: Mosaic compile + grads vs streaming autodiff --------
def loss_kernel(args):
    out = rel_flash_attention(
        *args[:3], x0, *args[3:], key_padding_mask=mask, tq=128, ts=128,
        heads_per_program=2,
    )
    return (out**2).sum()


def loss_stream(args):
    out = rel_attention_streaming(
        *args[:3], x0, *args[3:], key_padding_mask=mask, ts=128
    )
    return (out**2).sum()


args = (q, k, v, w, b)
g_k = jax.jit(jax.grad(loss_kernel))(args)
g_s = jax.jit(jax.grad(loss_stream))(args)
for name, a, b_ in zip("qkvwb", g_k, g_s):
    err = float(jnp.max(jnp.abs(a - b_)))
    rel = float(jnp.max(jnp.abs(b_)))
    print(json.dumps({"grad": name, "max_abs_err": err, "ref": rel}),
          flush=True)
    assert err < 5e-3 * max(1.0, rel), (name, err, rel)

# --- 2. microbench at the DeepIce bench shape -----------------------------
B, H, L, hd = 16, 12, 768, 32
q, k, v, x0, w, b, mask = setup(B, H, L, hd, jnp.bfloat16)


def dense_chunked(q, k, v, x0, w, b, mask, n_chunks=4):
    """The current AttentionRel chunked-dense biased path (fp32
    logits, rel rebuilt per query tile) — the baseline to beat."""
    Lq = q.shape[2]
    tq = Lq // n_chunks
    neg = jnp.finfo(jnp.float32).min
    outs = []
    for s in range(0, Lq, tq):
        d = pair_distance(x0[:, s : s + tq], x0)
        rel = (sinusoidal_pair_emb(d, hd) @ w + b).astype(jnp.bfloat16)
        qc = q[:, :, s : s + tq]
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", qc, k, preferred_element_type=jnp.float32
        ) + jnp.einsum(
            "bhic,bijc->bhij", qc, rel,
            preferred_element_type=jnp.float32,
        )
        logits = jnp.where(mask[:, None, None, :], logits, neg)
        attn = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
        oc = jnp.einsum("bhqk,bhkd->bhqd", attn, v).transpose(0, 2, 1, 3)
        oc = oc + jnp.einsum(
            "bhij,bijc->bihc", attn, rel,
            preferred_element_type=jnp.float32,
        ).astype(oc.dtype)
        outs.append(oc)
    return jnp.concatenate(outs, axis=1)


variants = [
    (
        f"rel_flash_hg{hg}",
        jax.jit(
            lambda *a, hg=hg: rel_flash_attention(
                *a, key_padding_mask=mask, tq=128, ts=256,
                heads_per_program=hg,
            )
        ),
    )
    for hg in (1, 2, 3, 4, 6)
] + [
    (
        "chunked_dense",
        jax.jit(lambda *a: dense_chunked(*a, mask)),
    ),
]
for name, fn in variants:
    out = fn(q, k, v, x0, w, b)
    s0 = float(jnp.sum(out.astype(jnp.float32)))  # warm + hard sync
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        out = fn(q, k, v, x0, w, b)
    s1 = float(jnp.sum(out.astype(jnp.float32)))  # scalar-readback sync
    dt = (time.perf_counter() - t0) / n
    print(
        json.dumps(
            {"variant": name, "ms_per_call": round(dt * 1e3, 3),
             "checksum": s1}
        ),
        flush=True,
    )
