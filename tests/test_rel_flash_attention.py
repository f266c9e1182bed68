"""Streaming rel-bias attention == the materialised AttentionRel math.

The streaming version (ops/rel_flash_attention.py) folds the
SpacetimeEncoder projection out of the tile loop and uses online
softmax; these tests pin it against the straightforward materialised
computation — the exact einsums of AttentionRel's biased path
(models/components/layers.py:651-677) with rel features produced by
the real SpacetimeEncoder module (so the frequency/clip/interval math
is compared against the shipped implementation, not a re-derivation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphnet_tpu.models.components.embedding import SpacetimeEncoder
from graphnet_tpu.ops.rel_flash_attention import (
    pair_distance,
    rel_attention_streaming,
    sinusoidal_pair_emb,
)


def _materialised(q, k, v, rel, mask):
    """AttentionRel's biased path, fp32, rel as key and value."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    logits = logits + jnp.einsum("bhic,bijc->bhij", q, rel)
    if mask is not None:
        neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(mask[:, None, None, :], logits, neg)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v).transpose(0, 2, 1, 3)
    out = out + jnp.einsum("bhij,bijc->bihc", attn, rel)
    return out  # [B, L, H, hd]


def _setup(B=2, L=96, H=3, hd=16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, H, L, hd)), jnp.float32)
    q = q * hd**-0.5
    k = jnp.asarray(rng.standard_normal((B, H, L, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, hd)), jnp.float32)
    # pos in ~[-0.5, 0.5], time in ~[0, 0.03] scaled units (IceMix-like)
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
    enc = SpacetimeEncoder(seq_length=hd)
    params = enc.init(jax.random.PRNGKey(seed), x0)
    rel = enc.apply(params, x0)  # [B, L, L, hd]
    w = params["params"]["projection"]["kernel"]
    b = params["params"]["projection"]["bias"]
    return q, k, v, x0, rel, w, b


def test_pair_emb_matches_spacetime_encoder():
    """pair_distance + sinusoidal_pair_emb @ W + b reproduces the
    SpacetimeEncoder module output exactly."""
    q, k, v, x0, rel, w, b = _setup()
    emb = sinusoidal_pair_emb(pair_distance(x0, x0), w.shape[0])
    ours = emb @ w + b
    np.testing.assert_allclose(ours, rel, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("ts", [32, 128])
def test_streaming_matches_materialised(ts):
    q, k, v, x0, rel, w, b = _setup()
    want = _materialised(q, k, v, rel, None)
    got = rel_attention_streaming(q, k, v, x0, w, b, ts=ts)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_streaming_matches_materialised_masked():
    q, k, v, x0, rel, w, b = _setup(L=80)
    rng = np.random.default_rng(1)
    mask = jnp.asarray(rng.random((2, 80)) > 0.3)
    mask = mask.at[:, 0].set(True)  # no fully-invalid rows
    want = _materialised(q, k, v, rel, mask)
    got = rel_attention_streaming(
        q, k, v, x0, w, b, key_padding_mask=mask, ts=32
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_streaming_pads_ragged_L():
    """L not a multiple of ts: internal padding must not change the
    result (padded keys masked out)."""
    q, k, v, x0, rel, w, b = _setup(L=70)
    want = _materialised(q, k, v, rel, None)
    got = rel_attention_streaming(q, k, v, x0, w, b, ts=32)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("ts", [32, 64])
def test_pallas_interpret_matches_materialised(ts):
    """The Pallas forward (interpret mode — kernel math only; Mosaic
    lowering needs a real TPU, CLAUDE.md gotcha) == dense path."""
    from graphnet_tpu.ops.rel_flash_attention import rel_flash_attention

    q, k, v, x0, rel, w, b = _setup(L=128)
    want = _materialised(q, k, v, rel, None)
    got = rel_flash_attention(
        q, k, v, x0, w, b, tq=64, ts=ts, interpret=True
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_pallas_interpret_masked():
    from graphnet_tpu.ops.rel_flash_attention import rel_flash_attention

    q, k, v, x0, rel, w, b = _setup(L=128)
    rng = np.random.default_rng(2)
    mask = jnp.asarray(rng.random((2, 128)) > 0.3)
    mask = mask.at[:, 0].set(True)
    want = _materialised(q, k, v, rel, mask)
    got = rel_flash_attention(
        q, k, v, x0, w, b, key_padding_mask=mask, tq=64, ts=32,
        interpret=True,
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("hg", [1, 2])
def test_pallas_interpret_head_groups(hg):
    """heads_per_program < H (the grid's group axis) must not change
    the result — the grouped layout regroup/ungroup round-trips."""
    from graphnet_tpu.ops.rel_flash_attention import rel_flash_attention

    q, k, v, x0, rel, w, b = _setup(L=128, H=4)
    want = _materialised(q, k, v, rel, None)
    got = rel_flash_attention(
        q, k, v, x0, w, b, tq=64, ts=32, heads_per_program=hg,
        interpret=True,
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_pallas_interpret_head_groups_grads():
    """The grouped bwd kernels (G > 1) == streaming-path autodiff."""
    from graphnet_tpu.ops.rel_flash_attention import (
        rel_attention_streaming,
        rel_flash_attention,
    )

    q, k, v, x0, rel, w, b = _setup(L=128, H=4)
    rng = np.random.default_rng(5)
    mask = jnp.asarray(rng.random((2, 128)) > 0.3)
    mask = mask.at[:, 0].set(True)

    def loss_kernel(args):
        out = rel_flash_attention(
            *args[:3], x0, *args[3:], key_padding_mask=mask,
            tq=64, ts=32, heads_per_program=2, interpret=True,
        )
        return (out**2).sum()

    def loss_stream(args):
        out = rel_attention_streaming(
            *args[:3], x0, *args[3:], key_padding_mask=mask, ts=32
        )
        return (out**2).sum()

    args = (q, k, v, w, b)
    g_k = jax.grad(loss_kernel)(args)
    g_s = jax.grad(loss_stream)(args)
    for name, a, b_ in zip("qkvwb", g_k, g_s):
        np.testing.assert_allclose(
            a, b_, rtol=1e-3, atol=1e-3, err_msg=f"grad {name}"
        )


def test_pallas_interpret_grads_match():
    """The kernel's recompute custom VJP == autodiff of the streaming
    path, for every differentiable input (q, k, v, W, b)."""
    from graphnet_tpu.ops.rel_flash_attention import rel_flash_attention

    q, k, v, x0, rel, w, b = _setup(L=128)
    rng = np.random.default_rng(3)
    mask = jnp.asarray(rng.random((2, 128)) > 0.3)
    mask = mask.at[:, 0].set(True)

    def loss_kernel(args):
        q_, k_, v_, w_, b_ = args
        out = rel_flash_attention(
            q_, k_, v_, x0, w_, b_, key_padding_mask=mask,
            tq=64, ts=32, interpret=True,
        )
        return (out**2).sum()

    def loss_stream(args):
        q_, k_, v_, w_, b_ = args
        out = rel_attention_streaming(
            q_, k_, v_, x0, w_, b_, key_padding_mask=mask, ts=32
        )
        return (out**2).sum()

    args = (q, k, v, w, b)
    g_k = jax.grad(loss_kernel)(args)
    g_s = jax.grad(loss_stream)(args)
    for name, a, b_ in zip("qkvwb", g_k, g_s):
        np.testing.assert_allclose(
            a, b_, rtol=1e-3, atol=1e-3, err_msg=f"grad {name}"
        )


def test_streaming_grads_match():
    """Fold + online softmax must be exact under differentiation too
    (the Pallas VJP will be checked against this same contract)."""
    q, k, v, x0, rel, w, b = _setup(B=1, L=48, H=2, hd=8)
    enc = SpacetimeEncoder(seq_length=8)

    def loss_mat(qkvwb):
        q_, k_, v_, w_, b_ = qkvwb
        rel_ = sinusoidal_pair_emb(pair_distance(x0, x0), 8) @ w_ + b_
        return (_materialised(q_, k_, v_, rel_, None) ** 2).sum()

    def loss_stream(qkvwb):
        q_, k_, v_, w_, b_ = qkvwb
        return (
            rel_attention_streaming(q_, k_, v_, x0, w_, b_, ts=16) ** 2
        ).sum()

    args = (q, k, v, w, b)
    g_mat = jax.grad(loss_mat)(args)
    g_str = jax.grad(loss_stream)(args)
    for a, b_ in zip(g_mat, g_str):
        np.testing.assert_allclose(a, b_, rtol=1e-3, atol=5e-4)
