"""Flash-attention kernel math vs dense reference (interpret mode on CPU;
Mosaic lowering is validated separately on the real TPU — CLAUDE.md
gotcha: interpret mode does not catch tiling rules)."""

import functools
from unittest import mock

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import graphnet_tpu.ops.flash_attention as fa


def dense_reference(q, k, v, mask, scale):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    neg = jnp.finfo(jnp.float32).min
    logits = jnp.where(mask[:, None, None, :], logits, neg)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    """Run all pallas_calls in interpreter mode for these tests."""
    import jax.experimental.pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(
        fa.pl,
        "pallas_call",
        functools.partial(orig, interpret=True),
    )


def _inputs(B=2, H=2, L=256, D=32, seed=0, with_padding=True):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    if with_padding:
        n_valid = rng.integers(L // 2, L + 1, size=B)
        mask = jnp.asarray(
            np.arange(L)[None, :] < n_valid[:, None]
        )
    else:
        mask = jnp.ones((B, L), bool)
    return q, k, v, mask


class TestForward:
    @pytest.mark.parametrize("with_padding", [False, True])
    def test_matches_dense(self, with_padding):
        q, k, v, mask = _inputs(with_padding=with_padding)
        scale = 1.0 / np.sqrt(q.shape[-1])
        out = fa.flash_attention(q, k, v, mask)
        ref = dense_reference(q, k, v, mask, scale)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_padded_queries_finite(self):
        q, k, v, mask = _inputs()
        out = fa.flash_attention(q, k, v, mask)
        assert np.isfinite(np.asarray(out)).all()


class TestBackward:
    def test_grads_match_dense(self):
        q, k, v, mask = _inputs(B=1, H=2, L=256)
        scale = 1.0 / np.sqrt(q.shape[-1])

        def loss_flash(q, k, v):
            o = fa.flash_attention(q, k, v, mask)
            w = mask[:, None, :, None]
            return jnp.sum(jnp.where(w, o, 0.0) ** 2)

        def loss_dense(q, k, v):
            o = dense_reference(q, k, v, mask, scale)
            w = mask[:, None, :, None]
            return jnp.sum(jnp.where(w, o, 0.0) ** 2)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gf, gd, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a),
                np.asarray(b),
                rtol=5e-4,
                atol=5e-5,
                err_msg=f"d{name}",
            )


def test_supported_gate():
    assert not fa.supported(128, 32, backend="tpu")  # short seq: dense
    assert fa.supported(1024, 32, backend="tpu")
    assert not fa.supported(1024, 32, backend="cpu")
    # ragged L is padded internally (DeepIce cls token makes L=769)
    assert fa.supported(1000, 32, backend="tpu")
    assert fa.supported(769, 32, backend="tpu")


class TestRaggedL:
    """L not a multiple of 128: the wrapper right-pads internally and
    slices the tail — exactly the DeepIce post-cls-token shape."""

    @pytest.mark.parametrize("L", [769, 200])
    def test_matches_dense(self, L):
        q, k, v, mask = _inputs(L=L)
        out = fa.flash_attention(q, k, v, mask)
        assert out.shape == q.shape
        ref = dense_reference(q, k, v, mask, 1.0 / np.sqrt(32))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5
        )

    def test_grads_match_dense(self):
        q, k, v, mask = _inputs(L=200)
        scale = 1.0 / np.sqrt(q.shape[-1])

        def loss_flash(args):
            return (
                fa.flash_attention(*args, mask) ** 2
            ).sum()

        def loss_dense(args):
            return (dense_reference(*args, mask, scale) ** 2).sum()

        gf = jax.grad(loss_flash)((q, k, v))
        gd = jax.grad(loss_dense)((q, k, v))
        for name, a, b in zip("qkv", gf, gd):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
                err_msg=f"d{name}",
            )


class TestBf16:
    def test_bf16_matches_dense_loosely(self):
        q, k, v, mask = _inputs(B=2, H=2, L=256)
        qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))
        out = fa.flash_attention(qb, kb, vb, mask)
        assert out.dtype == jnp.bfloat16
        ref = dense_reference(q, k, v, mask, 1.0 / np.sqrt(32))
        np.testing.assert_allclose(
            np.asarray(out, np.float32),
            np.asarray(ref),
            rtol=0.05,
            atol=0.05,
        )

    def test_bf16_grads_finite(self):
        q, k, v, mask = _inputs(B=1, H=2, L=256)
        qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))

        def loss(q, k, v):
            return jnp.sum(
                fa.flash_attention(q, k, v, mask).astype(jnp.float32) ** 2
            )

        grads = jax.grad(loss, (0, 1, 2))(qb, kb, vb)
        for g in grads:
            assert np.isfinite(np.asarray(g, np.float32)).all()


class TestAttentionRelFlashPath:
    """Unbiased AttentionRel (DeepIce's rel blocks beyond n_rel) must give
    identical results through the flash path."""

    def test_matches_dense(self, monkeypatch):
        from graphnet_tpu.models.components.layers import AttentionRel

        rng = np.random.default_rng(0)
        B, L, D, H = 2, 256, 64, 2
        x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
        mask = jnp.asarray(
            np.arange(L)[None, :] < np.asarray([200, 256])[:, None]
        )
        attn = AttentionRel(num_heads=H)
        params = attn.init(
            jax.random.PRNGKey(0), x, x, x, None, mask
        )
        # dense path (flash gate off on CPU)
        ref = attn.apply(params, x, x, x, None, mask)
        # force the flash path (pallas runs interpreted via the fixture)
        monkeypatch.setattr(
            "graphnet_tpu.ops.flash_attention.supported",
            lambda *a, **k: True,
        )
        out = attn.apply(params, x, x, x, None, mask)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5
        )


def test_fully_masked_rows_match_dense_gradients():
    """Events with zero valid keys degrade to uniform attention in both
    paths; critically the backward recompute must produce p = 1/L (not 1
    per key — the -1e30 mask constant used to absorb log(L) in fp32 and
    inflate those gradients ~L x vs the dense path)."""
    q, k, v, _ = _inputs(B=2, H=1, L=256, with_padding=False)
    mask = jnp.asarray(
        np.stack([np.ones(256, bool), np.zeros(256, bool)])
    )  # event 1 fully masked
    scale = 1.0 / np.sqrt(q.shape[-1])

    out = fa.flash_attention(q, k, v, mask)
    ref = dense_reference(q, k, v, mask, scale)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, mask) ** 2)

    def loss_dense(q, k, v):
        return jnp.sum(dense_reference(q, k, v, mask, scale) ** 2)

    gf = jax.grad(loss_flash, (0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, (0, 1, 2))(q, k, v)
    # dv for the all-masked row is uniform-attention garbage either way;
    # flash reconstructs p = 1/L from lse at magnitude |_NEG| where fp32
    # granularity is ~8e-3, so ~0.2% relative error is expected there
    for a, b, n in zip(gf, gd, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5,
            err_msg=f"d{n}",
        )
