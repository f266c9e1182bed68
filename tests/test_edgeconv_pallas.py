"""Fused Pallas EdgeConv kernel vs pure-XLA reference (interpret mode):
forward values and all gradients (a, b, W2, b2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def xla_reference(a, b, idx, em, w2, b2):
    gathered = jnp.take_along_axis(
        b[:, :, None, :], idx[:, :, :, None], axis=1
    )
    z = a[:, :, None, :] + gathered
    msgs = jnp.maximum(z, 0.0)
    out = jnp.maximum(msgs @ w2 + b2, 0.0)
    return jnp.sum(out * em[..., None], axis=2)


def make_inputs(B=2, L=32, H1=16, H2=8, k=4, seed=0):
    rng = np.random.default_rng(seed)
    a = jnp.asarray(rng.standard_normal((B, L, H1)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((B, L, H1)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, L, (B, L, k)).astype(np.int32))
    em = jnp.asarray(rng.random((B, L, k)) > 0.3)
    w2 = jnp.asarray(rng.standard_normal((H1, H2)).astype(np.float32))
    b2 = jnp.asarray(rng.standard_normal((H2,)).astype(np.float32))
    return a, b, idx, em, w2, b2


def test_forward_matches_xla():
    from jax.experimental.pallas import tpu as pltpu

    from graphnet_tpu.ops.edgeconv_pallas import fused_edgeconv

    a, b, idx, em, w2, b2 = make_inputs()
    expected = np.asarray(
        xla_reference(a, b, idx, em.astype(jnp.float32), w2, b2)
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_edgeconv(a, b, idx, em, w2, b2, 32))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_gradients_match_xla():
    from jax.experimental.pallas import tpu as pltpu

    from graphnet_tpu.ops.edgeconv_pallas import fused_edgeconv

    a, b, idx, em, w2, b2 = make_inputs(seed=1)
    emf = em.astype(jnp.float32)

    def loss_ref(a, b, w2, b2):
        return jnp.sum(xla_reference(a, b, idx, emf, w2, b2) ** 2)

    def loss_fused(a, b, w2, b2):
        return jnp.sum(fused_edgeconv(a, b, idx, em, w2, b2, 32) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(a, b, w2, b2)
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(
            a, b, w2, b2
        )
    for name, gr, gf in zip(
        ("da", "db", "dw2", "db2"), g_ref, g_fused
    ):
        np.testing.assert_allclose(
            np.asarray(gf),
            np.asarray(gr),
            rtol=1e-4,
            atol=1e-4,
            err_msg=name,
        )


def xla_reference_max_leaky(a, b, idx, em, w2, b2, slope=0.01):
    def lrelu(x):
        return jnp.where(x > 0, x, slope * x)

    gathered = jnp.take_along_axis(
        b[:, :, None, :], idx[:, :, :, None], axis=1
    )
    msgs = lrelu(a[:, :, None, :] + gathered)
    out = lrelu(msgs @ w2 + b2)
    neg = jnp.float32(-1e30)
    m = jnp.max(jnp.where(em[..., None] > 0.5, out, neg), axis=2)
    has = jnp.max(em, axis=2)[..., None]
    return jnp.where(has > 0.5, m, 0.0)


def test_max_leaky_forward_and_grads():
    from jax.experimental.pallas import tpu as pltpu

    from graphnet_tpu.ops.edgeconv_pallas import fused_edgeconv

    a, b, idx, em, w2, b2 = make_inputs(seed=2)
    emf = em.astype(jnp.float32)

    def loss_ref(a, b, w2, b2):
        return jnp.sum(
            xla_reference_max_leaky(a, b, idx, emf, w2, b2) ** 2
        )

    def loss_fused(a, b, w2, b2):
        return jnp.sum(
            fused_edgeconv(
                a, b, idx, em, w2, b2, 32, "max", 0.01
            )
            ** 2
        )

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            fused_edgeconv(a, b, idx, em, w2, b2, 32, "max", 0.01)
        )
    expected = np.asarray(
        xla_reference_max_leaky(a, b, idx, emf, w2, b2)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(a, b, w2, b2)
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(
            a, b, w2, b2
        )
    for name, gr, gf in zip(
        ("da", "db", "dw2", "db2"), g_ref, g_fused
    ):
        np.testing.assert_allclose(
            np.asarray(gf),
            np.asarray(gr),
            rtol=1e-4,
            atol=1e-4,
            err_msg=name,
        )


def test_mean_via_add_kernel_plus_divide():
    """EdgeConv's aggr="mean" fused path = add kernel / valid-edge count;
    must equal edge_reduce(msgs, em, "mean") of the XLA formulation,
    values and gradients."""
    from jax.experimental.pallas import tpu as pltpu

    from graphnet_tpu.ops.edgeconv_pallas import fused_edgeconv
    from graphnet_tpu.ops import edge_reduce

    a, b, idx, em, w2, b2 = make_inputs(seed=3)
    emf = em.astype(jnp.float32)

    def ref_mean(a, b, w2, b2):
        gathered = jnp.take_along_axis(
            b[:, :, None, :], idx[:, :, :, None], axis=1
        )
        msgs = jnp.maximum(
            jnp.maximum(a[:, :, None, :] + gathered, 0.0) @ w2 + b2,
            0.0,
        )
        return edge_reduce(msgs, em, "mean")

    def fused_mean(a, b, w2, b2):
        out = fused_edgeconv(a, b, idx, em, w2, b2, 32, "add", 0.0)
        n = jnp.sum(em, axis=2)[..., None]
        return out / jnp.maximum(n, 1).astype(out.dtype)

    expected = np.asarray(ref_mean(a, b, w2, b2))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_mean(a, b, w2, b2))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)

    def loss_ref(a, b, w2, b2):
        return jnp.sum(ref_mean(a, b, w2, b2) ** 2)

    def loss_fused(a, b, w2, b2):
        return jnp.sum(fused_mean(a, b, w2, b2) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(a, b, w2, b2)
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(
            a, b, w2, b2
        )
    for name, gr, gf in zip(("da", "db", "dw2", "db2"), g_ref, g_fused):
        np.testing.assert_allclose(
            np.asarray(gf),
            np.asarray(gr),
            rtol=1e-4,
            atol=1e-4,
            err_msg=name,
        )


# ---------------------------------------------------------------------------
# fused EdgeConv + next-layer kNN
# ---------------------------------------------------------------------------


def _knn_inputs(B=3, L=32, H1=16, H2=8, k=4, seed=3):
    rng = np.random.default_rng(seed)
    a, b, idx, em, w2, b2 = make_inputs(B=B, L=L, H1=H1, H2=H2, k=k, seed=seed)
    # node mask with ragged lengths; edges must respect it for realism
    lengths = rng.integers(L // 2, L + 1, size=B)
    mask = jnp.asarray(
        np.arange(L)[None, :] < lengths[:, None]
    )
    em = em & mask[:, :, None] & jnp.take_along_axis(
        jnp.broadcast_to(mask[:, None, :], (B, L, L)), idx, axis=2
    )
    return a, b, idx, em, mask, w2, b2


def test_fused_knn_matches_composition():
    """fused_edgeconv_knn == fused conv output + ops.knn_graph of it."""
    from jax.experimental.pallas import tpu as pltpu

    from graphnet_tpu.ops.edgeconv_pallas import (
        fused_edgeconv,
        fused_edgeconv_knn,
    )
    from graphnet_tpu.ops.knn import _knn_graph_xla

    a, b, idx, em, mask, w2, b2 = _knn_inputs()
    with pltpu.force_tpu_interpret_mode():
        out_ref = fused_edgeconv(a, b, idx, em, w2, b2, 32, "add", 0.0)
        out, nidx, nem = fused_edgeconv_knn(
            a, b, idx, em, mask, w2, b2, "add", 0.0, 4, 0, 3
        )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_ref), rtol=1e-5, atol=1e-5
    )
    ridx, rem = _knn_graph_xla(out_ref[..., 0:3], mask, 4)
    # neighbour SETS must agree (tie order may differ only on exact ties,
    # which random fp32 coords do not produce)
    nem_np, rem_np = np.asarray(nem), np.asarray(rem)
    np.testing.assert_array_equal(nem_np, rem_np)
    for bi in range(nidx.shape[0]):
        for i in range(nidx.shape[1]):
            got = set(np.asarray(nidx)[bi, i][nem_np[bi, i]])
            want = set(np.asarray(ridx)[bi, i][rem_np[bi, i]])
            assert got == want, (bi, i, got, want)


def test_fused_knn_gradients_match_plain_kernel():
    """The VJP of fused_edgeconv_knn equals fused_edgeconv's (the kNN
    outputs are non-differentiable extras)."""
    from jax.experimental.pallas import tpu as pltpu

    from graphnet_tpu.ops.edgeconv_pallas import (
        fused_edgeconv,
        fused_edgeconv_knn,
    )

    a, b, idx, em, mask, w2, b2 = _knn_inputs(seed=4)

    def loss_plain(a, b, w2, b2):
        return jnp.sum(fused_edgeconv(a, b, idx, em, w2, b2, 32) ** 2)

    def loss_knn(a, b, w2, b2):
        out, nidx, nem = fused_edgeconv_knn(
            a, b, idx, em, mask, w2, b2, "max", 0.0, 4, 0, 3
        )
        return jnp.sum(out ** 2)

    def loss_plain_max(a, b, w2, b2):
        return jnp.sum(
            fused_edgeconv(a, b, idx, em, w2, b2, 32, "max") ** 2
        )

    with pltpu.force_tpu_interpret_mode():
        g_plain = jax.grad(loss_plain_max, argnums=(0, 1, 2, 3))(
            a, b, w2, b2
        )
        g_knn = jax.grad(loss_knn, argnums=(0, 1, 2, 3))(a, b, w2, b2)
    for name, gp, gk in zip(("da", "db", "dw2", "db2"), g_plain, g_knn):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gp), rtol=1e-5, atol=1e-5,
            err_msg=name,
        )


def test_fused_knn_single_node_event():
    """An event with one valid node yields zero valid edges (matches
    knn_graph's edge_mask semantics), not garbage."""
    from jax.experimental.pallas import tpu as pltpu

    from graphnet_tpu.ops.edgeconv_pallas import fused_edgeconv_knn

    a, b, idx, em, mask, w2, b2 = _knn_inputs(seed=5)
    mask = mask.at[0, 1:].set(False)  # event 0: a single valid node
    em = em & mask[:, :, None]
    with pltpu.force_tpu_interpret_mode():
        out, nidx, nem = fused_edgeconv_knn(
            a, b, idx, em, mask, w2, b2, "add", 0.0, 4, 0, 3
        )
    assert not np.asarray(nem)[0].any()
    assert np.isfinite(np.asarray(out)).all()
