"""Behavioral tests for the DynEdge backbone.

The key correctness property of the dense-padded design is *padding
invariance*: an event's output must not depend on the bucket length it was
padded to, nor on which other events share its batch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graphnet_tpu.batch import make_batch
from graphnet_tpu.models.gnn.dynedge import DynEdge


def random_events(rng, B=4, dims=7, min_n=5, max_n=50):
    return [
        rng.standard_normal((int(rng.integers(min_n, max_n)), dims)).astype(
            np.float32
        )
        for _ in range(B)
    ]


@pytest.fixture(scope="module")
def model_and_params():
    rng = np.random.default_rng(7)
    events = random_events(rng)
    batch = make_batch(events, length=64)
    model = DynEdge(nb_inputs=7)
    params = model.init(jax.random.PRNGKey(0), batch)
    return model, params, events


def test_output_shape(model_and_params):
    model, params, events = model_and_params
    batch = make_batch(events, length=64)
    out = model.apply(params, batch)
    assert out.shape == (len(events), 128)
    assert np.isfinite(np.asarray(out)).all()


def test_padding_invariance(model_and_params):
    model, params, events = model_and_params
    out64 = model.apply(params, make_batch(events, length=64))
    out128 = model.apply(params, make_batch(events, length=128))
    np.testing.assert_allclose(
        np.asarray(out64), np.asarray(out128), rtol=2e-4, atol=2e-5
    )


def test_batch_composition_invariance(model_and_params):
    model, params, events = model_and_params
    full = np.asarray(model.apply(params, make_batch(events, length=64)))
    solo = np.asarray(
        model.apply(params, make_batch([events[2]], length=64))
    )
    np.testing.assert_allclose(full[2], solo[0], rtol=2e-4, atol=2e-5)


def test_jit_and_grad(model_and_params):
    model, params, events = model_and_params
    batch = make_batch(events, length=64)

    @jax.jit
    def loss_fn(p, b):
        return jnp.sum(model.apply(p, b) ** 2)

    g = jax.grad(loss_fn)(params, batch)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # at least one nonzero gradient
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


def test_global_pooling_options():
    rng = np.random.default_rng(8)
    events = random_events(rng, B=2)
    batch = make_batch(events, length=64)
    model = DynEdge(
        nb_inputs=7,
        global_pooling_schemes=("max",),
        add_global_variables_after_pooling=True,
    )
    params = model.init(jax.random.PRNGKey(1), batch)
    out = model.apply(params, batch)
    assert out.shape == (2, 128)


def test_skip_readout_returns_node_latents():
    rng = np.random.default_rng(9)
    events = random_events(rng, B=2)
    batch = make_batch(events, length=32)
    model = DynEdge(nb_inputs=7, skip_readout=True)
    params = model.init(jax.random.PRNGKey(2), batch)
    out = model.apply(params, batch)
    assert out.shape == (2, 32, 256)


def test_param_shapes_match_reference_architecture():
    """Layer-size bookkeeping must match reference gnn/dynedge.py:78-129."""
    rng = np.random.default_rng(10)
    events = random_events(rng, B=2)
    batch = make_batch(events, length=32)
    model = DynEdge(nb_inputs=7)
    params = model.init(jax.random.PRNGKey(3), batch)["params"]
    # conv_0 first (linearised) layer: self/neighbour Dense of
    # (7 inputs + 12 global) -> 128; equivalent to the reference's
    # Linear(2*19, 128) on cat[x_i, x_j - x_i]
    k0a = params["conv_0"]["conv"]["self_dense"]["kernel"]
    k0b = params["conv_0"]["conv"]["nbr_dense"]["kernel"]
    assert k0a.shape == (7 + 12, 128) and k0b.shape == (7 + 12, 128)
    k1 = params["conv_0"]["conv"]["out_kernel"]
    assert k1.shape == (128, 256)
    # conv_1 first layer: 256 -> 336
    assert params["conv_1"]["conv"]["self_dense"]["kernel"].shape == (
        256,
        336,
    )
    # post-processing input: 19 + 4*256 = 1043
    assert params["post_processing"]["dense_0"]["kernel"].shape == (
        1043,
        336,
    )
    # readout: 4 poolings * 256 -> 128
    assert params["readout"]["dense_0"]["kernel"].shape == (1024, 128)
