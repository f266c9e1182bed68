"""Shape/finiteness/padding-invariance tests for the non-flagship backbones."""

import numpy as np
import pytest

import jax

from graphnet_tpu.batch import make_batch
from graphnet_tpu.models.gnn.convnet import ConvNet
from graphnet_tpu.models.gnn.dynedge_jinst import DynEdgeJINST
from graphnet_tpu.models.gnn.dynedge_kaggle_tito import DynEdgeTITO
from graphnet_tpu.models.gnn.particlenet import ParticleNeT


def events(B=3, dims=7, seed=0, min_n=6, max_n=40):
    rng = np.random.default_rng(seed)
    return [
        rng.standard_normal((int(rng.integers(min_n, max_n)), dims)).astype(
            np.float32
        )
        for _ in range(B)
    ]


def check_padding_invariance(model, params, evs, rtol=5e-4, atol=5e-5):
    o1 = np.asarray(model.apply(params, make_batch(evs, length=64)))
    o2 = np.asarray(model.apply(params, make_batch(evs, length=128)))
    np.testing.assert_allclose(o1, o2, rtol=rtol, atol=atol)


class TestTITO:
    def test_forward(self):
        evs = events()
        batch = make_batch(evs, length=64)
        model = DynEdgeTITO(nb_inputs=7)
        params = model.init(jax.random.PRNGKey(0), batch)
        out = model.apply(params, batch)
        assert out.shape == (3, 128)
        assert np.isfinite(np.asarray(out)).all()
        check_padding_invariance(model, params, evs)

    def test_param_structure(self):
        evs = events()
        batch = make_batch(evs, length=32)
        model = DynEdgeTITO(nb_inputs=7)
        p = model.init(jax.random.PRNGKey(0), batch)["params"]
        # first DynTrans edge layer (linearised tito message):
        # self/neighbour Dense of 7 -> 256, equivalent to Linear(3*7, 256)
        assert p["conv_0"]["conv"]["self_dense"]["kernel"].shape == (7, 256)
        assert p["conv_0"]["conv"]["nbr_dense"]["kernel"].shape == (7, 256)
        # readout input = 256 (max pool) + 12 global
        assert p["readout"]["dense_0"]["kernel"].shape == (268, 256)


class TestJINST:
    def test_forward(self):
        evs = events()
        batch = make_batch(evs, length=64)
        model = DynEdgeJINST(nb_inputs=7)
        params = model.init(jax.random.PRNGKey(0), batch)
        out = model.apply(params, batch)
        assert out.shape == (3, 128)  # l6 = 4*16*2
        assert np.isfinite(np.asarray(out)).all()
        check_padding_invariance(model, params, evs)


class TestConvNet:
    def test_forward(self):
        evs = events()
        batch = make_batch(evs, length=64)
        model = ConvNet(nb_inputs=7, nb_outputs_=3)
        params = model.init(jax.random.PRNGKey(0), batch)
        out = model.apply(params, batch)
        assert out.shape == (3, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_tag_adjacency_row_normalisation(self):
        from graphnet_tpu.models.gnn.convnet import (
            tag_normalised_adjacency,
        )
        from graphnet_tpu.ops import knn_graph
        import jax.numpy as jnp

        evs = events(B=1)
        batch = make_batch(evs, length=32)
        idx, em = knn_graph(batch.x[..., :3], batch.mask, k=4)
        A = np.asarray(
            tag_normalised_adjacency(idx, em, 32)
        )[0]
        n = evs[0].shape[0]
        # padded rows/cols all zero
        assert A[n:, :].sum() == 0 and A[:, n:].sum() == 0
        assert (A >= 0).all()


class TestParticleNeT:
    def test_forward_and_padding_invariance(self):
        evs = events()
        batch = make_batch(evs, length=64)
        model = ParticleNeT(nb_inputs=7)
        params = model.init(jax.random.PRNGKey(0), batch)
        out = model.apply(params, batch)
        assert out.shape == (3, 256)
        assert np.isfinite(np.asarray(out)).all()
        # masked batchnorm statistics exclude padding -> padding invariant
        check_padding_invariance(model, params, evs)

    def test_static_edges(self):
        evs = events()
        batch = make_batch(evs, length=64)
        model = ParticleNeT(nb_inputs=7, dynamic=False)
        params = model.init(jax.random.PRNGKey(1), batch)
        out = model.apply(params, batch)
        assert np.isfinite(np.asarray(out)).all()
