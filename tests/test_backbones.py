"""Shape/finiteness/padding-invariance tests for the non-flagship backbones."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

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


class TestTAGConvSemantics:
    def test_tagconv_matches_numpy_reference(self):
        """TAGConv = sum_h W_h (D^-1/2 A D^-1/2)^h x with PyG's gcn_norm
        convention (in-degree, no self loops) — verified against an
        explicit numpy edge-list implementation."""
        from graphnet_tpu.models.gnn.convnet import (
            TAGConv,
            tag_normalised_adjacency,
        )
        from graphnet_tpu.ops import knn_graph

        rng = np.random.default_rng(3)
        B, L, D, k, F = 2, 12, 4, 3, 6
        x = rng.standard_normal((B, L, D)).astype(np.float32)
        mask = np.ones((B, L), bool)
        mask[1, 9:] = False
        idx, edge_mask = knn_graph(
            jnp.asarray(x[..., :3]), jnp.asarray(mask), k=k
        )
        A = tag_normalised_adjacency(idx, edge_mask, L)
        conv = TAGConv(features=F, K=2)
        params = conv.init(jax.random.PRNGKey(0), jnp.asarray(x), A)
        got = np.asarray(conv.apply(params, jnp.asarray(x), A))

        # numpy reference from the edge list
        idx_np, em_np = np.asarray(idx), np.asarray(edge_mask)
        p = params["params"]
        for b in range(B):
            # directed edges j -> i
            An = np.zeros((L, L), np.float64)
            for i in range(L):
                for e in range(k):
                    if em_np[b, i, e]:
                        An[i, idx_np[b, i, e]] = 1.0
            deg = An.sum(axis=1)  # in-degree
            dis = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
            Anorm = An * dis[:, None] * dis[None, :]
            h = x[b].astype(np.float64)
            want = h @ p["lin_0"]["kernel"] + p["lin_0"]["bias"]
            hh = h
            for hop in (1, 2):
                hh = Anorm @ hh
                want = want + hh @ p[f"lin_{hop}"]["kernel"]
            np.testing.assert_allclose(
                got[b], want, rtol=1e-4, atol=1e-4
            )


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

    def test_first_layer_linearisation_exact(self):
        """ParticleNeTConv's first Dense is linearised (self_dense +
        nbr_dense instead of a Dense over cat[x_i, x_j - x_i]); verify
        it equals the naive cat-form with W1 = W_self + W_nbr,
        W2 = W_nbr computed in numpy."""
        from graphnet_tpu.models.gnn.particlenet import ParticleNeTConv
        from graphnet_tpu.ops import knn_graph

        rng = np.random.default_rng(11)
        x = rng.standard_normal((2, 16, 5)).astype(np.float32)
        mask = np.ones((2, 16), bool)
        mask[1, 10:] = False
        idx, edge_mask = knn_graph(
            jnp.asarray(x[..., :3]), jnp.asarray(mask), k=4
        )
        conv = ParticleNeTConv(
            nn_sizes=(8,), aggr="mean", add_batchnorm=False
        )
        params = conv.init(
            jax.random.PRNGKey(2), jnp.asarray(x), idx, edge_mask
        )
        got = np.asarray(
            conv.apply(params, jnp.asarray(x), idx, edge_mask)
        )

        p = params["params"]
        w_self = np.asarray(p["self_dense"]["kernel"])
        bias = np.asarray(p["self_dense"]["bias"])
        w_nbr = np.asarray(p["nbr_dense"]["kernel"])
        w1, w2 = w_self + w_nbr, w_nbr  # cat-form weights
        idx_np, em_np = np.asarray(idx), np.asarray(edge_mask)
        B, L, k = idx_np.shape
        want = np.zeros_like(got)
        for b in range(B):
            for i in range(L):
                msgs = []
                for e in range(k):
                    if not em_np[b, i, e]:
                        continue
                    xj = x[b, idx_np[b, i, e]]
                    m = (
                        x[b, i] @ w1 + (xj - x[b, i]) @ w2 + bias
                    )
                    msgs.append(np.maximum(m, 0.0))  # relu
                if msgs:
                    want[b, i] = np.mean(msgs, axis=0)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
