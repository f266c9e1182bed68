"""Golden tests for core graph ops vs independent numpy implementations.

The numpy references below implement the documented semantics of
``torch_cluster.knn_graph`` / ``torch_scatter`` (see SURVEY.md §2.7) from
scratch — they are not derived from the reference code.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from graphnet_tpu.batch import make_batch
from graphnet_tpu.ops import (
    edge_reduce,
    gather_neighbors,
    global_pool,
    homophily,
    knn_graph,
    masked_max,
    masked_mean,
    masked_min,
    masked_std,
    masked_sum,
    minkowski_knn_graph,
)


def np_knn(points: np.ndarray, k: int):
    """Brute-force kNN (no self loops, ties to lower index)."""
    n = len(points)
    d2 = ((points[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    out = []
    for i in range(n):
        order = np.argsort(d2[i], kind="stable")
        out.append(order[: min(k, n - 1)])
    return out


def random_events(rng, B=5, dims=3, min_n=3, max_n=40):
    return [
        rng.standard_normal((rng.integers(min_n, max_n), dims)).astype(
            np.float32
        )
        * 100.0
        for _ in range(B)
    ]


class TestKNN:
    def test_matches_numpy_bruteforce(self):
        rng = np.random.default_rng(0)
        events = random_events(rng)
        batch = make_batch(events)
        k = 8
        idx, edge_mask = knn_graph(batch.x[..., :3], batch.mask, k=k)
        idx, edge_mask = np.asarray(idx), np.asarray(edge_mask)
        for b, ev in enumerate(events):
            expected = np_knn(ev, k)
            d2 = ((ev[:, None, :] - ev[None, :, :]) ** 2).sum(-1)
            for i in range(len(ev)):
                got = sorted(idx[b, i][edge_mask[b, i]].tolist())
                exp = sorted(expected[i].tolist())
                if got != exp:
                    # fp32 matmul distances may swap near-equidistant
                    # neighbours; accept iff the distance multiset matches.
                    np.testing.assert_allclose(
                        np.sort(d2[i][got]),
                        np.sort(d2[i][exp]),
                        rtol=1e-4,
                        err_msg=f"event {b} node {i}",
                    )
        # padded nodes have no edges
        for b, ev in enumerate(events):
            assert not edge_mask[b, len(ev) :].any()

    def test_small_event_fewer_edges(self):
        ev = np.array([[0.0, 0, 0], [1, 0, 0], [2, 0, 0]], dtype=np.float32)
        batch = make_batch([ev], length=16)
        idx, edge_mask = knn_graph(batch.x, batch.mask, k=8)
        # 3 nodes -> each has exactly 2 neighbours
        assert np.asarray(edge_mask).sum() == 6

    def test_exact_distance_ordering(self):
        ev = np.array(
            [[0.0, 0, 0], [1, 0, 0], [3, 0, 0], [6, 0, 0]], dtype=np.float32
        )
        batch = make_batch([ev], length=8)
        idx, edge_mask = knn_graph(batch.x, batch.mask, k=2)
        idx = np.asarray(idx)
        # node 0's two nearest are 1 then 2
        assert idx[0, 0, 0] == 1 and idx[0, 0, 1] == 2

    def test_minkowski(self):
        # hand-computed: points (x,t); metric |dx|^2 - (c dt)^2 with c=1
        ev = np.array(
            [
                [0.0, 0, 0, 0.0],
                [10.0, 0, 0, 1.0],
                [2.0, 0, 0, 1.9],
            ],
            dtype=np.float32,
        )
        batch = make_batch([ev], length=8)
        idx, edge_mask = minkowski_knn_graph(
            batch.x, batch.mask, k=1, c=1.0
        )
        idx = np.asarray(idx)
        # d(0,1) = 100 - 1 = 99 ; d(0,2) = 4 - 3.61 = 0.39 -> nearest is 2
        assert idx[0, 0, 0] == 2


class TestReduce:
    def test_edge_reduce_matches_numpy(self):
        rng = np.random.default_rng(1)
        B, L, k, D = 3, 10, 4, 6
        msgs = rng.standard_normal((B, L, k, D)).astype(np.float32)
        em = rng.random((B, L, k)) > 0.4
        for aggr, fn in [
            ("sum", lambda m: m.sum(0)),
            ("mean", lambda m: m.mean(0)),
            ("max", lambda m: m.max(0)),
            ("min", lambda m: m.min(0)),
        ]:
            got = np.asarray(
                edge_reduce(jnp.asarray(msgs), jnp.asarray(em), aggr)
            )
            for b in range(B):
                for i in range(L):
                    sel = msgs[b, i][em[b, i]]
                    exp = fn(sel) if len(sel) else np.zeros(D)
                    np.testing.assert_allclose(
                        got[b, i], exp, rtol=1e-5, atol=1e-5
                    )

    def test_masked_pools(self):
        rng = np.random.default_rng(2)
        events = random_events(rng, dims=5)
        batch = make_batch(events)
        for fn, npfn in [
            (masked_sum, np.sum),
            (masked_mean, np.mean),
            (masked_max, np.max),
            (masked_min, np.min),
        ]:
            got = np.asarray(fn(batch.x, batch.mask))
            for b, ev in enumerate(events):
                np.testing.assert_allclose(
                    got[b], npfn(ev, axis=0), rtol=1e-5, atol=1e-4
                )
        got = np.asarray(masked_std(batch.x, batch.mask))
        for b, ev in enumerate(events):
            np.testing.assert_allclose(
                got[b], np.std(ev, axis=0), rtol=1e-4, atol=1e-3
            )

    def test_global_pool_concat_order(self):
        rng = np.random.default_rng(3)
        events = random_events(rng, dims=2)
        batch = make_batch(events)
        got = np.asarray(global_pool(batch.x, batch.mask, ("min", "max")))
        assert got.shape == (len(events), 4)
        np.testing.assert_allclose(
            got[:, :2], np.asarray(masked_min(batch.x, batch.mask))
        )

    def test_gather_neighbors(self):
        rng = np.random.default_rng(4)
        x = rng.standard_normal((2, 6, 3)).astype(np.float32)
        idx = rng.integers(0, 6, (2, 6, 4)).astype(np.int32)
        got = np.asarray(gather_neighbors(jnp.asarray(x), jnp.asarray(idx)))
        for b in range(2):
            for i in range(6):
                for kk in range(4):
                    np.testing.assert_array_equal(
                        got[b, i, kk], x[b, idx[b, i, kk]]
                    )


class TestHomophily:
    def test_homophily_manual(self):
        # 1 event, 3 nodes, values [1, 1, 2]; kNN k=1 on a line
        # positions 0, 1, 10 -> edges: 0->1, 1->0, 2->1
        ev = np.array(
            [[0.0, 0, 0], [1, 0, 0], [10, 0, 0]], dtype=np.float32
        )
        batch = make_batch([ev], length=8)
        idx, edge_mask = knn_graph(batch.x, batch.mask, k=1)
        values = jnp.asarray(np.array([[1.0, 1.0, 2.0] + [0] * 5]))
        h = np.asarray(homophily(idx, edge_mask, values))
        # edges 0->1 (same), 1->0 (same), 2->1 (diff) -> 2/3
        np.testing.assert_allclose(h, [2.0 / 3.0], rtol=1e-6)

    def test_matmul_and_gather_branches_agree(self, monkeypatch):
        """homophily has two neighbour-gather implementations picked by a
        cost-model gate (one-hot matmul vs take_along_axis); they must be
        numerically identical on any shape."""
        import graphnet_tpu.ops.gather_reduce as gr

        rng = np.random.default_rng(7)
        B, L, k, C = 3, 16, 4, 2
        idx = jnp.asarray(rng.integers(0, L, (B, L, k)), jnp.int32)
        edge_mask = jnp.asarray(rng.random((B, L, k)) > 0.3)
        values = jnp.asarray(
            rng.integers(0, 3, (B, L, C)).astype(np.float32)
        )

        monkeypatch.setattr(gr, "_HOMOPHILY_MATMUL_MAX_L", 512)
        h_matmul = np.asarray(gr.homophily(idx, edge_mask, values))
        monkeypatch.setattr(gr, "_HOMOPHILY_MATMUL_MAX_L", 0)
        h_gather = np.asarray(gr.homophily(idx, edge_mask, values))
        np.testing.assert_allclose(h_matmul, h_gather, rtol=0, atol=0)


class TestGeluExact:
    """ops/gelu.py: exact-erf GELU with recompute VJP == plain autodiff
    of the closed form (the reference's torch nn.GELU default)."""

    @staticmethod
    def _jax():
        import jax

        return jax

    def test_matches_plain_gelu(self):
        from graphnet_tpu.ops.gelu import gelu_exact

        x = jnp.asarray(
            np.random.default_rng(0).standard_normal(4096) * 3,
            jnp.float32,
        )
        jax = self._jax()
        want = jax.nn.gelu(x, approximate=False)
        np.testing.assert_allclose(
            gelu_exact(x), want, rtol=1e-5, atol=5e-6
        )

    def test_grads_match_autodiff(self):
        from graphnet_tpu.ops.gelu import gelu_exact

        x = jnp.asarray(
            np.random.default_rng(1).standard_normal(4096) * 3,
            jnp.float32,
        )
        jax = self._jax()
        g1 = jax.grad(lambda t: (gelu_exact(t) ** 2).sum())(x)
        g2 = jax.grad(
            lambda t: (jax.nn.gelu(t, approximate=False) ** 2).sum()
        )(x)
        np.testing.assert_allclose(g1, g2, rtol=1e-5, atol=1e-6)

    def test_bf16_upcast_internal(self):
        from graphnet_tpu.ops.gelu import gelu_exact

        x = jnp.asarray([0.5, -1.25, 3.0], jnp.bfloat16)
        out = gelu_exact(x)
        assert out.dtype == jnp.bfloat16
        jax = self._jax()
        want = jax.nn.gelu(x.astype(jnp.float32), approximate=False)
        np.testing.assert_allclose(
            out.astype(jnp.float32), want, rtol=1e-2, atol=1e-2
        )
