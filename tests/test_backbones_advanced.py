"""Tests for DeepIce, NodeRNN/RNN_TITO, ISeeCube."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graphnet_tpu.batch import make_batch
from graphnet_tpu.models.components.embedding import (
    FourierEncoder,
    SinusoidalPosEmb,
    SpacetimeEncoder,
)
from graphnet_tpu.models.gnn.icemix import DeepIce
from graphnet_tpu.models.gnn.rnn_tito import RNNTITO
from graphnet_tpu.models.rnn.node_rnn import NodeRNN
from graphnet_tpu.models.transformer.iseecube import ISeeCube


def kaggle_events(B=2, seed=0, min_n=6, max_n=30):
    """x, y, z, time, charge, auxiliary."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(B):
        n = int(rng.integers(min_n, max_n))
        ev = np.concatenate(
            [
                rng.standard_normal((n, 3)).astype(np.float32),
                rng.random((n, 1)).astype(np.float32),
                rng.random((n, 1)).astype(np.float32),
                rng.integers(0, 2, (n, 1)).astype(np.float32),
            ],
            axis=1,
        )
        out.append(ev)
    return out


class TestEmbeddings:
    def test_sinusoidal(self):
        emb = SinusoidalPosEmb(dim=16)
        p = emb.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)))
        out = emb.apply(p, jnp.ones((2, 3)))
        assert out.shape == (2, 3, 16)
        # sin/cos structure: first half sin, second half cos
        np.testing.assert_allclose(
            np.asarray(out[0, 0, :8]) ** 2 + np.asarray(out[0, 0, 8:]) ** 2,
            1.0,
            rtol=1e-5,
        )

    def test_fourier_encoder_shapes(self):
        enc = FourierEncoder(seq_length=32, output_dim=64, n_features=6)
        x = jnp.zeros((2, 10, 6))
        p = enc.init(jax.random.PRNGKey(0), x, jnp.asarray([10, 5]))
        out = enc.apply(p, x, jnp.asarray([10, 5]))
        assert out.shape == (2, 10, 64)

    def test_spacetime_encoder(self):
        enc = SpacetimeEncoder(seq_length=16)
        x = jnp.asarray(
            np.random.default_rng(0)
            .standard_normal((2, 8, 6))
            .astype(np.float32)
        )
        p = enc.init(jax.random.PRNGKey(0), x)
        out = enc.apply(p, x)
        assert out.shape == (2, 8, 8, 16)


class TestDeepIce:
    def test_forward(self):
        evs = kaggle_events()
        batch = make_batch(evs, length=32)
        model = DeepIce(
            hidden_dim=96, seq_length=48, depth=2, depth_rel=2, head_size=16
        )
        params = model.init(jax.random.PRNGKey(0), batch)
        out = model.apply(params, batch)
        assert out.shape == (2, 96)
        assert np.isfinite(np.asarray(out)).all()

    def test_with_dynedge(self):
        evs = kaggle_events()
        batch = make_batch(evs, length=32)
        model = DeepIce(
            hidden_dim=96,
            seq_length=48,
            depth=1,
            depth_rel=1,
            head_size=16,
            include_dynedge=True,
            n_features=6,
        )
        params = model.init(jax.random.PRNGKey(0), batch)
        out = model.apply(params, batch)
        assert out.shape == (2, 96)
        assert np.isfinite(np.asarray(out)).all()

    def test_padding_invariance(self):
        evs = kaggle_events()
        model = DeepIce(
            hidden_dim=96, seq_length=48, depth=2, depth_rel=1, head_size=16
        )
        b32 = make_batch(evs, length=32)
        params = model.init(jax.random.PRNGKey(0), b32)
        o1 = np.asarray(model.apply(params, b32))
        o2 = np.asarray(model.apply(params, make_batch(evs, length=48)))
        np.testing.assert_allclose(o1, o2, rtol=5e-4, atol=5e-5)

    def test_remat_exact_fwd_and_grad(self):
        """remat=True (per-block jax.checkpoint) is a pure memory/compute
        trade: identical params tree, bit-identical forward and grads."""
        evs = kaggle_events()
        batch = make_batch(evs, length=32)
        kwargs = dict(
            hidden_dim=64,
            seq_length=16,
            depth=2,
            depth_rel=2,
            head_size=16,
        )
        m0 = DeepIce(**kwargs)
        m1 = DeepIce(**kwargs, remat=True)
        params = m0.init(jax.random.PRNGKey(0), batch)
        p1 = m1.init(jax.random.PRNGKey(0), batch)
        assert jax.tree_util.tree_structure(
            params
        ) == jax.tree_util.tree_structure(p1)
        # remat recomputes the identical graph, so this is bit-exact on
        # the CPU backend this test runs on; the zero tolerances are a
        # deliberate tripwire — loosen only if a backend/XLA version is
        # ever shown to break bit-exact recomputation
        o0 = np.asarray(m0.apply(params, batch))
        o1 = np.asarray(m1.apply(params, batch))
        np.testing.assert_allclose(o0, o1, rtol=0, atol=0)

        def loss(m):
            return lambda p: jnp.sum(m.apply(p, batch) ** 2)

        g0 = jax.grad(loss(m0))(params)
        g1 = jax.grad(loss(m1))(params)
        for a, b in zip(
            jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=0
            )


def dom_series_events(B=2, seed=3):
    """Events in NodeAsDOMTimeSeries output format:
    [x, y, z, time, charge, new_node_col]."""
    from graphnet_tpu.models.graphs.nodes import NodeAsDOMTimeSeries

    rng = np.random.default_rng(seed)
    nd = NodeAsDOMTimeSeries(
        keys=["dom_x", "dom_y", "dom_z", "dom_time", "charge"],
        id_columns=["dom_x", "dom_y", "dom_z"],
        time_column="dom_time",
        charge_column="charge",
    )
    out = []
    for _ in range(B):
        n_doms = int(rng.integers(3, 6))
        doms = rng.standard_normal((n_doms, 3)).astype(np.float32)
        rows = []
        for d in range(n_doms):
            for _ in range(int(rng.integers(1, 5))):
                rows.append(
                    np.concatenate(
                        [
                            doms[d],
                            rng.random(1).astype(np.float32) * 10,
                            rng.random(1).astype(np.float32),
                        ]
                    )
                )
        x = np.stack(rows)
        out.append(nd(x).astype(np.float32))
    return out


class TestNodeRNN:
    def test_dom_compaction_and_charge(self):
        evs = dom_series_events()
        batch = make_batch(evs, length=32)
        model = NodeRNN(
            nb_inputs=2,
            hidden_size=16,
            num_layers=2,
            time_series_columns=(4, 3),  # charge, time
        )
        params = model.init(jax.random.PRNGKey(0), batch)
        out = model.apply(params, batch)
        # output nodes: 5 summary features + 16 hidden
        assert out.x.shape == (2, 32, 5 + 16)
        n_doms = [
            len(np.unique(e[:, :3], axis=0)) for e in evs
        ]
        # the DOM count lives in the mask; n_pulses stays at the original
        # per-event pulse count (reference `rnn/node_rnn.py` never updates
        # it — DynEdgeTITO consumes it as the log10(n_pulses) global
        # feature, see test_reference_parity_exec.py::test_rnn_tito_parity)
        np.testing.assert_array_equal(
            np.asarray(out.mask).sum(axis=1), n_doms
        )
        np.testing.assert_array_equal(
            np.asarray(out.n_pulses), [len(e) for e in evs]
        )
        # DOM charge = asinh(sum of linear charges per DOM)
        ev = evs[0]
        seg_starts = np.nonzero(ev[:, -1])[0]
        sums = [
            ev[s:e, 4].sum()
            for s, e in zip(
                seg_starts, list(seg_starts[1:]) + [len(ev)]
            )
        ]
        got = np.asarray(out.x[0, : len(sums), 4])
        np.testing.assert_allclose(
            np.sort(got), np.sort(np.arcsinh(sums)), rtol=1e-5
        )

    def test_reset_scan_equals_per_segment_gru(self):
        """The segment-reset scan (one lax.scan over the padded pulse
        axis) must equal running the same GRU independently on each
        segment — the property that makes it a drop-in for the
        reference's packed per-DOM cuDNN GRU."""
        from graphnet_tpu.models.rnn.node_rnn import _ResettingGRULayer

        rng = np.random.default_rng(5)
        B, L, D, H = 2, 20, 3, 8
        xs = rng.standard_normal((B, L, D)).astype(np.float32)
        reset = np.zeros((B, L), np.float32)
        # segments: [0:7), [7:15), [15:20) and [0:4), [4:20)
        reset[0, [0, 7, 15]] = 1.0
        reset[1, [0, 4]] = 1.0

        layer = _ResettingGRULayer(hidden_size=H)
        params = layer.init(
            jax.random.PRNGKey(0), jnp.asarray(xs), jnp.asarray(reset)
        )
        ys = np.asarray(
            layer.apply(params, jnp.asarray(xs), jnp.asarray(reset))
        )

        for b in range(B):
            starts = list(np.nonzero(reset[b])[0]) + [L]
            for s, e in zip(starts[:-1], starts[1:]):
                seg = xs[b : b + 1, s:e]
                seg_reset = np.zeros((1, e - s), np.float32)
                seg_reset[0, 0] = 1.0
                y_seg = np.asarray(
                    layer.apply(
                        params,
                        jnp.asarray(seg),
                        jnp.asarray(seg_reset),
                    )
                )
                np.testing.assert_allclose(
                    ys[b, s:e], y_seg[0], rtol=1e-5, atol=1e-6
                )

    def test_t5_buckets_match_huggingface(self):
        """ISeeCube's native relative-position bucketing must equal the
        canonical T5 implementation (the reference delegates to
        torchscale, which follows the same T5 scheme)."""
        torch = pytest.importorskip("torch")
        hf = pytest.importorskip("transformers.models.t5.modeling_t5")

        from graphnet_tpu.models.transformer.iseecube import (
            t5_relative_buckets,
        )

        rel = np.arange(-300, 301).reshape(1, -1)
        ours = np.asarray(
            t5_relative_buckets(jnp.asarray(rel), 32, 256)
        )
        want = hf.T5Attention._relative_position_bucket(
            torch.as_tensor(rel),
            bidirectional=True,
            num_buckets=32,
            max_distance=256,
        ).numpy()
        np.testing.assert_array_equal(ours, want)

    def test_rnn_tito_forward(self):
        evs = dom_series_events()
        batch = make_batch(evs, length=32)
        model = RNNTITO(
            nb_inputs=6,
            time_series_columns=(4, 3),
            rnn_hidden_size=16,
            rnn_layers=1,
            dyntrans_layer_sizes=((64, 64),),
            n_head=4,
        )
        params = model.init(jax.random.PRNGKey(0), batch)
        out = model.apply(params, batch)
        assert out.shape == (2, 128)
        assert np.isfinite(np.asarray(out)).all()


class TestISeeCube:
    def test_forward(self):
        evs = kaggle_events()
        batch = make_batch(evs, length=32)
        model = ISeeCube(
            hidden_dim=64,
            seq_length=32,
            num_layers=2,
            num_heads=4,
            mlp_dim=128,
        )
        params = model.init(jax.random.PRNGKey(0), batch)
        out = model.apply(params, batch)
        assert out.shape == (2, 64)
        assert np.isfinite(np.asarray(out)).all()


class TestChunkedRelBias:
    """DeepIce rel_bias_chunks>1 rebuilds the spacetime bias per query
    tile — must equal the materialised path exactly (same params)."""

    def test_chunked_equals_materialised(self):
        evs = kaggle_events()
        batch = make_batch(evs, length=32)
        kwargs = dict(
            hidden_dim=32,
            seq_length=32,
            depth=1,
            depth_rel=2,
            n_rel=2,  # both rel blocks carry the bias
            head_size=8,
            n_features=4,
        )
        m1 = DeepIce(**kwargs)
        # both chunked flavours: bias cached once + sliced (the r5
        # default when it fits HBM) and rebuilt per tile
        m4 = DeepIce(**kwargs, rel_bias_chunks=4)  # auto -> cached
        m4r = DeepIce(
            **kwargs, rel_bias_chunks=4, rel_bias_cache="never"
        )
        params = m1.init(jax.random.PRNGKey(0), batch)
        # identical parameter structure: chunked mode adds no params
        p4 = m4.init(jax.random.PRNGKey(0), batch)
        t1 = jax.tree_util.tree_structure(params)
        t4 = jax.tree_util.tree_structure(p4)
        assert t1 == t4
        out1 = m1.apply(params, batch)
        out4 = m4.apply(params, batch)
        np.testing.assert_allclose(
            np.asarray(out4), np.asarray(out1), rtol=2e-5, atol=2e-5
        )
        out4r = m4r.apply(params, batch)
        np.testing.assert_allclose(
            np.asarray(out4r), np.asarray(out1), rtol=2e-5, atol=2e-5
        )

    def test_flash_equals_materialised(self):
        """rel_flash="always" (Pallas streaming kernel, interpret mode
        off-TPU) == the materialised rel-bias path, params identical."""
        evs = kaggle_events()
        batch = make_batch(evs, length=128)
        kwargs = dict(
            hidden_dim=32,
            seq_length=32,
            depth=1,
            depth_rel=2,
            n_rel=2,
            head_size=8,
            n_features=4,
        )
        m1 = DeepIce(**kwargs, rel_flash="never")
        mf = DeepIce(**kwargs, rel_flash="always")
        params = m1.init(jax.random.PRNGKey(0), batch)
        pf = mf.init(jax.random.PRNGKey(0), batch)
        assert jax.tree_util.tree_structure(
            params
        ) == jax.tree_util.tree_structure(pf)
        out1 = m1.apply(params, batch)
        outf = mf.apply(params, batch)
        np.testing.assert_allclose(
            np.asarray(outf), np.asarray(out1), rtol=2e-4, atol=2e-4
        )

    def test_flash_grads_finite(self):
        """Training through the flash path (custom VJP) produces finite
        grads for every param, incl. the shared rel_pos projection."""
        evs = kaggle_events()
        batch = make_batch(evs, length=128)
        m = DeepIce(
            hidden_dim=32, seq_length=32, depth=1, depth_rel=1,
            head_size=8, n_features=4, rel_flash="always",
        )
        params = m.init(jax.random.PRNGKey(0), batch)

        def loss(p):
            return (m.apply(p, batch) ** 2).mean()

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
        # the shared SpacetimeEncoder projection receives gradient
        gp = g["params"]["rel_pos"]["projection"]["kernel"]
        assert float(np.abs(np.asarray(gp)).max()) > 0

    def test_odd_chunking(self):
        evs = kaggle_events()
        batch = make_batch(evs, length=32)
        kwargs = dict(
            hidden_dim=32, seq_length=32, depth=1, depth_rel=1,
            head_size=8, n_features=4,
        )
        m1 = DeepIce(**kwargs)
        m3 = DeepIce(**kwargs, rel_bias_chunks=3)  # 32 % 3 != 0
        params = m1.init(jax.random.PRNGKey(0), batch)
        np.testing.assert_allclose(
            np.asarray(m3.apply(params, batch)),
            np.asarray(m1.apply(params, batch)),
            rtol=2e-5,
            atol=2e-5,
        )
