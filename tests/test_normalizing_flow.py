"""NormalizingFlow tests: NLLH validity, exact density normalisation,
training reduces NLLH on a known conditional distribution."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graphnet_tpu.batch import make_batch
from graphnet_tpu.models.gnn.dynedge import DynEdge
from graphnet_tpu.models.normalizing_flow import NormalizingFlow


def events(B=4, seed=0):
    rng = np.random.default_rng(seed)
    return [
        rng.standard_normal((int(rng.integers(6, 20)), 4)).astype(
            np.float32
        )
        for _ in range(B)
    ]


@pytest.fixture(
    scope="module", params=["sinh_arcsinh", "spline"]
)
def flow_and_params(request):
    evs = events()
    labels = {"energy": np.asarray([1.0, 2.0, 0.5, 3.0], np.float32)}
    batch = make_batch(evs, labels=labels, length=32)
    flow = NormalizingFlow(
        backbone=DynEdge(nb_inputs=4),
        nb_targets=1,
        target_labels=("energy",),
        transform=request.param,
    )
    params = flow.init(jax.random.PRNGKey(0), batch)
    return flow, params, batch


def test_rqs_roundtrip_and_logdet():
    """Spline forward∘inverse is the identity; logdets cancel; outside
    the bound the map is the identity."""
    from graphnet_tpu.models.normalizing_flow import (
        _rqs_forward_and_logdet,
        _rqs_inverse_and_logdet,
    )

    K, bound = 8, 4.0
    rng = np.random.default_rng(0)
    # one spline shared across all evaluation points (so monotonicity
    # across points is meaningful)
    raw = jnp.broadcast_to(
        jnp.asarray(
            rng.standard_normal((1, 3 * K - 1)).astype(np.float32)
        ),
        (64, 3 * K - 1),
    )
    z = jnp.asarray(
        np.concatenate(
            [
                rng.uniform(-3.9, 3.9, 60),
                [-7.0, 7.0, -4.5, 5.5],  # tails: identity
            ]
        ).astype(np.float32)
    )
    x, ld_f = _rqs_forward_and_logdet(z, raw, K, bound)
    z2, ld_i = _rqs_inverse_and_logdet(x, raw, K, bound)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(ld_f + ld_i), 0.0, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(x[-4:]), np.asarray(z[-4:])
    )  # linear tails
    # monotone: forward preserves order
    order = np.argsort(np.asarray(z))
    xo = np.asarray(x)[order]
    assert (np.diff(xo) > 0).all()
    # zero raw params -> identity map
    x0, ld0 = _rqs_forward_and_logdet(
        z, jnp.zeros_like(raw), K, bound
    )
    np.testing.assert_allclose(np.asarray(x0), np.asarray(z), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld0), 0.0, atol=1e-5)


def test_nllh_finite(flow_and_params):
    flow, params, batch = flow_and_params
    nllh = flow.apply(params, batch)
    assert nllh.shape == (4,)
    assert np.isfinite(np.asarray(nllh)).all()


def test_density_normalised(flow_and_params):
    """Integral of p(y|x) over a wide grid must be ~1 (valid density)."""
    flow, params, batch = flow_and_params
    ys = np.linspace(-30, 30, 4001).astype(np.float32)
    dy = ys[1] - ys[0]
    B = batch.batch_size

    @jax.jit
    def grid_logp(ys):
        return jax.vmap(
            lambda y: flow.log_prob(
                params, batch, jnp.full((B, 1), y)
            )
        )(ys)

    p = np.exp(np.asarray(grid_logp(jnp.asarray(ys))))  # [n_grid, B]
    integral = p.sum(axis=0) * dy
    np.testing.assert_allclose(integral, 1.0, rtol=5e-2)


def test_sampling_shapes(flow_and_params):
    flow, params, batch = flow_and_params
    s = flow.sample(params, batch, jax.random.PRNGKey(1), n_samples=50)
    assert s.shape == (4, 50, 1)
    assert np.isfinite(np.asarray(s)).all()


def test_training_reduces_nllh():
    import optax

    evs = events(B=8, seed=3)
    # target correlated with event size -> learnable conditional density
    targets = np.asarray(
        [np.log(len(e)) + 0.1 for e in evs], np.float32
    )
    batch = make_batch(
        evs, labels={"energy": targets}, length=32
    )
    flow = NormalizingFlow(
        backbone=DynEdge(nb_inputs=4), target_labels=("energy",)
    )
    params = flow.init(jax.random.PRNGKey(0), batch)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            return jnp.mean(flow.apply(p, batch))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    first = None
    for i in range(60):
        params, opt_state, loss = step(params, opt_state)
        if first is None:
            first = float(loss)
    assert float(loss) < first


def test_flow_trains_via_trainer():
    """NormalizingFlow conforms to the Trainer contract."""
    import os

    import pytest as _pytest

    from graphnet_tpu.constants import EXAMPLE_SQLITE_DATA

    if not os.path.exists(EXAMPLE_SQLITE_DATA):
        _pytest.skip("example data not present")

    from graphnet_tpu.data.constants import FEATURES, TRUTH
    from graphnet_tpu.data.dataloader import DataLoader
    from graphnet_tpu.data.sqlite_dataset import SQLiteDataset
    from graphnet_tpu.models.detector.prometheus import Prometheus
    from graphnet_tpu.models.graphs import KNNGraph
    from graphnet_tpu.training.trainer import Trainer

    ds = SQLiteDataset(
        path=EXAMPLE_SQLITE_DATA,
        graph_definition=KNNGraph(detector=Prometheus()),
        pulsemaps="total",
        features=FEATURES.PROMETHEUS,
        truth=TRUTH.PROMETHEUS,
        truth_table="mc_truth",
    )
    flow = NormalizingFlow(
        backbone=DynEdge(nb_inputs=4),
        target_labels=("injection_zenith",),
    )
    loader = DataLoader(ds, batch_size=16, shuffle=True, seed=0)
    trainer = Trainer(flow, learning_rate=1e-4)
    history = trainer.fit(
        loader, max_epochs=2, use_default_schedule=False
    )
    assert np.isfinite(history["train_loss"]).all()
    df = trainer.predict_as_dataframe(loader)
    assert "injection_zenith_nllh" in df.columns
    assert np.isfinite(df["injection_zenith_nllh"].to_numpy()).all()


class TestSphericalFlow:
    """Directional density on S2 (VERDICT r1 item 10): normalisation and
    learning a known direction."""

    def _setup(self, B=8, seed=0):
        from graphnet_tpu.models.normalizing_flow import SphericalFlow

        rng = np.random.default_rng(seed)
        evs = [
            rng.standard_normal((int(rng.integers(6, 20)), 4)).astype(
                np.float32
            )
            for _ in range(B)
        ]
        d = rng.standard_normal((B, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        batch = make_batch(evs, labels={"direction": d}, length=32)
        flow = SphericalFlow(
            backbone=DynEdge(nb_inputs=4), n_components=4
        )
        params = flow.init(jax.random.PRNGKey(0), batch)
        return flow, params, batch

    def test_nllh_finite(self):
        flow, params, batch = self._setup()
        nllh = flow.apply(params, batch)
        assert nllh.shape == (8,)
        assert np.isfinite(np.asarray(nllh)).all()

    def test_density_integrates_to_one(self):
        """Lebedev-style quadrature over S2: integral of p must be ~1."""
        flow, params, batch = self._setup()
        n_theta, n_phi = 64, 128
        theta = (np.arange(n_theta) + 0.5) * np.pi / n_theta
        phi = (np.arange(n_phi) + 0.5) * 2 * np.pi / n_phi
        tt, pp = np.meshgrid(theta, phi, indexing="ij")
        dirs = np.stack(
            [
                np.sin(tt) * np.cos(pp),
                np.sin(tt) * np.sin(pp),
                np.cos(tt),
            ],
            axis=-1,
        ).reshape(-1, 3)
        w = (np.sin(tt) * (np.pi / n_theta) * (2 * np.pi / n_phi)).reshape(
            -1
        )
        B = batch.batch_size

        @jax.jit
        def lp(y):
            return flow.log_prob(
                params, batch, jnp.broadcast_to(y[None, :], (B, 3))
            )

        total = np.zeros(B)
        for y, wi in zip(dirs[::1], w):
            total += wi * np.exp(np.asarray(lp(jnp.asarray(y))))
        np.testing.assert_allclose(total, 1.0, rtol=2e-2)

    def test_training_concentrates_on_truth(self):
        import optax

        flow, params, batch = self._setup()
        opt = optax.adam(3e-3)
        state = opt.init(params)

        @jax.jit
        def step(params, state):
            def loss_fn(p):
                return flow.loss_from_batch(
                    flow.apply(p, batch), batch
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            upd, state = opt.update(grads, state)
            return optax.apply_updates(params, upd), state, loss

        first = None
        for i in range(150):
            params, state, loss = step(params, state)
            if first is None:
                first = float(loss)
        # NLLH must drop well below the uniform-density level log(4*pi)
        uniform = float(np.log(4 * np.pi))
        assert float(loss) < first
        assert float(loss) < uniform - 0.5, (float(loss), uniform)
        # mean direction approaches the per-event truth
        md = np.asarray(flow.mean_direction(params, batch))
        truth = np.asarray(batch.unpacked().labels["direction"])
        cos = np.sum(md * truth, axis=1)
        assert cos.mean() > 0.8, cos


def test_density_entry_points_on_packed_batches():
    """log_prob/sample/mean_direction must unpack packed-label transport
    batches (regression: only __call__ unpacked, so conditioning on a
    label column raised KeyError on DataLoader batches)."""
    from graphnet_tpu.data.dataloader import _to_device_packed

    evs = events()
    labels = {
        "energy": np.asarray([1.0, 2.0, 0.5, 3.0], np.float32),
        "azimuth": np.asarray([0.1, 0.2, 0.3, 0.4], np.float32),
    }
    batch = make_batch(evs, labels=labels, length=32)

    def pack(b, lab):
        return _to_device_packed(
            np.asarray(b.x),
            np.asarray(b.mask),
            np.asarray(b.n_pulses),
            lab,
            {},
        )

    packed = pack(batch, labels)
    assert packed.label_spec is not None and packed.labels == {}

    flow = NormalizingFlow(
        backbone=DynEdge(nb_inputs=4),
        nb_targets=1,
        target_labels=("energy",),
        condition_columns=("azimuth",),
    )
    params = flow.init(jax.random.PRNGKey(0), packed)
    y = np.asarray([[1.0], [2.0], [0.5], [3.0]], np.float32)
    lp = flow.log_prob(params, packed, jnp.asarray(y))
    assert np.isfinite(np.asarray(lp)).all()
    s = flow.sample(params, packed, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(s)).all()

    from graphnet_tpu.models.normalizing_flow import SphericalFlow

    d = np.stack(
        [np.ones(4), np.zeros(4), np.zeros(4)], axis=1
    ).astype(np.float32)
    batch2 = make_batch(
        evs, labels={"direction": d, "azimuth": labels["azimuth"]}, length=32
    )
    packed2 = pack(
        batch2, {"direction": d, "azimuth": labels["azimuth"]}
    )
    sflow = SphericalFlow(
        backbone=DynEdge(nb_inputs=4),
        target_labels=("direction",),
        condition_columns=("azimuth",),
    )
    sparams = sflow.init(jax.random.PRNGKey(0), packed2)
    lp2 = sflow.log_prob(sparams, packed2, jnp.asarray(d))
    assert np.isfinite(np.asarray(lp2)).all()
    md = sflow.mean_direction(sparams, packed2)
    assert np.isfinite(np.asarray(md)).all()
