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


@pytest.fixture(scope="module")
def flow_and_params():
    evs = events()
    labels = {"energy": np.asarray([1.0, 2.0, 0.5, 3.0], np.float32)}
    batch = make_batch(evs, labels=labels, length=32)
    flow = NormalizingFlow(
        backbone=DynEdge(nb_inputs=4),
        nb_targets=1,
        target_labels=("energy",),
    )
    params = flow.init(jax.random.PRNGKey(0), batch)
    return flow, params, batch


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
