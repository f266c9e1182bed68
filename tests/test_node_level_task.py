"""Node-level (pulse-level) task: binary per-pulse classification on node
latents — the pulse-cleaning use case (reference I3PulseCleanerModule)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graphnet_tpu.batch import make_batch
from graphnet_tpu.models.gnn.dynedge import DynEdge
from graphnet_tpu.models.standard_model import StandardModel
from graphnet_tpu.models.task.classification import BinaryClassificationTask
from graphnet_tpu.training.loss_functions import BinaryCrossEntropyLoss


def test_pulse_level_classification_trains():
    rng = np.random.default_rng(0)
    events, node_labels = [], []
    for _ in range(4):
        n = int(rng.integers(8, 30))
        ev = rng.standard_normal((n, 4)).astype(np.float32)
        # learnable signal: label correlates with first feature
        node_labels.append(
            {"signal": (ev[:, 0] > 0).astype(np.float32)}
        )
        events.append(ev)
    batch = make_batch(events, node_labels=node_labels, length=32)

    # add_norm_layer keeps node latents O(1) so the sigmoid head does not
    # saturate at init (the realistic pulse-cleaning configuration)
    model = StandardModel(
        backbone=DynEdge(
            nb_inputs=4, skip_readout=True, add_norm_layer=True
        ),
        tasks=(
            BinaryClassificationTask(
                loss_function=BinaryCrossEntropyLoss(),
                target_labels=("signal",),
                node_level=True,
            ),
        ),
    )
    params = model.init(jax.random.PRNGKey(0), batch)
    outputs = model.apply(params, batch)
    pred, _ = outputs[0]
    assert pred.shape == (4, 32, 1)

    loss = model.loss_from_batch(outputs, batch)
    assert np.isfinite(float(loss))

    # padding must not contribute: loss identical under longer padding
    batch2 = make_batch(events, node_labels=node_labels, length=64)
    outputs2 = model.apply(params, batch2)
    loss2 = model.loss_from_batch(outputs2, batch2)
    np.testing.assert_allclose(
        float(loss), float(loss2), rtol=1e-4
    )

    # trains end to end
    import optax

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            return model.loss_from_batch(model.apply(p, batch), batch)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    first = None
    for _ in range(20):
        params, opt_state, loss = step(params, opt_state)
        if first is None:
            first = float(loss)
    assert float(loss) < first


def test_padded_nodes_excluded_even_when_their_loss_is_nonzero():
    """Regression: [N,1] loss elements x [N] weights must not
    outer-product — that silently averaged padded-node losses in (only
    visible when padded positions carry nonzero per-element loss)."""
    import numpy as np
    import jax.numpy as jnp

    from graphnet_tpu.models.task.task import IdentityTask
    from graphnet_tpu.training.loss_functions import LogCoshLoss

    task = IdentityTask(
        nb_outputs=1,
        loss_function=LogCoshLoss(),  # elements come back [N, 1]
        target_labels=("y",),
        node_level=True,
    )
    pred = jnp.asarray([[[0.3], [-0.2], [50.0], [50.0]]])  # pads huge
    node_labels = {"y": jnp.asarray([[0.0, 0.0, 0.0, 0.0]])}
    mask = jnp.asarray([[True, True, False, False]])
    loss = task.compute_loss(
        pred, jnp.float32(0.0), {}, node_labels=node_labels, mask=mask
    )

    def logcosh(x):
        return x + np.log1p(np.exp(-2 * x)) - np.log(2)

    expected = (logcosh(0.3) + logcosh(0.2)) / 2  # valid nodes only
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)
