"""Task head tests: output transforms, transform-inverse validation,
StandardModel composition and loss."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graphnet_tpu.batch import make_batch
from graphnet_tpu.models.gnn.dynedge import DynEdge
from graphnet_tpu.models.standard_model import StandardModel
from graphnet_tpu.models.task.classification import (
    BinaryClassificationTask,
    MulticlassClassificationTask,
)
from graphnet_tpu.models.task.reconstruction import (
    AzimuthReconstructionWithKappa,
    DirectionReconstructionWithKappa,
    EnergyReconstruction,
    ZenithReconstructionWithKappa,
)
from graphnet_tpu.models.task.task import validate_transforms
from graphnet_tpu.training.loss_functions import (
    CrossEntropyLoss,
    LogCoshLoss,
    VonMisesFisher2DLoss,
    VonMisesFisher3DLoss,
)


def latents(n=4, d=128, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal((n, d)).astype(np.float32)
    )


class TestHeads:
    def test_energy_positive(self):
        task = EnergyReconstruction(loss_function=LogCoshLoss())
        p = task.init(jax.random.PRNGKey(0), latents())
        pred, reg = task.apply(p, latents())
        assert pred.shape == (4, 1)
        assert (np.asarray(pred) > 0).all()
        assert float(reg) == 0.0

    def test_zenith_range(self):
        task = ZenithReconstructionWithKappa(
            loss_function=VonMisesFisher2DLoss()
        )
        p = task.init(jax.random.PRNGKey(0), latents())
        pred, _ = task.apply(p, latents())
        z = np.asarray(pred)
        assert ((z[:, 0] >= 0) & (z[:, 0] <= np.pi)).all()
        assert (z[:, 1] > 0).all()

    def test_azimuth_range(self):
        task = AzimuthReconstructionWithKappa(
            loss_function=VonMisesFisher2DLoss()
        )
        p = task.init(jax.random.PRNGKey(0), latents())
        pred, _ = task.apply(p, latents())
        a = np.asarray(pred)
        assert ((a[:, 0] >= 0) & (a[:, 0] < 2 * np.pi)).all()

    def test_direction_unit_norm(self):
        task = DirectionReconstructionWithKappa(
            loss_function=VonMisesFisher3DLoss()
        )
        p = task.init(jax.random.PRNGKey(0), latents())
        pred, _ = task.apply(p, latents())
        v = np.asarray(pred)
        np.testing.assert_allclose(
            np.linalg.norm(v[:, :3], axis=1), 1.0, rtol=1e-4
        )

    def test_transform_validation_catches_non_inverse(self):
        with pytest.raises(AssertionError):
            validate_transforms(
                None,
                transform_target=lambda x: jnp.log10(x),
                transform_inference=lambda x: x,  # not the inverse
                transform_support=(1.0, 1e6),
            )
        # valid pair passes
        validate_transforms(
            None,
            transform_target=lambda x: jnp.log10(x),
            transform_inference=lambda x: jnp.power(10.0, x),
            transform_support=(1.0, 1e6),
        )

    def test_transform_target_inference_switch(self):
        task = EnergyReconstruction(
            loss_function=LogCoshLoss(),
            transform_target=lambda x: jnp.log10(x),
            transform_inference=lambda x: jnp.power(10.0, x),
            transform_support=(1.0, 1e6),
        )
        p = task.init(jax.random.PRNGKey(0), latents())
        pred_train, _ = task.apply(p, latents(), inference=False)
        pred_inf, _ = task.apply(p, latents(), inference=True)
        # inference applies 10^x on top of training prediction
        np.testing.assert_allclose(
            np.asarray(pred_inf),
            np.power(10.0, np.asarray(pred_train)),
            rtol=1e-4,
        )


class TestStandardModel:
    def _events(self, B=3):
        rng = np.random.default_rng(11)
        return [
            rng.standard_normal((int(rng.integers(5, 30)), 7)).astype(
                np.float32
            )
            for _ in range(B)
        ]

    def test_multi_task_forward_and_loss(self):
        events = self._events()
        labels = {
            "energy": np.abs(
                np.random.default_rng(1).standard_normal(3) * 100
            ).astype(np.float32),
            "zenith": np.asarray([0.3, 1.2, 2.0], np.float32),
        }
        batch = make_batch(events, labels=labels, length=32)
        model = StandardModel(
            backbone=DynEdge(nb_inputs=7),
            tasks=(
                EnergyReconstruction(
                    loss_function=LogCoshLoss(),
                    transform_prediction_and_target=lambda x: jnp.log10(x),
                ),
                ZenithReconstructionWithKappa(
                    loss_function=VonMisesFisher2DLoss()
                ),
            ),
        )
        params = model.init(jax.random.PRNGKey(0), batch)
        outputs = model.apply(params, batch)
        assert len(outputs) == 2
        assert outputs[0][0].shape == (3, 1)
        assert outputs[1][0].shape == (3, 2)
        loss = model.loss(outputs, batch.labels)
        assert np.isfinite(float(loss))

        @jax.jit
        def loss_fn(p, b):
            return model.loss(model.apply(p, b), b.labels)

        g = jax.grad(loss_fn)(params, batch)
        assert all(
            np.isfinite(np.asarray(x)).all()
            for x in jax.tree_util.tree_leaves(g)
        )

    def test_classification_task(self):
        events = self._events()
        labels = {"pid": np.asarray([12, 13, 16], np.int32)}
        batch = make_batch(events, labels=labels, length=32)
        model = StandardModel(
            backbone=DynEdge(nb_inputs=7),
            tasks=(
                MulticlassClassificationTask(
                    nb_outputs=3,
                    target_labels=("pid",),
                    loss_function=CrossEntropyLoss([12, 13, 16]),
                ),
            ),
        )
        params = model.init(jax.random.PRNGKey(0), batch)
        outputs = model.apply(params, batch)
        assert outputs[0][0].shape == (3, 3)
        loss = float(model.loss(outputs, batch.labels))
        assert np.isfinite(loss)

    def test_prediction_labels(self):
        model = StandardModel(
            backbone=DynEdge(nb_inputs=7),
            tasks=(
                EnergyReconstruction(loss_function=LogCoshLoss()),
                BinaryClassificationTask(
                    loss_function=LogCoshLoss(), target_labels=("track",)
                ),
            ),
        )
        assert model.prediction_labels == ["energy_pred", "target_pred"]
        assert model.target_labels == ["energy", "track"]
