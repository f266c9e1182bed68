"""Preemption-safe resume: training state (params + optimiser + epoch)
round-trips through orbax and fit() continues from the saved epoch."""

import os

import numpy as np
import pytest

from graphnet_tpu.constants import EXAMPLE_SQLITE_DATA
from graphnet_tpu.data.constants import FEATURES, TRUTH
from graphnet_tpu.data.dataloader import DataLoader
from graphnet_tpu.data.sqlite_dataset import SQLiteDataset
from graphnet_tpu.models.detector.prometheus import Prometheus
from graphnet_tpu.models.gnn.dynedge import DynEdge
from graphnet_tpu.models.graphs import KNNGraph
from graphnet_tpu.models.standard_model import StandardModel
from graphnet_tpu.models.task.reconstruction import EnergyReconstruction
from graphnet_tpu.training.loss_functions import LogCoshLoss
from graphnet_tpu.training.trainer import Trainer

import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    not os.path.exists(EXAMPLE_SQLITE_DATA),
    reason="example data not present",
)


def build():
    ds = SQLiteDataset(
        path=EXAMPLE_SQLITE_DATA,
        graph_definition=KNNGraph(detector=Prometheus()),
        pulsemaps="total",
        features=FEATURES.PROMETHEUS,
        truth=TRUTH.PROMETHEUS,
        truth_table="mc_truth",
    )
    model = StandardModel(
        backbone=DynEdge(nb_inputs=4),
        tasks=(
            EnergyReconstruction(
                loss_function=LogCoshLoss(),
                target_labels=("total_energy",),
                transform_prediction_and_target=lambda x: jnp.log10(x),
            ),
        ),
    )
    return ds, model


def test_resume_continues_from_epoch(tmp_path):
    ds, model = build()
    loader = DataLoader(ds, batch_size=16, shuffle=True, seed=5)

    trainer = Trainer(
        model, learning_rate=1e-4, checkpoint_dir=str(tmp_path)
    )
    trainer.fit(loader, max_epochs=2, use_default_schedule=False)
    assert os.path.exists(str(tmp_path / "last"))
    step_after_2 = trainer.state.step

    # fresh trainer resumes at epoch 2 and runs only epochs 2..3
    trainer2 = Trainer(
        model, learning_rate=1e-4, checkpoint_dir=str(tmp_path)
    )
    history = trainer2.fit(
        loader,
        max_epochs=4,
        use_default_schedule=False,
        resume=True,
    )
    assert len(history["train_loss"]) == 2  # epochs 2 and 3 only
    assert trainer2.state.step > step_after_2

    # resumed params differ from a fresh init (state actually restored)
    trainer3 = Trainer(model, learning_rate=1e-4)
    trainer3.init(next(iter(loader)))
    import jax

    leaves2 = jax.tree_util.tree_leaves(trainer2.state.params)
    leaves3 = jax.tree_util.tree_leaves(trainer3.state.params)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves2, leaves3)
    )


def test_resume_preserves_swa_average(tmp_path):
    """The SWA/EMA running average is part of the training state: an
    interrupted-and-resumed SWA run must end with the same averaged
    weights as an uninterrupted one (regression: averages used to
    restart from scratch after resume)."""
    import jax

    ds, model = build()
    loader = DataLoader(ds, batch_size=16, shuffle=True, seed=5)

    # uninterrupted: 4 epochs of SWA
    t_full = Trainer(model, learning_rate=1e-4, averaging="swa")
    t_full.fit(loader, max_epochs=4, use_default_schedule=False)

    # interrupted: 2 epochs, then resume into a fresh trainer for 4
    t_a = Trainer(
        model,
        learning_rate=1e-4,
        averaging="swa",
        checkpoint_dir=str(tmp_path),
    )
    t_a.fit(loader, max_epochs=2, use_default_schedule=False)
    t_b = Trainer(
        model,
        learning_rate=1e-4,
        averaging="swa",
        checkpoint_dir=str(tmp_path),
    )
    t_b.fit(
        loader, max_epochs=4, use_default_schedule=False, resume=True
    )

    assert t_b._avg_count == t_full._avg_count
    for a, b in zip(
        jax.tree_util.tree_leaves(t_full.state.params),
        jax.tree_util.tree_leaves(t_b.state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7
        )
