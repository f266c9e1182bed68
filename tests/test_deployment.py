"""Deployment round trip: train → save config+params → DeploymentModule
inference on raw events."""

import os

import numpy as np
import pytest

from graphnet_tpu.constants import EXAMPLE_SQLITE_DATA
from graphnet_tpu.data.constants import FEATURES, TRUTH
from graphnet_tpu.data.dataloader import DataLoader
from graphnet_tpu.data.sqlite_dataset import SQLiteDataset
from graphnet_tpu.deployment.deployment_module import DeploymentModule
from graphnet_tpu.models.detector.prometheus import Prometheus
from graphnet_tpu.models.gnn.dynedge import DynEdge
from graphnet_tpu.models.graphs import KNNGraph
from graphnet_tpu.models.standard_model import StandardModel
from graphnet_tpu.models.task.reconstruction import EnergyReconstruction
from graphnet_tpu.training.loss_functions import LogCoshLoss
from graphnet_tpu.training.trainer import Trainer
from graphnet_tpu.utils.config import TRANSFORM_REGISTRY, save_model_config

pytestmark = pytest.mark.skipif(
    not os.path.exists(EXAMPLE_SQLITE_DATA),
    reason="example data not present",
)


def test_deployment_module_roundtrip(tmp_path):
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
                transform_prediction_and_target=TRANSFORM_REGISTRY[
                    "log10"
                ],
            ),
        ),
    )
    loader = DataLoader(ds, batch_size=8, shuffle=False)
    trainer = Trainer(model)
    trainer.init(next(iter(loader)))

    config_path = str(tmp_path / "model.yml")
    params_path = str(tmp_path / "params.pkl")
    save_model_config(model, config_path)
    trainer.save_state_dict(params_path)

    module = DeploymentModule(config_path, params_path)
    assert module.prediction_columns == ["energy_pred"]

    events = [ds[i] for i in range(4) if ds[i].n_pulses >= 2]
    preds = module(events)
    assert preds.shape == (len(events), 1)
    assert np.isfinite(preds).all()

    # deployment predictions match trainer.predict on the same events
    single = module(events[0])
    np.testing.assert_allclose(single[0], preds[0], rtol=1e-4)

    # batch-size bucketing: a non-power-of-two request pads to the next
    # bucket (one executable per bucket, not per request size) and the
    # padded rows are trimmed; real-event predictions are unaffected
    three = module(events[:3])
    assert three.shape == (3, 1)
    np.testing.assert_allclose(three, preds[:3], rtol=1e-4)
    padded = DeploymentModule._pad_batch_size(
        __import__(
            "graphnet_tpu.data.dataloader", fromlist=["collate_events"]
        ).collate_events(events[:3], min_pulses=1)
    )
    assert padded.batch_size == 4
    assert not np.asarray(padded.mask)[3].any()
