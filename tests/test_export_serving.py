"""AOT serving export: StableHLO artifact == live DeploymentModule, and
serves from the artifact alone (no model config / params / model code)."""

import os

import numpy as np
import pytest

from graphnet_tpu.constants import EXAMPLE_SQLITE_DATA
from graphnet_tpu.data.constants import FEATURES, TRUTH
from graphnet_tpu.data.dataloader import DataLoader
from graphnet_tpu.data.sqlite_dataset import SQLiteDataset
from graphnet_tpu.deployment.deployment_module import DeploymentModule
from graphnet_tpu.deployment.export import ExportedModel
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


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("export")
    ds = SQLiteDataset(
        path=EXAMPLE_SQLITE_DATA,
        graph_definition=KNNGraph(detector=Prometheus()),
        pulsemaps="total",
        features=FEATURES.PROMETHEUS,
        truth=TRUTH.PROMETHEUS,
        truth_table="mc_truth",
    )
    model = StandardModel(
        backbone=DynEdge(nb_inputs=4, dynedge_layer_sizes=((8, 8),)),
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
    config_path = str(tmp / "model.yml")
    params_path = str(tmp / "params.pkl")
    save_model_config(model, config_path)
    trainer.save_state_dict(params_path)
    module = DeploymentModule(config_path, params_path)
    export_dir = str(tmp / "serving")
    meta = module.export_serving(
        export_dir, batch_sizes=(1, 4), lengths=(64, 128)
    )
    events = [
        e for e in ds.get_events(list(range(12))) if e.n_pulses >= 1
    ]
    return module, export_dir, meta, events


class TestExportServing:
    def test_artifact_layout(self, artifacts):
        _, export_dir, meta, _ = artifacts
        assert meta["prediction_columns"] == ["energy_pred"]
        assert len(meta["shapes"]) == 4  # 2 batch sizes x 2 lengths
        for s in meta["shapes"]:
            assert os.path.exists(os.path.join(export_dir, s["file"]))

    def test_matches_live_module(self, artifacts):
        module, export_dir, _, events = artifacts
        served = ExportedModel(export_dir)
        assert served.prediction_columns == module.prediction_columns
        live = module(events[:4])
        aot = served(events[:4])
        assert aot.shape == live.shape
        np.testing.assert_allclose(aot, live, rtol=2e-4, atol=1e-5)

    def test_single_event_and_padding(self, artifacts):
        module, export_dir, _, events = artifacts
        served = ExportedModel(export_dir)
        one = served(events[0])
        np.testing.assert_allclose(
            one, module(events[0]), rtol=2e-4, atol=1e-5
        )
        # 3 events pad to the B=4 executable; rows match 1-at-a-time
        three = served(events[:3])
        assert three.shape == (3, 1)
        singles = np.concatenate([served(e) for e in events[:3]])
        np.testing.assert_allclose(three, singles, rtol=2e-4, atol=1e-5)

    def test_chunking_beyond_largest_batch(self, artifacts):
        module, export_dir, _, events = artifacts
        served = ExportedModel(export_dir)
        n = min(10, len(events))  # > max exported batch (4)
        out = served(events[:n])
        assert out.shape == (n, 1)
        np.testing.assert_allclose(
            out, module(events[:n]), rtol=2e-4, atol=1e-5
        )

    def test_long_event_guard_and_optin_truncation(self, artifacts):
        """Events beyond the exported length grid raise (the live
        module would use more pulses); truncate_long=True opts into
        first-L-pulses truncation."""
        from graphnet_tpu.models.graphs.graph_definition import Event

        _, export_dir, _, events = artifacts
        rng = np.random.default_rng(0)
        long_ev = Event(
            x=rng.standard_normal((200, 4)).astype(np.float32),
            features=list(events[0].features),
        )
        served = ExportedModel(export_dir)  # max exported L = 128
        with pytest.raises(ValueError, match="exceeds the largest"):
            served(long_ev)
        lax = ExportedModel(export_dir, truncate_long=True)
        out = lax(long_ev)
        truncated = Event(
            x=long_ev.x[:128], features=list(long_ev.features)
        )
        np.testing.assert_allclose(
            out, lax(truncated), rtol=2e-4, atol=1e-5
        )

    def test_empty_event_rows_stay_aligned(self, artifacts):
        """0-pulse events yield NaN rows; other rows keep their input
        positions (both serving paths)."""
        from graphnet_tpu.models.graphs.graph_definition import Event

        module, export_dir, _, events = artifacts
        empty = Event(
            x=np.zeros((0, 4), np.float32),
            features=list(events[0].features),
        )
        req = [events[0], empty, events[1]]
        for impl in (module, ExportedModel(export_dir)):
            out = impl(req)
            assert out.shape == (3, 1)
            assert np.isnan(out[1, 0])
            singles = np.concatenate(
                [impl(events[0]), impl(events[1])]
            )
            np.testing.assert_allclose(
                out[[0, 2]], singles, rtol=2e-4, atol=1e-5
            )

    def test_feature_width_guard(self, artifacts):
        _, export_dir, _, events = artifacts
        served = ExportedModel(export_dir)
        from graphnet_tpu.models.graphs.graph_definition import Event

        bad = Event(
            x=np.zeros((5, 7), np.float32),
            features=[f"f{i}" for i in range(7)],
        )
        with pytest.raises(ValueError, match="nb_inputs"):
            served(bad)
