"""DatasetConfig / TrainingConfig round-trips (VERDICT r1 item 8;
reference ``utilities/config/dataset_config.py:32``,
``training_config.py:8``) and the repeat_labels node-level truth fix."""

import os

import numpy as np
import pytest

from graphnet_tpu.constants import EXAMPLE_SQLITE_DATA
from graphnet_tpu.data.constants import FEATURES, TRUTH
from graphnet_tpu.data.sqlite_dataset import SQLiteDataset
from graphnet_tpu.models.detector.prometheus import Prometheus
from graphnet_tpu.models.graphs import KNNGraph
from graphnet_tpu.training.labels import Direction
from graphnet_tpu.utils.config import (
    TrainingConfig,
    load_dataset,
    save_dataset_config,
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(EXAMPLE_SQLITE_DATA),
    reason="example data not present",
)


def _dataset(**kwargs):
    return SQLiteDataset(
        path=EXAMPLE_SQLITE_DATA,
        graph_definition=KNNGraph(detector=Prometheus()),
        pulsemaps="total",
        features=FEATURES.PROMETHEUS,
        truth=TRUTH.PROMETHEUS,
        truth_table="mc_truth",
        **kwargs,
    )


class TestDatasetConfig:
    def test_roundtrip_single(self, tmp_path):
        ds = _dataset(
            labels={
                "direction": Direction(
                    azimuth_key="injection_azimuth",
                    zenith_key="injection_zenith",
                )
            }
        )
        path = str(tmp_path / "dataset.yml")
        save_dataset_config(ds, path)
        ds2 = load_dataset(path)
        assert type(ds2) is SQLiteDataset
        assert len(ds2) == len(ds)
        e1, e2 = ds[0], ds2[0]
        np.testing.assert_allclose(e2.x, e1.x)
        np.testing.assert_allclose(
            e2.labels["direction"], e1.labels["direction"]
        )

    @staticmethod
    def _dump_with_selection(tmp_path, selection):
        """Reference workflow: dump the config, set a named-selection dict,
        re-dump (``dataset_config.py:70-100``)."""
        import yaml

        ds = _dataset()
        n = len(ds)
        path = str(tmp_path / "dataset.yml")
        save_dataset_config(ds, path)
        with open(path) as f:
            cfg = yaml.safe_load(f)
        cfg["arguments"]["selection"] = selection(n)
        with open(path, "w") as f:
            yaml.safe_dump(cfg, f)
        return path, n

    def test_dict_selection_in_constructor_rejected(self):
        with pytest.raises(TypeError, match="config-level|load_dataset"):
            _dataset(selection={"train": [0, 1]})

    def test_roundtrip_selection_dict(self, tmp_path):
        path, n = self._dump_with_selection(
            tmp_path,
            lambda n: {
                "train": list(range(n // 2)),
                "test": list(range(n // 2, n)),
            },
        )
        datasets = load_dataset(path)
        assert set(datasets) == {"train", "test"}
        assert len(datasets["train"]) == n // 2
        assert len(datasets["train"]) + len(datasets["test"]) == n

    def test_roundtrip_ensemble_selection(self, tmp_path):
        from graphnet_tpu.data.dataset import EnsembleDataset

        path, n = self._dump_with_selection(
            tmp_path,
            lambda n: {
                "train": [
                    list(range(0, n // 2)),
                    list(range(n // 2, n)),
                ]
            },
        )
        datasets = load_dataset(path)
        assert isinstance(datasets["train"], EnsembleDataset)
        assert len(datasets["train"]) == n


class TestTrainingConfig:
    def test_roundtrip(self, tmp_path):
        cfg = TrainingConfig(
            target="total_energy",
            early_stopping_patience=7,
            fit={"max_epochs": 3},
            dataloader={"batch_size": 32, "shuffle": True},
        )
        path = str(tmp_path / "training.yml")
        cfg.dump(path)
        cfg2 = TrainingConfig.load(path)
        assert cfg2 == cfg


class TestRepeatLabels:
    def test_repeat_labels_to_nodes(self):
        gd = KNNGraph(detector=Prometheus(), repeat_labels=True)
        ds = SQLiteDataset(
            path=EXAMPLE_SQLITE_DATA,
            graph_definition=gd,
            pulsemaps="total",
            features=FEATURES.PROMETHEUS,
            truth=TRUTH.PROMETHEUS,
            truth_table="mc_truth",
        )
        e = ds[0]
        # scalar truth repeated per node (reference
        # graph_definition.py:463-465)
        assert "total_energy" in e.node_labels
        v = e.node_labels["total_energy"]
        assert v.shape == (e.n_pulses,)
        np.testing.assert_allclose(v, float(e.labels["total_energy"]))

    def test_no_repeat_by_default(self):
        ds = _dataset()
        e = ds[0]
        assert "total_energy" not in e.node_labels
