"""Tests: DataModule split, string selections, weight fitting."""

import os
import shutil

import numpy as np
import pytest

from graphnet_tpu.constants import EXAMPLE_SQLITE_DATA
from graphnet_tpu.data.constants import FEATURES, TRUTH
from graphnet_tpu.data.datamodule import GraphNeTDataModule
from graphnet_tpu.data.sqlite_dataset import SQLiteDataset
from graphnet_tpu.models.detector.prometheus import Prometheus
from graphnet_tpu.models.graphs import KNNGraph
from graphnet_tpu.training.weight_fitting import BjoernLow, Uniform

pytestmark = pytest.mark.skipif(
    not os.path.exists(EXAMPLE_SQLITE_DATA),
    reason="example data not present",
)


def dataset_args():
    return dict(
        path=EXAMPLE_SQLITE_DATA,
        graph_definition=KNNGraph(detector=Prometheus()),
        pulsemaps="total",
        features=FEATURES.PROMETHEUS,
        truth=TRUTH.PROMETHEUS,
        truth_table="mc_truth",
    )


class TestDataModule:
    def test_split_and_loaders(self):
        dm = GraphNeTDataModule(
            dataset_reference=SQLiteDataset,
            dataset_args=dataset_args(),
            train_val_split=[0.8, 0.2],
            split_seed=1,
            train_dataloader_kwargs={"batch_size": 8},
            validation_dataloader_kwargs={"batch_size": 8},
        )
        n_train = len(dm.train_dataset)
        n_val = len(dm.val_dataset)
        assert n_train + n_val == 50
        assert n_val == 10
        # no overlap
        assert not set(dm.train_dataset._indices) & set(
            dm.val_dataset._indices
        )
        b = next(iter(dm.train_dataloader()))
        assert b.batch_size <= 8

    def test_test_selection_excluded(self):
        probe = SQLiteDataset(**dataset_args())
        test_sel = probe._indices[:5]
        dm = GraphNeTDataModule(
            dataset_reference=SQLiteDataset,
            dataset_args=dataset_args(),
            test_selection=test_sel,
        )
        assert len(dm.test_dataset) == 5
        assert not (
            set(dm.train_dataset._indices) | set(dm.val_dataset._indices)
        ) & set(test_sel)


class TestStringSelection:
    def test_query(self):
        ds = SQLiteDataset(
            **dataset_args(), selection="injection_energy > 100"
        )
        assert 0 < len(ds) < 50
        for i in range(len(ds)):
            assert ds[i].labels["injection_energy"] > 100

    def test_random_events(self):
        ds = SQLiteDataset(
            **dataset_args(),
            selection="10 random events ~ injection_energy > 10",
            seed=7,
        )
        assert len(ds) == 10

    def test_percent(self):
        ds = SQLiteDataset(
            **dataset_args(), selection="20% random events ~ ", seed=7
        )
        assert len(ds) == 10


class TestWeightFitting(object):
    @pytest.fixture()
    def db(self, tmp_path):
        p = str(tmp_path / "events.db")
        shutil.copy(EXAMPLE_SQLITE_DATA, p)
        return p

    def test_uniform(self, db):
        fitter = Uniform(db, truth_table="mc_truth")
        w = fitter.fit(
            bins=np.linspace(0, 4, 10),
            variable="injection_energy",
            transform=np.log10,
            add_to_database=True,
        )
        assert "injection_energy_uniform_weight" in w.columns
        assert len(w) == 50
        assert np.isfinite(
            w["injection_energy_uniform_weight"].to_numpy()
        ).all()
        # weights written back and loadable as loss weights
        import sqlite3

        with sqlite3.connect(db) as con:
            n = con.execute(
                "SELECT COUNT(*) FROM injection_energy_uniform_weight"
            ).fetchone()[0]
        assert n == 50

    def test_bjoern_low(self, db):
        fitter = BjoernLow(db, truth_table="mc_truth")
        w = fitter.fit(
            bins=np.linspace(0, 4, 10),
            variable="injection_energy",
            transform=np.log10,
            x_low=1.5,
        )
        name = "injection_energy_bjoern_low_weight"
        assert name in w.columns
        assert (w[name] >= 0).all()

    def test_loss_weight_column_roundtrip(self, db):
        Uniform(db, truth_table="mc_truth").fit(
            bins=np.linspace(0, 4, 10),
            variable="injection_energy",
            transform=np.log10,
            add_to_database=True,
            weight_name="w",
        )
        args = dataset_args()
        args["path"] = db
        ds = SQLiteDataset(
            **args, loss_weight_table="w", loss_weight_column="w"
        )
        ev = ds[0]
        assert "w" in ev.labels
        assert np.isfinite(float(ev.labels["w"]))
