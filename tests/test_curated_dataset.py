"""CuratedDataset plumbing (VERDICT r1 weak item 9): metadata/description,
backend selection, feature subsetting, download gating — exercised through
the bundled-data TestDataset (no network needed)."""

import os

import numpy as np
import pytest

from graphnet_tpu.constants import EXAMPLE_SQLITE_DATA
from graphnet_tpu.data.curated_datamodule import CuratedDataset
from graphnet_tpu.datasets.test_dataset import TestDataset
from graphnet_tpu.models.detector.prometheus import Prometheus
from graphnet_tpu.models.graphs import KNNGraph

pytestmark = pytest.mark.skipif(
    not os.path.exists(EXAMPLE_SQLITE_DATA),
    reason="example data not present",
)


def _make(**kwargs):
    return TestDataset(
        graph_definition=KNNGraph(detector=Prometheus()),
        train_dataloader_kwargs={"batch_size": 8},
        **kwargs,
    )


class TestCuratedPlumbing:
    def test_metadata_properties(self):
        ds = _make()
        assert ds.pulsemaps == ["total"]
        assert ds.truth_table == "mc_truth"
        assert "sensor_pos_x" in ds.features
        assert "total_energy" in ds.event_truth
        assert "Prometheus" in ds.experiment
        assert ds.citation is None

    def test_description_prints(self, capsys):
        ds = _make()
        ds.description()
        out = capsys.readouterr().out
        assert "TestDataset" in out
        assert "pulsemaps" in out
        assert "50-event" in out

    def test_loaders_yield_batches(self):
        ds = _make()
        batch = next(iter(ds.train_dataloader()))
        assert batch.batch_size == 8
        assert np.isfinite(np.asarray(batch.x)).all()

    def test_feature_subset_and_validation(self):
        # subsetting features requires a graph definition configured for
        # the same subset (the GraphDefinition validates its input names,
        # reference `graph_definition.py:148-186`)
        subset = ["sensor_pos_x", "sensor_pos_y", "t"]
        ds = TestDataset(
            graph_definition=KNNGraph(
                detector=Prometheus(),
                input_feature_names=subset,
                columns=(0, 1),
            ),
            train_dataloader_kwargs={"batch_size": 8},
            features=subset,
        )
        batch = next(iter(ds.train_dataloader()))
        assert batch.num_features == 3
        with pytest.raises(AssertionError, match="unknown features"):
            _make(features=["not_a_feature"])

    def test_unknown_backend_rejected(self):
        with pytest.raises(AssertionError, match="backend"):
            _make(backend="hdf5")

    def test_download_gate_raises_clearly(self, tmp_path):
        class Hosted(CuratedDataset):
            _pulsemaps = ["total"]
            _features = ["t"]
            _event_truth = ["e"]
            _available_backends = ["sqlite"]

            def _prepare_args(self, backend, features, truth):
                return {}, None, None

        with pytest.raises(RuntimeError, match="no network"):
            Hosted(
                graph_definition=KNNGraph(detector=Prometheus()),
                download_dir=str(tmp_path / "nonexistent"),
            )


class TestERDADownloadPath:
    """The FULL hosted-dataset path — download (file:// mirror) →
    tar.gz extract → directory layout → SQLiteDataset load → batches —
    without network egress (reference ``curated_datamodule.py:270-282``
    wgets + untars the same way)."""

    def _archive(self, tmp_path):
        """A sharelink-style archive containing a one-table copy of the
        bundled DB under the name PublicPrometheusDataset expects."""
        import shutil
        import tarfile

        payload = tmp_path / "payload"
        payload.mkdir()
        shutil.copy(
            EXAMPLE_SQLITE_DATA, payload / "prometheus-events.db"
        )
        mirror = tmp_path / "mirror"
        mirror.mkdir()
        # ERDA sharelinks have no .tar.gz suffix — neither does ours
        with tarfile.open(str(mirror / "ABC123"), "w:gz") as tf:
            tf.add(
                str(payload / "prometheus-events.db"),
                arcname="prometheus-events.db",
            )
        return mirror

    def test_download_extract_layout_load(self, tmp_path):
        from graphnet_tpu.datasets.prometheus_datasets import (
            PublicPrometheusDataset,
        )

        mirror = self._archive(tmp_path)

        class BundledHosted(PublicPrometheusDataset):
            _experiment = "file:// fixture"
            _mirror = f"file://{mirror}"
            _file_hashes = {"sqlite": "ABC123"}
            # the bundled DB's schema, not the public Prometheus one
            _pulsemaps = ["total"]
            _event_truth = ["total_energy", "injection_zenith"]

        ds = BundledHosted(
            graph_definition=KNNGraph(detector=Prometheus()),
            download_dir=str(tmp_path / "dl"),
            train_dataloader_kwargs={"batch_size": 8},
        )
        # extracted layout: <download_dir>/<ClassName>/<one .db>
        ddir = ds.dataset_dir
        assert os.path.isdir(ddir)
        files = os.listdir(ddir)
        assert files == ["prometheus-events.db"], files
        batch = next(iter(ds.train_dataloader()))
        assert batch.batch_size == 8
        assert np.isfinite(np.asarray(batch.x)).all()

        # second construction reuses the extracted files (no download)
        again = BundledHosted(
            graph_definition=KNNGraph(detector=Prometheus()),
            download_dir=str(tmp_path / "dl"),
            train_dataloader_kwargs={"batch_size": 8},
        )
        assert os.listdir(again.dataset_dir) == files

    def test_bad_mirror_raises_clearly(self, tmp_path):
        from graphnet_tpu.datasets.prometheus_datasets import (
            PublicPrometheusDataset,
        )

        class Broken(PublicPrometheusDataset):
            _experiment = "broken mirror"
            _mirror = f"file://{tmp_path}/void"
            _file_hashes = {"sqlite": "NOPE"}

        with pytest.raises(RuntimeError, match="could not download"):
            Broken(
                graph_definition=KNNGraph(detector=Prometheus()),
                download_dir=str(tmp_path / "dl2"),
            )
