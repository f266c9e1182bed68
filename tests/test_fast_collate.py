"""Vectorised input path (DataLoader._try_fast / collate_from_arrays):
batch-for-batch equivalence with the per-event Event route, fallback
behaviour, and custom-label support."""

import numpy as np
import pytest

from graphnet_tpu.data.constants import FEATURES, TRUTH
from graphnet_tpu.data.dataloader import DataLoader
from graphnet_tpu.data.sqlite_dataset import SQLiteDataset
from graphnet_tpu.datasets.synthetic import generate_prometheus_db
from graphnet_tpu.models.detector.prometheus import Prometheus
from graphnet_tpu.models.graphs import KNNGraph
from graphnet_tpu.models.graphs.nodes import PercentileClusters
from graphnet_tpu.training.labels import Direction


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    return generate_prometheus_db(
        str(tmp_path_factory.mktemp("fastcollate") / "synth.db"),
        n_events=48,
        seed=1,
    )


def _dataset(db, **kwargs):
    return SQLiteDataset(
        path=db,
        graph_definition=kwargs.pop(
            "graph_definition", KNNGraph(detector=Prometheus())
        ),
        pulsemaps="total",
        features=FEATURES.PROMETHEUS,
        truth=TRUTH.PROMETHEUS,
        truth_table="mc_truth",
        **kwargs,
    )


def _batches(loader):
    return list(loader)


def _assert_batches_equal(fast, slow):
    assert len(fast) == len(slow)
    for bf, bs in zip(fast, slow):
        np.testing.assert_array_equal(np.asarray(bf.x), np.asarray(bs.x))
        np.testing.assert_array_equal(
            np.asarray(bf.mask), np.asarray(bs.mask)
        )
        np.testing.assert_array_equal(
            np.asarray(bf.n_pulses), np.asarray(bs.n_pulses)
        )
        bf, bs = bf.unpacked(), bs.unpacked()
        assert set(bf.labels) == set(bs.labels)
        for k in bs.labels:
            a, b = np.asarray(bf.labels[k]), np.asarray(bs.labels[k])
            assert a.dtype == b.dtype, k
            np.testing.assert_array_equal(a, b, err_msg=k)


def test_fast_path_matches_event_path(db):
    ds = _dataset(db)
    ds.add_label(
        Direction(
            azimuth_key="injection_azimuth", zenith_key="injection_zenith"
        )
    )
    mk = lambda: DataLoader(  # noqa: E731
        ds, batch_size=16, shuffle=False, buckets=(128,)
    )
    fast_loader = mk()
    fast = _batches(fast_loader)
    assert fast_loader._fast_ok is True

    slow_loader = mk()
    slow_loader._fast_ok = False  # force the per-event Event route
    slow = _batches(slow_loader)
    _assert_batches_equal(fast, slow)
    assert (
        fast_loader.padding_efficiency == slow_loader.padding_efficiency
    )


def test_unsupported_label_falls_back(db):
    ds = _dataset(db)
    ds.add_label(lambda event: np.float32(1.0), key="const")
    loader = DataLoader(ds, batch_size=16, shuffle=False, buckets=(128,))
    batches = _batches(loader)
    assert loader._fast_ok is False  # plain callable has no .batched
    assert sum(b.batch_size for b in batches) == 48
    assert all(
        float(np.asarray(b.unpacked().labels["const"]).min()) == 1.0 for b in batches
    )


def test_unsupported_nodes_falls_back(db):
    gd = KNNGraph(
        detector=Prometheus(),
        node_definition=PercentileClusters(
            cluster_on=["sensor_pos_x", "sensor_pos_y", "sensor_pos_z"],
            percentiles=[10, 50, 90],
            input_feature_names=FEATURES.PROMETHEUS,
        ),
    )
    ds = _dataset(db, graph_definition=gd)
    loader = DataLoader(ds, batch_size=16, shuffle=False, buckets=(128,))
    batches = _batches(loader)
    assert loader._fast_ok is False
    assert sum(b.batch_size for b in batches) > 0
