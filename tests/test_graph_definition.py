"""GraphDefinition behavioural tests (mirror of reference
``tests/models/test_graph_definition.py`` strategy): seeded perturbation
determinism, sensor/string masking, inactive-sensor padding, sorting."""

import os

import numpy as np
import pytest

from graphnet_tpu.constants import EXAMPLE_SQLITE_DATA
from graphnet_tpu.data.constants import FEATURES, TRUTH
from graphnet_tpu.data.sqlite_dataset import SQLiteDataset
from graphnet_tpu.models.detector.prometheus import Prometheus
from graphnet_tpu.models.graphs import KNNGraph

pytestmark = pytest.mark.skipif(
    not os.path.exists(EXAMPLE_SQLITE_DATA),
    reason="example data not present",
)


def raw_event(n=12, seed=0):
    """Raw (unstandardized) pulses located on real ORCA150 sensors."""
    det = Prometheus()
    g = det.geometry_table
    rng = np.random.default_rng(seed)
    rows = g.sample(n, random_state=1)
    x = np.stack(
        [
            rows["sensor_pos_x"].to_numpy(),
            rows["sensor_pos_y"].to_numpy(),
            rows["sensor_pos_z"].to_numpy(),
            rng.random(n) * 1000,
        ],
        axis=1,
    )
    return x


FEAT = FEATURES.PROMETHEUS


class TestPerturbation:
    def test_seeded_determinism(self):
        x = raw_event()
        g1 = KNNGraph(
            detector=Prometheus(),
            perturbation_dict={"t": 10.0},
            seed=42,
        )
        g2 = KNNGraph(
            detector=Prometheus(),
            perturbation_dict={"t": 10.0},
            seed=42,
        )
        e1 = g1(x, FEAT)
        e2 = g2(x, FEAT)
        np.testing.assert_array_equal(e1.x, e2.x)
        # perturbation changed t but not positions
        e_nop = KNNGraph(detector=Prometheus())(x, FEAT)
        np.testing.assert_array_equal(e1.x[:, :3], e_nop.x[:, :3])
        assert not np.allclose(e1.x[:, 3], e_nop.x[:, 3])

    def test_different_seeds_differ(self):
        x = raw_event()
        e1 = KNNGraph(
            detector=Prometheus(),
            perturbation_dict={"t": 10.0},
            seed=1,
        )(x, FEAT)
        e2 = KNNGraph(
            detector=Prometheus(),
            perturbation_dict={"t": 10.0},
            seed=2,
        )(x, FEAT)
        assert not np.allclose(e1.x[:, 3], e2.x[:, 3])


class TestMasks:
    def test_string_mask_drops_pulses(self):
        det = Prometheus()
        g = det.geometry_table
        x = raw_event(20, seed=3)
        # find the string of the first pulse and mask it
        first = g.loc[[tuple(x[0, :3])]]
        string_id = int(first["sensor_string_id"].iloc[0])
        gd = KNNGraph(detector=Prometheus(), string_mask=[string_id])
        ev = gd(x, FEAT)
        assert ev.x.shape[0] < 20
        gd_all = KNNGraph(detector=Prometheus())
        assert gd_all(x, FEAT).x.shape[0] == 20

    def test_inactive_sensor_padding(self):
        det = Prometheus()
        n_total = len(det.geometry_table)
        x = raw_event(10, seed=4)
        gd = KNNGraph(
            detector=Prometheus(), add_inactive_sensors=True
        )
        ev = gd(x, FEAT)
        # all sensors present: active pulses + inactive sensors
        assert ev.x.shape[0] == n_total
        assert ev.labels["n_pulses"] == n_total


class TestSorting:
    def test_sort_by_time(self):
        x = raw_event(15, seed=5)
        gd = KNNGraph(detector=Prometheus(), sort_by="t")
        ev = gd(x, FEAT)
        t = ev.x[:, 3]
        assert (np.diff(t) >= 0).all()


class TestMultiDatabase:
    def test_two_databases(self):
        gd = KNNGraph(detector=Prometheus())
        base = SQLiteDataset(
            path=EXAMPLE_SQLITE_DATA,
            graph_definition=gd,
            pulsemaps="total",
            features=FEAT,
            truth=TRUTH.PROMETHEUS,
            truth_table="mc_truth",
        )
        event_nos = base._indices
        # selection entries are (event_no, db_index) pairs
        selection = [(int(e), 0) for e in event_nos[:5]] + [
            (int(e), 1) for e in event_nos[5:10]
        ]
        ds = SQLiteDataset(
            path=[EXAMPLE_SQLITE_DATA, EXAMPLE_SQLITE_DATA],
            graph_definition=gd,
            pulsemaps="total",
            features=FEAT,
            truth=TRUTH.PROMETHEUS,
            truth_table="mc_truth",
            selection=selection,
        )
        assert len(ds) == 10
        np.testing.assert_array_equal(ds[0].x, base[0].x)
        np.testing.assert_array_equal(ds[5].x, base[5].x)
