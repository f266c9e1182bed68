"""End-to-end data pipeline tests on the bundled Prometheus SQLite DB
(50 events), mirroring the reference's integration-test strategy of using
real miniature data (SURVEY.md §4)."""

import os

import numpy as np
import pytest

from graphnet_tpu.constants import EXAMPLE_SQLITE_DATA
from graphnet_tpu.data.constants import FEATURES, TRUTH
from graphnet_tpu.data.dataloader import DataLoader, collate_events
from graphnet_tpu.data.dataset import EnsembleDataset
from graphnet_tpu.data.sqlite_dataset import SQLiteDataset
from graphnet_tpu.models.detector.prometheus import Prometheus
from graphnet_tpu.models.graphs import KNNGraph
from graphnet_tpu.models.graphs.nodes import PercentileClusters
from graphnet_tpu.training.labels import Direction, Track

pytestmark = pytest.mark.skipif(
    not os.path.exists(EXAMPLE_SQLITE_DATA),
    reason="example data not present",
)


def make_dataset(**kwargs):
    graph_definition = KNNGraph(detector=Prometheus())
    return SQLiteDataset(
        path=EXAMPLE_SQLITE_DATA,
        graph_definition=graph_definition,
        pulsemaps="total",
        features=FEATURES.PROMETHEUS,
        truth=TRUTH.PROMETHEUS,
        truth_table="mc_truth",
        **kwargs,
    )


class TestSQLiteDataset:
    def test_len_and_getitem(self):
        ds = make_dataset()
        assert len(ds) == 50
        ev = ds[0]
        assert ev.x.ndim == 2 and ev.x.shape[1] == 4
        assert ev.x.dtype == np.float32
        assert "injection_energy" in ev.labels
        assert "injection_zenith" in ev.labels
        assert ev.labels["n_pulses"] == ev.x.shape[0]

    def test_standardization_applied(self):
        ds = make_dataset()
        ev = ds[0]
        # Prometheus/ORCA150SuperDense scalings put coords at O(1)
        assert np.abs(ev.x[:, :3]).max() < 20.0
        assert np.abs(ev.x[:, 3]).max() < 10.0

    def test_selection(self):
        ds_all = make_dataset()
        sel = ds_all._indices[:10]
        ds = make_dataset(selection=sel)
        assert len(ds) == 10
        np.testing.assert_array_equal(ds[0].x, ds_all[0].x)

    def test_event_lengths_match(self):
        ds = make_dataset()
        lengths = ds.event_lengths()
        assert len(lengths) == 50
        for i in [0, 7, 23]:
            assert lengths[i] == ds[i].n_pulses

    def test_custom_labels(self):
        ds = make_dataset(
            labels={
                "direction": Direction(
                    azimuth_key="injection_azimuth",
                    zenith_key="injection_zenith",
                )
            }
        )
        ev = ds[0]
        d = np.asarray(ev.labels["direction"])
        assert d.shape == (3,)
        np.testing.assert_allclose(np.linalg.norm(d), 1.0, rtol=1e-5)

    def test_ensemble(self):
        ds1, ds2 = make_dataset(), make_dataset()
        ens = EnsembleDataset([ds1, ds2])
        assert len(ens) == 100
        np.testing.assert_array_equal(ens[50].x, ds2[0].x)


class TestDataLoader:
    def test_batches(self):
        ds = make_dataset()
        dl = DataLoader(ds, batch_size=16, shuffle=True, seed=0)
        batches = list(dl)
        total = sum(b.batch_size for b in batches)
        assert total <= 50  # some events may be dropped (<2 pulses)
        assert total >= 40
        for b in batches:
            # default buckets are auto-derived for this dataset (r5)
            assert b.x.shape[1] in dl.buckets
            assert b.x.shape[0] <= 16
            # mask consistent with n_pulses
            np.testing.assert_array_equal(
                np.asarray(b.mask).sum(axis=1), np.asarray(b.n_pulses)
            )

    def test_default_buckets_auto(self):
        """The DataLoader DEFAULT is auto:2 DP-optimal buckets (r5):
        at most two compiled shapes (each new shape costs minutes of
        tunnel compile), 16-aligned, covering the longest event, and
        padding-optimal among ALL <=2-bucket choices — in particular
        never worse than any 2-element slice of the power-of-two
        ladder or a single max-length pad."""
        from graphnet_tpu.batch import DEFAULT_BUCKETS
        from graphnet_tpu.data.bucketing import padding_efficiency

        ds = make_dataset()
        dl = DataLoader(ds, batch_size=16)
        lengths = np.asarray(ds.event_lengths())
        assert 1 <= len(dl.buckets) <= 2
        assert all(b % 16 == 0 for b in dl.buckets)
        assert max(dl.buckets) >= lengths.max()
        eff_auto = padding_efficiency(lengths, dl.buckets)
        covering = [b for b in DEFAULT_BUCKETS if b >= lengths.max()]
        rivals = [(covering[0],)] + [
            (lo, covering[0])
            for lo in DEFAULT_BUCKETS
            if lo < covering[0]
        ]
        for rival in rivals:
            assert eff_auto >= padding_efficiency(lengths, rival), rival
        # explicit opt-out restores the fixed ladder
        dl_fixed = DataLoader(ds, batch_size=16, buckets=DEFAULT_BUCKETS)
        assert dl_fixed.buckets == tuple(DEFAULT_BUCKETS)

    def test_min_pulse_drop(self):
        ds = make_dataset()
        dl = DataLoader(ds, batch_size=50, min_pulses=2, shuffle=False)
        n = sum(b.batch_size for b in dl)
        lengths = np.asarray(ds.event_lengths())
        assert n == int((lengths >= 2).sum())

    def test_labels_batched(self):
        ds = make_dataset(
            labels={
                "direction": Direction(
                    azimuth_key="injection_azimuth",
                    zenith_key="injection_zenith",
                )
            }
        )
        dl = DataLoader(ds, batch_size=8, shuffle=False)
        b = next(iter(dl))
        b = b.unpacked()
        assert b.labels["direction"].shape == (b.batch_size, 3)
        assert b.labels["injection_energy"].shape == (b.batch_size,)


class TestPercentileClusters:
    def test_percentile_nodes(self):
        graph_definition = KNNGraph(
            detector=Prometheus(),
            node_definition=PercentileClusters(
                cluster_on=["sensor_pos_x", "sensor_pos_y", "sensor_pos_z"],
                percentiles=[10, 50, 90],
            ),
        )
        ds = SQLiteDataset(
            path=EXAMPLE_SQLITE_DATA,
            graph_definition=graph_definition,
            pulsemaps="total",
            features=FEATURES.PROMETHEUS,
            truth=TRUTH.PROMETHEUS,
            truth_table="mc_truth",
        )
        ev = ds[1]
        # columns: xyz + 3 percentiles of t + counts
        assert ev.x.shape[1] == 3 + 3 + 1
        # unique cluster keys
        assert len(np.unique(ev.x[:, :3], axis=0)) == ev.x.shape[0]


class TestBatchedFetch:
    """SQLiteDataset.get_events (one query per table per batch) must
    reproduce per-event __getitem__ exactly."""

    def test_get_events_matches_getitem(self):
        import numpy as np
        from graphnet_tpu.constants import EXAMPLE_SQLITE_DATA
        from graphnet_tpu.data.constants import FEATURES, TRUTH
        from graphnet_tpu.data.sqlite_dataset import SQLiteDataset
        from graphnet_tpu.models.detector.prometheus import Prometheus
        from graphnet_tpu.models.graphs import KNNGraph

        ds = SQLiteDataset(
            path=EXAMPLE_SQLITE_DATA,
            graph_definition=KNNGraph(detector=Prometheus()),
            pulsemaps="total",
            features=FEATURES.PROMETHEUS,
            truth=TRUTH.PROMETHEUS,
            truth_table="mc_truth",
        )
        idxs = [0, 7, 3, 49, 7]  # unordered, with a duplicate
        batched = ds.get_events(idxs)
        assert len(batched) == len(idxs)
        for i, ev in zip(idxs, batched):
            ref = ds[i]
            np.testing.assert_allclose(ev.x, ref.x)
            assert set(ev.labels) == set(ref.labels)
            for k in ref.labels:
                if k == "dataset_path":
                    continue
                np.testing.assert_allclose(
                    np.asarray(ev.labels[k], float),
                    np.asarray(ref.labels[k], float),
                )


class TestMultiDatabase:
    """SQLiteDataset over multiple database files: selections are
    (event_no, db_index) pairs (reference ``sqlite_dataset.py:110-130``)."""

    def _dual(self, tmp_path):
        import shutil
        from graphnet_tpu.constants import EXAMPLE_SQLITE_DATA
        from graphnet_tpu.data.constants import FEATURES, TRUTH
        from graphnet_tpu.data.sqlite_dataset import SQLiteDataset
        from graphnet_tpu.models.detector.prometheus import Prometheus
        from graphnet_tpu.models.graphs import KNNGraph

        db0 = str(tmp_path / "a.db")
        db1 = str(tmp_path / "b.db")
        shutil.copy(EXAMPLE_SQLITE_DATA, db0)
        shutil.copy(EXAMPLE_SQLITE_DATA, db1)
        single = SQLiteDataset(
            path=EXAMPLE_SQLITE_DATA,
            graph_definition=KNNGraph(detector=Prometheus()),
            pulsemaps="total",
            features=FEATURES.PROMETHEUS,
            truth=TRUTH.PROMETHEUS,
            truth_table="mc_truth",
        )
        event_nos = [int(single._indices[i]) for i in range(4)]
        selection = [[e, 0] for e in event_nos[:2]] + [
            [e, 1] for e in event_nos[2:]
        ]
        multi = SQLiteDataset(
            path=[db0, db1],
            graph_definition=KNNGraph(detector=Prometheus()),
            pulsemaps="total",
            features=FEATURES.PROMETHEUS,
            truth=TRUTH.PROMETHEUS,
            truth_table="mc_truth",
            selection=selection,
        )
        return single, multi, event_nos

    def test_events_match_single_db(self, tmp_path):
        import numpy as np

        single, multi, event_nos = self._dual(tmp_path)
        assert len(multi) == 4
        for i in range(4):
            ev_m = multi[i]
            ev_s = single[i]  # same event numbers, same content
            np.testing.assert_allclose(ev_m.x, ev_s.x)
            np.testing.assert_allclose(
                float(ev_m.labels["total_energy"]),
                float(ev_s.labels["total_energy"]),
            )

    def test_event_lengths_and_loader(self, tmp_path):
        import numpy as np
        from graphnet_tpu.data.dataloader import DataLoader

        single, multi, _ = self._dual(tmp_path)
        lengths = multi.event_lengths()
        assert lengths == [single[i].n_pulses for i in range(4)]
        batches = list(DataLoader(multi, batch_size=4))
        assert sum(b.batch_size for b in batches) == 4
        assert np.isfinite(np.asarray(batches[0].x)).all()
