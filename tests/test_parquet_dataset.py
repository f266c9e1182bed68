"""ParquetDataset tests incl. cross-backend consistency with SQLiteDataset
(the reference's ordered convert→read→compare integration pattern,
SURVEY.md §4)."""

import os

import numpy as np
import pytest

from graphnet_tpu.constants import EXAMPLE_PARQUET_DATA, EXAMPLE_SQLITE_DATA
from graphnet_tpu.data.constants import FEATURES, TRUTH
from graphnet_tpu.data.parquet_dataset import ParquetDataset
from graphnet_tpu.data.samplers import RandomChunkSampler
from graphnet_tpu.data.sqlite_dataset import SQLiteDataset
from graphnet_tpu.models.detector.prometheus import Prometheus
from graphnet_tpu.models.graphs import KNNGraph

pytestmark = pytest.mark.skipif(
    not os.path.isdir(EXAMPLE_PARQUET_DATA),
    reason="example parquet data not present",
)


def parquet_ds(**kwargs):
    return ParquetDataset(
        path=EXAMPLE_PARQUET_DATA,
        graph_definition=KNNGraph(detector=Prometheus()),
        pulsemaps="total",
        features=FEATURES.PROMETHEUS,
        truth=TRUTH.PROMETHEUS,
        truth_table="mc_truth",
        **kwargs,
    )


def test_len_and_chunks():
    ds = parquet_ds()
    assert len(ds) == 50
    assert ds.chunk_sizes == [5] * 10


def test_chunk_selection():
    ds = parquet_ds(selection=[0, 3])
    assert len(ds) == 10


def test_cache_eviction():
    ds = parquet_ds(cache_size=1)
    _ = ds[0]
    _ = ds[49]
    for cache in ds._file_cache.values():
        assert len(cache) <= 1


def test_matches_sqlite_backend():
    pq = parquet_ds()
    sq = SQLiteDataset(
        path=EXAMPLE_SQLITE_DATA,
        graph_definition=KNNGraph(detector=Prometheus()),
        pulsemaps="total",
        features=FEATURES.PROMETHEUS,
        truth=TRUTH.PROMETHEUS,
        truth_table="mc_truth",
    )
    # align by event_no
    sq_by_no = {
        int(sq[i].labels["event_no"]): sq[i] for i in range(len(sq))
    }
    for i in range(0, 50, 7):
        ev_pq = pq[i]
        no = int(ev_pq.labels["event_no"])
        ev_sq = sq_by_no[no]
        assert ev_pq.x.shape == ev_sq.x.shape
        # same pulse content (row order may differ) and same truth
        np.testing.assert_allclose(
            np.sort(ev_pq.x, axis=0),
            np.sort(ev_sq.x, axis=0),
            rtol=1e-5,
            atol=1e-6,
        )
        np.testing.assert_allclose(
            ev_pq.labels["injection_energy"],
            ev_sq.labels["injection_energy"],
            rtol=1e-6,
        )


def test_event_lengths():
    ds = parquet_ds()
    lengths = ds.event_lengths()
    assert len(lengths) == 50
    for i in [0, 13, 42]:
        assert lengths[i] == ds[i].n_pulses


def test_random_chunk_sampler():
    ds = parquet_ds()
    sampler = RandomChunkSampler(ds.chunk_sizes, seed=0)
    order = list(sampler)
    assert sorted(order) == list(range(50))
    # indices within each contiguous window of 5 come from one chunk
    for w in range(10):
        window = order[w * 5 : (w + 1) * 5]
        assert max(window) - min(window) == 4
