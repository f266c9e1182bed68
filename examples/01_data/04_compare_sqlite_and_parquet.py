"""Verify the SQLite and Parquet backends agree event-by-event (mirror of
reference ``examples/01_icetray/02_compare_sqlite_and_parquet.py``, on the
bundled Prometheus data instead of IceTray conversions)."""

import numpy as np

from graphnet_tpu.constants import (
    EXAMPLE_PARQUET_DATA,
    EXAMPLE_SQLITE_DATA,
)
from graphnet_tpu.data.constants import FEATURES, TRUTH
from graphnet_tpu.data.parquet_dataset import ParquetDataset
from graphnet_tpu.data.sqlite_dataset import SQLiteDataset
from graphnet_tpu.models.detector.prometheus import Prometheus
from graphnet_tpu.models.graphs import KNNGraph


def main() -> None:
    common = dict(
        pulsemaps="total",
        features=FEATURES.PROMETHEUS,
        truth=TRUTH.PROMETHEUS,
        truth_table="mc_truth",
    )
    sq = SQLiteDataset(
        path=EXAMPLE_SQLITE_DATA,
        graph_definition=KNNGraph(detector=Prometheus()),
        **common,
    )
    pq = ParquetDataset(
        path=EXAMPLE_PARQUET_DATA,
        graph_definition=KNNGraph(detector=Prometheus()),
        **common,
    )
    assert len(sq) == len(pq), (len(sq), len(pq))

    # parquet iterates in chunk order; align by event_no
    sq_by_no = {
        int(sq[i].labels["event_no"]): sq[i] for i in range(len(sq))
    }
    worst = 0.0
    for i in range(len(pq)):
        ev_p = pq[i]
        ev_s = sq_by_no[int(ev_p.labels["event_no"])]
        assert ev_p.n_pulses == ev_s.n_pulses
        worst = max(
            worst, float(np.abs(ev_p.x - ev_s.x).max())
        )
        np.testing.assert_allclose(
            float(ev_p.labels["total_energy"]),
            float(ev_s.labels["total_energy"]),
            rtol=1e-6,
        )
    print(
        f"{len(pq)} events agree across backends "
        f"(max node-feature deviation {worst:.2e})"
    )


if __name__ == "__main__":
    main()
