"""Combine datasets with EnsembleDataset and inspect feature distributions
(mirror of reference ``examples/02_data/04_ensemble_dataset.py`` and
``02_plot_feature_distributions.py``).

Builds two selections of the bundled Prometheus DB as separate datasets,
concatenates them with ``EnsembleDataset``, and prints per-feature
summary statistics of the standardized node features (the quantities the
reference plots).
"""

import numpy as np

from graphnet_tpu.constants import EXAMPLE_SQLITE_DATA
from graphnet_tpu.data.constants import FEATURES, TRUTH
from graphnet_tpu.data.dataset import EnsembleDataset
from graphnet_tpu.data.sqlite_dataset import SQLiteDataset
from graphnet_tpu.models.detector.prometheus import Prometheus
from graphnet_tpu.models.graphs import KNNGraph


def make_dataset(selection):
    return SQLiteDataset(
        path=EXAMPLE_SQLITE_DATA,
        graph_definition=KNNGraph(detector=Prometheus()),
        pulsemaps="total",
        features=FEATURES.PROMETHEUS,
        truth=TRUTH.PROMETHEUS,
        truth_table="mc_truth",
        selection=selection,
    )


def main() -> None:
    even = make_dataset("event_no % 2 == 0")
    odd = make_dataset("event_no % 2 == 1")
    ensemble = EnsembleDataset([even, odd])
    print(
        f"datasets: even={len(even)} odd={len(odd)} "
        f"ensemble={len(ensemble)}"
    )
    assert len(ensemble) == len(even) + len(odd)

    # feature distributions over all nodes (standardized by the Detector)
    xs = np.concatenate(
        [ensemble[i].x for i in range(len(ensemble))], axis=0
    )
    names = ensemble[0].features
    print(f"{'feature':<16} {'mean':>8} {'std':>8} {'min':>8} {'max':>8}")
    for j, name in enumerate(names):
        col = xs[:, j]
        print(
            f"{name:<16} {col.mean():>8.3f} {col.std():>8.3f} "
            f"{col.min():>8.3f} {col.max():>8.3f}"
        )


if __name__ == "__main__":
    main()
