"""Read events from the bundled SQLite and Parquet example datasets
(mirror of reference ``examples/02_data/01_read_dataset.py``)."""

from graphnet_tpu.constants import (
    EXAMPLE_PARQUET_DATA,
    EXAMPLE_SQLITE_DATA,
)
from graphnet_tpu.data.constants import FEATURES, TRUTH
from graphnet_tpu.data.dataloader import DataLoader
from graphnet_tpu.data.parquet_dataset import ParquetDataset
from graphnet_tpu.data.sqlite_dataset import SQLiteDataset
from graphnet_tpu.models.detector.prometheus import Prometheus
from graphnet_tpu.models.graphs import KNNGraph


def main() -> None:
    common = dict(
        graph_definition=KNNGraph(detector=Prometheus()),
        pulsemaps="total",
        features=FEATURES.PROMETHEUS,
        truth=TRUTH.PROMETHEUS,
        truth_table="mc_truth",
    )
    for name, ds in [
        ("sqlite", SQLiteDataset(path=EXAMPLE_SQLITE_DATA, **common)),
        (
            "parquet",
            ParquetDataset(path=EXAMPLE_PARQUET_DATA, **common),
        ),
    ]:
        print(f"[{name}] {len(ds)} events")
        ev = ds[0]
        print(f"  event 0: {ev.n_pulses} pulses, features {ev.features}")
        loader = DataLoader(ds, batch_size=16, shuffle=False)
        batch = next(iter(loader))
        print(
            f"  first batch: x{tuple(batch.x.shape)} "
            f"mask{tuple(batch.mask.shape)} "
            f"labels={sorted(batch.unpacked().labels)[:4]}..."
        )


if __name__ == "__main__":
    main()
