"""Production input pipeline: fit the bucket set to the dataset, pack
the padded batches to disk ONCE, then train every run from memmap
replay.

The reference's torch DataLoader re-runs SQL + per-event graph building
every epoch of every run (``data/dataloader.py:26-51``); here the host
pipeline is an offline step (like DataConverter) and training epochs
stream packed batches through one ``device_put`` each.
"""

import os
import shutil
import tempfile

import numpy as np

from graphnet_tpu.constants import EXAMPLE_SQLITE_DATA
from graphnet_tpu.data.bucketing import optimize_buckets, padding_efficiency
from graphnet_tpu.data.constants import FEATURES, TRUTH
from graphnet_tpu.data.dataloader import DataLoader
from graphnet_tpu.data.materialized import MaterializedLoader, materialize
from graphnet_tpu.data.sqlite_dataset import SQLiteDataset
from graphnet_tpu.models.detector.prometheus import Prometheus
from graphnet_tpu.models.graphs import KNNGraph


def main() -> None:
    ds = SQLiteDataset(
        path=EXAMPLE_SQLITE_DATA,
        graph_definition=KNNGraph(detector=Prometheus()),
        pulsemaps="total",
        features=FEATURES.PROMETHEUS,
        truth=TRUTH.PROMETHEUS,
        truth_table="mc_truth",
    )

    # 1. fit the bucket set to THIS dataset (padding waste vs compile
    #    count — each bucket is one compiled shape)
    lengths = ds.event_lengths()
    buckets = optimize_buckets(lengths, n_buckets=3)
    print(
        f"optimized buckets: {buckets} "
        f"(padding efficiency {padding_efficiency(lengths, buckets):.2f})"
    )

    # 2. pack the padded batches once (offline ETL step)
    store = os.path.join(tempfile.mkdtemp(), "store")
    loader = DataLoader(ds, batch_size=16, shuffle=True, seed=0,
                        buckets=buckets)
    meta = materialize(loader, store)
    print(
        f"packed {meta['n_batches']} batches "
        f"({len(meta['groups'])} shapes) to {store}"
    )

    # 3. every training run replays from disk — no SQL, no graph build
    replay = MaterializedLoader(store, shuffle=True, seed=1)
    import jax.numpy as jnp

    from graphnet_tpu.models.gnn.dynedge import DynEdge
    from graphnet_tpu.models.standard_model import StandardModel
    from graphnet_tpu.models.task.reconstruction import EnergyReconstruction
    from graphnet_tpu.training.loss_functions import LogCoshLoss
    from graphnet_tpu.training.trainer import Trainer

    model = StandardModel(
        backbone=DynEdge(nb_inputs=4, dynedge_layer_sizes=((16, 16),)),
        tasks=(
            EnergyReconstruction(
                loss_function=LogCoshLoss(),
                target_labels=("total_energy",),
                transform_prediction_and_target=lambda x: jnp.log10(x),
            ),
        ),
    )
    history = Trainer(model).fit(replay, max_epochs=2)
    print("train_loss per epoch:", np.round(history["train_loss"], 4))
    shutil.rmtree(os.path.dirname(store), ignore_errors=True)


if __name__ == "__main__":
    main()
