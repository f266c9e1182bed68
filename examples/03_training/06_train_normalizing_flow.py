"""Train a conditional NormalizingFlow for energy density estimation
(mirror of reference ``examples/04_training/07_train_normalizing_flow.py``).

The flow learns p(log10 E | event): DynEdge latents condition a stack of
affine∘sinh-arcsinh transforms with exact NLLH (``models/normalizing_flow``).
After training, the script evaluates the density on a grid for one event.
"""

import numpy as np

import jax
import jax.numpy as jnp

from graphnet_tpu.constants import EXAMPLE_SQLITE_DATA
from graphnet_tpu.data.constants import FEATURES, TRUTH
from graphnet_tpu.data.dataloader import DataLoader
from graphnet_tpu.data.sqlite_dataset import SQLiteDataset
from graphnet_tpu.models.detector.prometheus import Prometheus
from graphnet_tpu.models.gnn.dynedge import DynEdge
from graphnet_tpu.models.graphs import KNNGraph
from graphnet_tpu.models.normalizing_flow import NormalizingFlow
from graphnet_tpu.training.labels import Label
from graphnet_tpu.training.trainer import Trainer
from graphnet_tpu.utils.argparse import ArgumentParser


class Log10Energy(Label):
    """log10 of total_energy as the flow target."""

    def __init__(self, key: str = "log10_energy"):
        super().__init__(key=key)

    def __call__(self, event):
        return np.log10(
            np.asarray(event.labels["total_energy"], np.float64)
        ).astype(np.float32)


def main() -> None:
    parser = ArgumentParser(
        description="Train a conditional normalizing flow"
    ).with_standard_arguments(
        ("batch-size", 16), "max-epochs", "learning-rate"
    )
    parser.add_argument("--path", default=EXAMPLE_SQLITE_DATA)
    args = parser.parse_args()

    ds = SQLiteDataset(
        path=args.path,
        graph_definition=KNNGraph(detector=Prometheus()),
        pulsemaps="total",
        features=FEATURES.PROMETHEUS,
        truth=TRUTH.PROMETHEUS,
        truth_table="mc_truth",
        labels={"log10_energy": Log10Energy()},
    )
    flow = NormalizingFlow(
        backbone=DynEdge(nb_inputs=4),
        nb_targets=1,
        target_labels=("log10_energy",),
    )
    trainer = Trainer(flow, learning_rate=args.learning_rate)
    loader = DataLoader(ds, batch_size=args.batch_size, shuffle=True, seed=0)
    history = trainer.fit(loader, max_epochs=args.max_epochs)
    print("final mean NLLH:", history["train_loss"][-1])

    # density scan for the first batch's events
    batch = next(iter(DataLoader(ds, batch_size=4)))
    grid = np.linspace(-1.0, 4.0, 101, dtype=np.float32)
    logp = np.stack(
        [
            np.asarray(
                flow.log_prob(
                    trainer.state.params,
                    batch,
                    jnp.full((batch.batch_size, 1), g),
                )
            )
            for g in grid
        ]
    )
    mode = grid[np.argmax(logp[:, 0])]
    truth = float(np.log10(np.asarray(batch.unpacked().labels["total_energy"])[0]))
    print(f"event 0: density mode at log10(E)={mode:.2f}, truth {truth:.2f}")


if __name__ == "__main__":
    main()
