"""Train DeepIce (IceMix) for direction reconstruction
(mirror of reference ``examples/04_training/06_train_icemix_model.py``).

DeepIce expects kaggle-style features (x, y, z, time, charge, auxiliary);
on the bundled 4-feature Prometheus data we run with ``n_features=4``
(position + time), which exercises the same transformer stack.
"""

from graphnet_tpu.constants import EXAMPLE_SQLITE_DATA
from graphnet_tpu.data.constants import FEATURES, TRUTH
from graphnet_tpu.data.dataloader import DataLoader
from graphnet_tpu.data.sqlite_dataset import SQLiteDataset
from graphnet_tpu.models.detector.prometheus import Prometheus
from graphnet_tpu.models.gnn.icemix import DeepIce
from graphnet_tpu.models.graphs import EdgelessGraph
from graphnet_tpu.models.standard_model import StandardModel
from graphnet_tpu.models.task.reconstruction import (
    DirectionReconstructionWithKappa,
)
from graphnet_tpu.training.labels import Direction
from graphnet_tpu.training.loss_functions import VonMisesFisher3DLoss
from graphnet_tpu.training.trainer import Trainer
from graphnet_tpu.utils.argparse import ArgumentParser


def main() -> None:
    parser = ArgumentParser().with_standard_arguments(
        ("batch-size", 8), "max-epochs", "learning-rate"
    )
    parser.add_argument("--path", default=EXAMPLE_SQLITE_DATA)
    args = parser.parse_args()

    dataset = SQLiteDataset(
        path=args.path,
        graph_definition=EdgelessGraph(detector=Prometheus()),
        pulsemaps="total",
        features=FEATURES.PROMETHEUS,
        truth=TRUTH.PROMETHEUS,
        truth_table="mc_truth",
        labels={
            "direction": Direction(
                azimuth_key="injection_azimuth",
                zenith_key="injection_zenith",
            )
        },
    )
    loader = DataLoader(
        dataset, batch_size=args.batch_size, shuffle=True, seed=0
    )
    model = StandardModel(
        backbone=DeepIce(
            hidden_dim=96,
            seq_length=64,
            depth=3,
            depth_rel=2,
            head_size=16,
            n_features=4,
        ),
        tasks=(
            DirectionReconstructionWithKappa(
                loss_function=VonMisesFisher3DLoss(),
                target_labels=("direction",),
            ),
        ),
    )
    trainer = Trainer(model, learning_rate=args.learning_rate)
    trainer.fit(loader, max_epochs=args.max_epochs)
    print(trainer.predict_as_dataframe(loader).head())


if __name__ == "__main__":
    main()
