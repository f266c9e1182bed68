"""Train DynEdgeTITO for direction reconstruction with a vMF 3D loss
(mirror of reference ``examples/04_training/02_train_tito_model.py``)."""

from graphnet_tpu.constants import EXAMPLE_SQLITE_DATA
from graphnet_tpu.data.constants import FEATURES, TRUTH
from graphnet_tpu.data.dataloader import DataLoader
from graphnet_tpu.data.sqlite_dataset import SQLiteDataset
from graphnet_tpu.models.detector.prometheus import Prometheus
from graphnet_tpu.models.gnn.dynedge_kaggle_tito import DynEdgeTITO
from graphnet_tpu.models.graphs import KNNGraph
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
        ("batch-size", 16), "max-epochs", "learning-rate"
    )
    parser.add_argument("--path", default=EXAMPLE_SQLITE_DATA)
    args = parser.parse_args()

    dataset = SQLiteDataset(
        path=args.path,
        graph_definition=KNNGraph(detector=Prometheus()),
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
        backbone=DynEdgeTITO(nb_inputs=4),
        tasks=(
            DirectionReconstructionWithKappa(
                loss_function=VonMisesFisher3DLoss(),
                target_labels=("direction",),
            ),
        ),
    )
    trainer = Trainer(model, learning_rate=args.learning_rate)
    trainer.fit(loader, max_epochs=args.max_epochs)
    df = trainer.predict_as_dataframe(loader)
    print(df.head())


if __name__ == "__main__":
    main()
