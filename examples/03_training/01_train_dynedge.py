"""Train DynEdge on energy regression — the canonical minimum example
(mirror of reference ``examples/04_training/01_train_dynedge.py``).

Runs on the bundled 50-event Prometheus SQLite database by default.
"""

from graphnet_tpu.constants import EXAMPLE_SQLITE_DATA
from graphnet_tpu.data.constants import FEATURES, TRUTH
from graphnet_tpu.data.datamodule import GraphNeTDataModule
from graphnet_tpu.data.sqlite_dataset import SQLiteDataset
from graphnet_tpu.models.detector.prometheus import Prometheus
from graphnet_tpu.models.gnn.dynedge import DynEdge
from graphnet_tpu.models.graphs import KNNGraph
from graphnet_tpu.models.standard_model import StandardModel
from graphnet_tpu.models.task.reconstruction import EnergyReconstruction
from graphnet_tpu.training.loss_functions import LogCoshLoss
from graphnet_tpu.training.trainer import Trainer
from graphnet_tpu.utils.argparse import ArgumentParser
from graphnet_tpu.utils.config import TRANSFORM_REGISTRY, save_model_config


def main() -> None:
    parser = ArgumentParser(
        description="Train DynEdge energy regression"
    ).with_standard_arguments(
        ("batch-size", 16),
        "max-epochs",
        "early-stopping-patience",
        "learning-rate",
    )
    parser.add_argument("--path", default=EXAMPLE_SQLITE_DATA)
    parser.add_argument("--pulsemap", default="total")
    parser.add_argument("--target", default="total_energy")
    parser.add_argument("--truth-table", default="mc_truth")
    parser.add_argument("--output", default="/tmp/dynedge_energy")
    args = parser.parse_args()

    datamodule = GraphNeTDataModule(
        dataset_reference=SQLiteDataset,
        dataset_args=dict(
            path=args.path,
            graph_definition=KNNGraph(detector=Prometheus()),
            pulsemaps=args.pulsemap,
            features=FEATURES.PROMETHEUS,
            truth=TRUTH.PROMETHEUS,
            truth_table=args.truth_table,
        ),
        train_dataloader_kwargs={"batch_size": args.batch_size},
        validation_dataloader_kwargs={"batch_size": args.batch_size},
    )

    model = StandardModel(
        backbone=DynEdge(
            nb_inputs=4,
            global_pooling_schemes=("min", "max", "mean", "sum"),
        ),
        tasks=(
            EnergyReconstruction(
                loss_function=LogCoshLoss(),
                target_labels=(args.target,),
                transform_prediction_and_target=TRANSFORM_REGISTRY[
                    "log10"
                ],
            ),
        ),
    )

    trainer = Trainer(
        model,
        learning_rate=args.learning_rate,
        checkpoint_dir=args.output,
    )
    trainer.fit(
        datamodule.train_dataloader(),
        datamodule.val_dataloader(),
        max_epochs=args.max_epochs,
        early_stopping_patience=args.early_stopping_patience,
    )
    df = trainer.predict_as_dataframe(
        datamodule.val_dataloader(),
        additional_attributes=[args.target],
    )
    print(df.head())

    import os

    os.makedirs(args.output, exist_ok=True)
    save_model_config(model, os.path.join(args.output, "model.yml"))
    trainer.save_state_dict(os.path.join(args.output, "state_dict.pkl"))
    print(f"Saved model config + weights to {args.output}")


if __name__ == "__main__":
    main()
