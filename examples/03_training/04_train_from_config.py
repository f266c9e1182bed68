"""Train a model defined entirely by config files — no model code in the
script (mirror of reference
``examples/04_training/03_train_dynedge_from_config.py``).

The dataset config names train/validation selections (one YAML → many
datasets); the model config rebuilds the full StandardModel tree. Neither
file ever contains executable code (transforms come from the registry).
"""

import os

from graphnet_tpu.constants import GRAPHNET_ROOT_DIR
from graphnet_tpu.data.dataloader import DataLoader
from graphnet_tpu.training.trainer import Trainer
from graphnet_tpu.utils.argparse import ArgumentParser
from graphnet_tpu.utils.config import load_dataset, load_model

CONFIG_DIR = os.path.join(GRAPHNET_ROOT_DIR, "configs")


def main() -> None:
    parser = ArgumentParser(
        description="Train from dataset + model configs"
    ).with_standard_arguments(
        ("batch-size", 16),
        "max-epochs",
        "early-stopping-patience",
        "learning-rate",
    )
    parser.add_argument(
        "--dataset-config",
        default=os.path.join(
            CONFIG_DIR, "datasets", "training_example_data_sqlite.yml"
        ),
    )
    parser.add_argument(
        "--model-config",
        default=os.path.join(
            CONFIG_DIR, "models", "dynedge_energy_prometheus.yml"
        ),
    )
    parser.add_argument("--output", default="/tmp/dynedge_from_config")
    args = parser.parse_args()

    datasets = load_dataset(args.dataset_config)
    model = load_model(args.model_config)

    train_loader = DataLoader(
        datasets["train"], batch_size=args.batch_size, shuffle=True, seed=0
    )
    val_loader = DataLoader(
        datasets["validation"], batch_size=args.batch_size
    )

    trainer = Trainer(
        model, learning_rate=args.learning_rate, checkpoint_dir=args.output
    )
    trainer.fit(
        train_loader,
        val_loader,
        max_epochs=args.max_epochs,
        early_stopping_patience=args.early_stopping_patience,
    )
    df = trainer.predict_as_dataframe(
        val_loader, additional_attributes=["total_energy"]
    )
    print(df.head())


if __name__ == "__main__":
    main()
