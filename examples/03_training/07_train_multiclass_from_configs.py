"""Multi-class flavour classification, fully config-driven (mirror of
reference ``examples/04_training/04_train_multiclassifier_from_configs.py``):
DatasetConfig + ModelConfig + TrainingConfig, no model code in the script.
"""

import os

from graphnet_tpu.constants import GRAPHNET_ROOT_DIR
from graphnet_tpu.data.dataloader import DataLoader
from graphnet_tpu.training.trainer import Trainer
from graphnet_tpu.utils.argparse import ArgumentParser
from graphnet_tpu.utils.config import (
    TrainingConfig,
    load_dataset,
    load_model,
)

CONFIG_DIR = os.path.join(GRAPHNET_ROOT_DIR, "configs")


def main() -> None:
    parser = ArgumentParser(
        description="Config-driven multiclass training"
    ).with_standard_arguments(
        ("batch-size", 16), "max-epochs", "early-stopping-patience",
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
            CONFIG_DIR, "models", "dynedge_pid_classification.yml"
        ),
    )
    args = parser.parse_args()

    model = load_model(args.model_config)
    config = TrainingConfig(
        target=list(model.target_labels),
        early_stopping_patience=args.early_stopping_patience,
        fit={"max_epochs": args.max_epochs},
        dataloader={"batch_size": args.batch_size},
    )
    datasets = load_dataset(args.dataset_config)
    train_loader = DataLoader(
        datasets["train"], shuffle=True, seed=0, **config.dataloader
    )
    val_loader = DataLoader(datasets["validation"], **config.dataloader)

    trainer = Trainer(model, learning_rate=args.learning_rate)
    trainer.fit(
        train_loader,
        val_loader,
        early_stopping_patience=config.early_stopping_patience,
        **config.fit,
    )
    df = trainer.predict_as_dataframe(
        val_loader, additional_attributes=config.target
    )
    print(df.head())


if __name__ == "__main__":
    main()
