"""Deploy a trained model: config + weights → DeploymentModule → raw
events (mirror of the reference's deployment surface,
``deployment/deployment_module.py:14-100``; its IceTray deployer wraps the
same flow per frame).

Trains a tiny model first if no saved artifacts are given, then serves
events straight from a Dataset — the full save → load → infer round-trip.
"""

import os

import numpy as np

from graphnet_tpu.constants import EXAMPLE_SQLITE_DATA
from graphnet_tpu.data.constants import FEATURES, TRUTH
from graphnet_tpu.data.dataloader import DataLoader
from graphnet_tpu.data.sqlite_dataset import SQLiteDataset
from graphnet_tpu.deployment.deployment_module import DeploymentModule
from graphnet_tpu.models.detector.prometheus import Prometheus
from graphnet_tpu.models.graphs import KNNGraph
from graphnet_tpu.training.trainer import Trainer
from graphnet_tpu.utils.argparse import ArgumentParser
from graphnet_tpu.utils.config import load_model, save_model_config


def main() -> None:
    parser = ArgumentParser(
        description="Serve a trained model on raw events"
    ).with_standard_arguments(("batch-size", 16), "max-epochs")
    parser.add_argument("--model-dir", default="/tmp/deploy_example")
    args = parser.parse_args()

    ds = SQLiteDataset(
        path=EXAMPLE_SQLITE_DATA,
        graph_definition=KNNGraph(detector=Prometheus()),
        pulsemaps="total",
        features=FEATURES.PROMETHEUS,
        truth=TRUTH.PROMETHEUS,
        truth_table="mc_truth",
    )

    config_path = os.path.join(args.model_dir, "model.yml")
    weights_path = os.path.join(args.model_dir, "state_dict.pkl")
    if not (os.path.exists(config_path) and os.path.exists(weights_path)):
        # quick-train an energy regressor to have something to deploy
        import jax.numpy as jnp

        from graphnet_tpu.models.gnn.dynedge import DynEdge
        from graphnet_tpu.models.standard_model import StandardModel
        from graphnet_tpu.models.task.reconstruction import (
            EnergyReconstruction,
        )
        from graphnet_tpu.training.loss_functions import LogCoshLoss
        from graphnet_tpu.utils.config import TRANSFORM_REGISTRY

        model = StandardModel(
            backbone=DynEdge(nb_inputs=4),
            tasks=(
                EnergyReconstruction(
                    loss_function=LogCoshLoss(),
                    target_labels=("total_energy",),
                    prediction_labels=("energy_pred",),
                    transform_prediction_and_target=TRANSFORM_REGISTRY[
                        "log10"
                    ],
                ),
            ),
        )
        trainer = Trainer(model, learning_rate=1e-3)
        trainer.fit(
            DataLoader(ds, batch_size=args.batch_size, shuffle=True, seed=0),
            max_epochs=args.max_epochs,
        )
        os.makedirs(args.model_dir, exist_ok=True)
        save_model_config(model, config_path)
        trainer.save_state_dict(weights_path)
        print(f"trained + saved model to {args.model_dir}")

    module = DeploymentModule(config_path, weights_path)
    events = [ds[i] for i in range(8)]
    preds = module(events)
    truth = np.asarray([e.labels["total_energy"] for e in events])
    for p, t in zip(preds[:, 0], truth):
        print(f"predicted energy {p:10.2f}   true {t:10.2f}")

    # AOT serving artifact: compile once, serve anywhere with no model
    # code (StableHLO via jax.export; see deployment/export.py)
    from graphnet_tpu.deployment.export import ExportedModel

    export_dir = os.path.join(args.model_dir, "serving")
    if not os.path.exists(os.path.join(export_dir, "serving.json")):
        module.export_serving(
            export_dir, batch_sizes=(1, 8), lengths=(128,)
        )
    served = ExportedModel(export_dir)
    aot = served(events)
    print(
        "AOT artifact max |Δ| vs live module:",
        float(np.max(np.abs(aot - preds))),
    )


if __name__ == "__main__":
    main()
