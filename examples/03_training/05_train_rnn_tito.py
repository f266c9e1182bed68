"""Train RNN_TITO: per-DOM GRU time series feeding DynEdgeTITO (mirror of
reference ``examples/04_training/05_train_RNN_TITO.py``).

``NodeAsDOMTimeSeries`` sorts pulses by time, groups them per sensor and
marks series boundaries; the RNN consumes each series with hidden-state
reset at the markers (``models/rnn/node_rnn.py``).
"""

import jax.numpy as jnp

from graphnet_tpu.constants import EXAMPLE_SQLITE_DATA
from graphnet_tpu.data.constants import FEATURES, TRUTH
from graphnet_tpu.data.dataloader import DataLoader
from graphnet_tpu.data.sqlite_dataset import SQLiteDataset
from graphnet_tpu.models.detector.prometheus import Prometheus
from graphnet_tpu.models.gnn.rnn_tito import RNNTITO
from graphnet_tpu.models.graphs import KNNGraph
from graphnet_tpu.models.graphs.nodes import NodeAsDOMTimeSeries
from graphnet_tpu.models.standard_model import StandardModel
from graphnet_tpu.models.task.reconstruction import EnergyReconstruction
from graphnet_tpu.training.loss_functions import LogCoshLoss
from graphnet_tpu.training.trainer import Trainer
from graphnet_tpu.utils.argparse import ArgumentParser


def main() -> None:
    parser = ArgumentParser(
        description="Train RNN_TITO energy regression"
    ).with_standard_arguments(
        ("batch-size", 8),
        "max-epochs",
        "early-stopping-patience",
        "learning-rate",
    )
    parser.add_argument("--path", default=EXAMPLE_SQLITE_DATA)
    args = parser.parse_args()

    features = FEATURES.PROMETHEUS  # sensor_pos_{x,y,z}, t
    node_definition = NodeAsDOMTimeSeries(
        keys=features,
        id_columns=features[:3],
        time_column="t",
        charge_column="t_not_a_charge",  # Prometheus has no charge column
    )
    graph_definition = KNNGraph(
        detector=Prometheus(), node_definition=node_definition
    )
    ds = SQLiteDataset(
        path=args.path,
        graph_definition=graph_definition,
        pulsemaps="total",
        features=features,
        truth=TRUTH.PROMETHEUS,
        truth_table="mc_truth",
    )
    # node features: [x, y, z, t, charge(=1 synthetic), new_node_col]
    model = StandardModel(
        backbone=RNNTITO(
            nb_inputs=len(graph_definition.output_feature_names),
            time_series_columns=(4, 3),  # (charge, time)
            rnn_hidden_size=32,
            rnn_layers=1,
            dyntrans_layer_sizes=((64, 64),),
            n_head=4,
        ),
        tasks=(
            EnergyReconstruction(
                loss_function=LogCoshLoss(),
                target_labels=("total_energy",),
                transform_prediction_and_target=lambda x: jnp.log10(x),
            ),
        ),
    )
    trainer = Trainer(model, learning_rate=args.learning_rate)
    loader = DataLoader(ds, batch_size=args.batch_size, shuffle=True, seed=0)
    history = trainer.fit(loader, max_epochs=args.max_epochs)
    print("final train loss:", history["train_loss"][-1])


if __name__ == "__main__":
    main()
