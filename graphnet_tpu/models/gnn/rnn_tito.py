"""RNN_TITO — Node_RNN → DynEdgeTITO composition (mirror of reference
``src/graphnet/models/gnn/RNN_tito.py:13-129``)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
from flax import linen as nn

from graphnet_tpu.batch import EventBatch
from graphnet_tpu.models.gnn.dynedge_kaggle_tito import DynEdgeTITO
from graphnet_tpu.models.gnn.gnn import GNN
from graphnet_tpu.models.rnn.node_rnn import NodeRNN


class RNNTITO(GNN):
    nb_inputs: int
    time_series_columns: Tuple[int, ...]
    nb_neighbours: int = 8
    rnn_layers: int = 2
    rnn_hidden_size: int = 64
    rnn_dropout: float = 0.5
    features_subset: Tuple[int, ...] = (0, 1, 2, 3)
    dyntrans_layer_sizes: Tuple[Tuple[int, ...], ...] = (
        (256, 256),
        (256, 256),
        (256, 256),
        (256, 256),
    )
    post_processing_layer_sizes: Tuple[int, ...] = (336, 256)
    readout_layer_sizes: Tuple[int, ...] = (256, 128)
    global_pooling_schemes: Tuple[str, ...] = ("max",)
    embedding_dim: int = 0
    n_head: int = 16
    use_global_features: bool = True
    use_post_processing_layers: bool = True
    deterministic: bool = True

    @property
    def nb_outputs(self) -> int:
        return self.readout_layer_sizes[-1]

    @nn.compact
    def __call__(self, batch: EventBatch) -> jax.Array:
        dom_batch = NodeRNN(
            nb_inputs=len(self.time_series_columns),
            hidden_size=self.rnn_hidden_size,
            num_layers=self.rnn_layers,
            time_series_columns=self.time_series_columns,
            nb_neighbours=self.nb_neighbours,
            features_subset=self.features_subset,
            dropout=self.rnn_dropout,
            embedding_dim=self.embedding_dim,
            deterministic=self.deterministic,
            name="rnn",
        )(batch)
        return DynEdgeTITO(
            nb_inputs=self.rnn_hidden_size + 5,
            dyntrans_layer_sizes=self.dyntrans_layer_sizes,
            features_subset=self.features_subset,
            global_pooling_schemes=self.global_pooling_schemes,
            use_global_features=self.use_global_features,
            use_post_processing_layers=self.use_post_processing_layers,
            post_processing_layer_sizes=self.post_processing_layer_sizes,
            readout_layer_sizes=self.readout_layer_sizes,
            n_head=self.n_head,
            nb_neighbours=self.nb_neighbours,
            name="dynedge_tito",
        )(dom_batch)
