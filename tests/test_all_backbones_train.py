"""Every backbone trains end-to-end through the Trainer (2 steps, finite
losses) — integration guard across the model family."""

import numpy as np
import pytest

import jax.numpy as jnp

from graphnet_tpu.batch import make_batch
from graphnet_tpu.models.gnn.convnet import ConvNet
from graphnet_tpu.models.gnn.dynedge import DynEdge
from graphnet_tpu.models.gnn.dynedge_jinst import DynEdgeJINST
from graphnet_tpu.models.gnn.dynedge_kaggle_tito import DynEdgeTITO
from graphnet_tpu.models.gnn.icemix import DeepIce
from graphnet_tpu.models.gnn.particlenet import ParticleNeT
from graphnet_tpu.models.standard_model import StandardModel
from graphnet_tpu.models.task.reconstruction import EnergyReconstruction
from graphnet_tpu.models.transformer.iseecube import ISeeCube
from graphnet_tpu.training.loss_functions import LogCoshLoss
from graphnet_tpu.training.trainer import Trainer

BACKBONES = {
    "dynedge": lambda: DynEdge(nb_inputs=4),
    "tito": lambda: DynEdgeTITO(
        nb_inputs=4, dyntrans_layer_sizes=((64, 64),), n_head=4
    ),
    "jinst": lambda: DynEdgeJINST(nb_inputs=4, layer_size_scale=1),
    "convnet": lambda: ConvNet(nb_inputs=4, nb_outputs_=8),
    "particlenet": lambda: ParticleNeT(
        nb_inputs=4,
        dynedge_layer_sizes=((16, 16),),
        nb_neighbours=4,
    ),
    "deepice": lambda: DeepIce(
        hidden_dim=32,
        seq_length=32,
        depth=1,
        depth_rel=1,
        head_size=8,
        n_features=4,
    ),
    "iseecube": lambda: ISeeCube(
        hidden_dim=32,
        seq_length=32,
        num_layers=1,
        num_heads=4,
        mlp_dim=64,
        n_features=4,
    ),
}


def batches():
    rng = np.random.default_rng(0)
    out = []
    for s in range(2):
        events = [
            rng.standard_normal((int(rng.integers(6, 25)), 4)).astype(
                np.float32
            )
            for _ in range(4)
        ]
        labels = {
            "energy": np.abs(
                rng.standard_normal(4).astype(np.float32)
            )
            + 1.0
        }
        out.append(make_batch(events, labels=labels, length=32))
    return out


@pytest.mark.parametrize("name", sorted(BACKBONES))
def test_backbone_trains(name):
    model = StandardModel(
        backbone=BACKBONES[name](),
        tasks=(
            EnergyReconstruction(
                loss_function=LogCoshLoss(),
                transform_prediction_and_target=lambda x: jnp.log10(
                    x
                ),
            ),
        ),
    )
    trainer = Trainer(model, learning_rate=1e-4, clip_grad_norm=5.0)
    history = trainer.fit(
        batches(), max_epochs=2, use_default_schedule=False
    )
    assert np.isfinite(history["train_loss"]).all(), name
    preds = trainer.predict(batches())
    assert np.isfinite(preds[0]).all()
