"""Config round-trip tests: model trees and graph definitions serialise to
YAML and rebuild identically (no code execution on load — the reference's
`!lambda` eval mechanism is deliberately absent)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graphnet_tpu.batch import make_batch
from graphnet_tpu.models.detector.prometheus import Prometheus
from graphnet_tpu.models.gnn.dynedge import DynEdge
from graphnet_tpu.models.graphs import KNNGraph
from graphnet_tpu.models.standard_model import StandardModel
from graphnet_tpu.models.task.reconstruction import (
    EnergyReconstruction,
    ZenithReconstructionWithKappa,
)
from graphnet_tpu.training.loss_functions import (
    CrossEntropyLoss,
    LogCoshLoss,
    VonMisesFisher2DLoss,
)
from graphnet_tpu.utils.config import (
    TRANSFORM_REGISTRY,
    capture_config,
    load_model,
    save_model_config,
)


def events(B=2, seed=0):
    rng = np.random.default_rng(seed)
    return [
        rng.standard_normal((int(rng.integers(6, 20)), 4)).astype(
            np.float32
        )
        for _ in range(B)
    ]


def test_model_roundtrip(tmp_path):
    model = StandardModel(
        backbone=DynEdge(nb_inputs=4),
        tasks=(
            EnergyReconstruction(
                loss_function=LogCoshLoss(),
                target_labels=("total_energy",),
                transform_prediction_and_target=TRANSFORM_REGISTRY[
                    "log10"
                ],
            ),
            ZenithReconstructionWithKappa(
                loss_function=VonMisesFisher2DLoss(),
                target_labels=("injection_zenith",),
            ),
        ),
    )
    path = str(tmp_path / "model.yml")
    save_model_config(model, path)
    rebuilt = load_model(path)
    assert type(rebuilt) is StandardModel
    assert rebuilt.backbone.nb_inputs == 4
    assert rebuilt.target_labels == model.target_labels
    assert rebuilt.prediction_labels == model.prediction_labels

    # identical forward given identical params
    batch = make_batch(events(), length=32)
    params = model.init(jax.random.PRNGKey(0), batch)
    out1 = model.apply(params, batch)
    out2 = rebuilt.apply(params, batch)
    for (p1, _), (p2, _) in zip(out1, out2):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))


def test_graph_definition_roundtrip(tmp_path):
    gd = KNNGraph(
        detector=Prometheus(),
        nb_nearest_neighbours=6,
        perturbation_dict={"t": 0.1},
        seed=3,
    )
    cfg = capture_config(gd)
    path = str(tmp_path / "graph.yml")
    cfg.dump(path)
    rebuilt = load_model(path)
    assert type(rebuilt) is KNNGraph
    assert rebuilt.edge_definition.nb_nearest_neighbours == 6
    assert rebuilt._perturbation_dict == {"t": 0.1}
    assert type(rebuilt._detector).__name__ == "ORCA150SuperDense"


def test_loss_with_options_roundtrip(tmp_path):
    from graphnet_tpu.models.task.classification import (
        MulticlassClassificationTask,
    )

    model = StandardModel(
        backbone=DynEdge(nb_inputs=4),
        tasks=(
            MulticlassClassificationTask(
                nb_outputs=3,
                target_labels=("pid",),
                loss_function=CrossEntropyLoss({12: 0, 13: 1, 16: 2}),
            ),
        ),
    )
    path = str(tmp_path / "cls.yml")
    save_model_config(model, path)
    rebuilt = load_model(path)
    assert rebuilt.tasks[0].loss_function._nb_classes == 3


def test_unregistered_lambda_rejected(tmp_path):
    model = StandardModel(
        backbone=DynEdge(nb_inputs=4),
        tasks=(
            EnergyReconstruction(
                loss_function=LogCoshLoss(),
                transform_prediction_and_target=lambda x: jnp.log10(x),
            ),
        ),
    )
    with pytest.raises(ValueError, match="unregistered callable"):
        save_model_config(model, str(tmp_path / "bad.yml"))
