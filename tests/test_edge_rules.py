"""Custom edge rules flow through StandardModel to the backbone."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graphnet_tpu.batch import make_batch
from graphnet_tpu.models.gnn.dynedge import DynEdge
from graphnet_tpu.models.graphs.edges import (
    EuclideanEdges,
    KNNEdges,
    MinkowskiKNNEdges,
    RadialEdges,
)
from graphnet_tpu.models.standard_model import StandardModel
from graphnet_tpu.models.task.reconstruction import EnergyReconstruction
from graphnet_tpu.training.loss_functions import LogCoshLoss


def events(B=3, seed=0):
    rng = np.random.default_rng(seed)
    return [
        rng.standard_normal((int(rng.integers(6, 30)), 4)).astype(
            np.float32
        )
        for _ in range(B)
    ]


def model_with(edge_definition):
    return StandardModel(
        backbone=DynEdge(nb_inputs=4),
        tasks=(EnergyReconstruction(loss_function=LogCoshLoss()),),
        edge_definition=edge_definition,
    )


@pytest.mark.parametrize(
    "rule",
    [
        MinkowskiKNNEdges(nb_nearest_neighbours=4),
        RadialEdges(radius=1.5, max_neighbours=8),
        EuclideanEdges(sigma=1.0, threshold=1e-4, max_neighbours=8),
    ],
    ids=["minkowski", "radial", "euclidean"],
)
def test_custom_edge_rules_run(rule):
    batch = make_batch(events(), length=32)
    model = model_with(rule)
    params = model.init(jax.random.PRNGKey(0), batch)
    outputs = model.apply(params, batch)
    assert np.isfinite(np.asarray(outputs[0][0])).all()


def test_minkowski_changes_result_vs_default():
    batch = make_batch(events(seed=4), length=32)
    m_default = model_with(None)
    m_mink = model_with(
        MinkowskiKNNEdges(nb_nearest_neighbours=8, c=0.5)
    )
    params = m_default.init(jax.random.PRNGKey(0), batch)
    out_default = np.asarray(m_default.apply(params, batch)[0][0])
    out_mink = np.asarray(m_mink.apply(params, batch)[0][0])
    # the initial graph differs, so homophily/global vars and the first
    # conv differ
    assert not np.allclose(out_default, out_mink)


def test_knn_rule_matches_default():
    """KNNEdges(k=8, xyz) must reproduce the backbone's own fallback."""
    batch = make_batch(events(seed=5), length=32)
    m_default = model_with(None)
    m_knn = model_with(KNNEdges(nb_nearest_neighbours=8))
    params = m_default.init(jax.random.PRNGKey(0), batch)
    out1 = np.asarray(m_default.apply(params, batch)[0][0])
    out2 = np.asarray(m_knn.apply(params, batch)[0][0])
    np.testing.assert_allclose(out1, out2, rtol=1e-5)
