"""Tests: coarsening ops, SWA/EMA averaging, ArgumentParser."""

import numpy as np
import pytest

from graphnet_tpu.models.coarsening import (
    AttributeCoarsening,
    CustomDOMCoarsening,
    DOMAndTimeWindowCoarsening,
    DOMCoarsening,
)
from graphnet_tpu.models.graphs.graph_definition import Event


FEATURES = ["dom_x", "dom_y", "dom_z", "rde", "pmt_area", "dom_time", "charge"]


def make_event():
    # two DOMs: A (3 pulses), B (2 pulses)
    rows = np.array(
        [
            [0, 0, 0, 1, 1, 10.0, 1.0],
            [0, 0, 0, 1, 1, 20.0, 2.0],
            [0, 0, 0, 1, 1, 30.0, 3.0],
            [5, 5, 5, 1, 1, 15.0, 4.0],
            [5, 5, 5, 1, 1, 100.0, 5.0],
        ],
        dtype=np.float32,
    )
    return Event(x=rows, features=list(FEATURES), labels={"energy": 1.0})


class TestCoarsening:
    def test_dom_avg(self):
        ev = make_event()
        out = DOMCoarsening(reduce="avg")(ev)
        assert out.x.shape == (2, 7)
        np.testing.assert_allclose(out.x[0, 5], 20.0)  # mean time DOM A
        np.testing.assert_allclose(out.x[1, 6], 4.5)  # mean charge DOM B
        assert out.labels["energy"] == 1.0

    def test_attribute_coarsening_min(self):
        ev = make_event()
        out = AttributeCoarsening(
            attributes=["dom_x", "dom_y", "dom_z"], reduce="min"
        )(ev)
        np.testing.assert_allclose(out.x[0, 5], 10.0)

    def test_custom_dom_extra_features(self):
        ev = make_event()
        out = CustomDOMCoarsening()(ev)
        # 7 base + 7 extra columns
        assert out.x.shape == (2, 14)
        # extra: min/max/std time, min/max/std charge, count
        np.testing.assert_allclose(out.x[0, 7], 10.0)  # min time
        np.testing.assert_allclose(out.x[0, 8], 30.0)  # max time
        np.testing.assert_allclose(out.x[0, 13], 3.0)  # count

    def test_time_window(self):
        ev = make_event()
        out = DOMAndTimeWindowCoarsening(time_window=30.0)(ev)
        # DOM A pulses within 30ns -> 1 cluster; DOM B pulses 85ns apart -> 2
        assert out.x.shape[0] == 3


class TestAveraging:
    def test_swa_ema_math(self):
        import jax.numpy as jnp
        from graphnet_tpu.models.gnn.dynedge import DynEdge
        from graphnet_tpu.models.standard_model import StandardModel
        from graphnet_tpu.models.task.reconstruction import (
            EnergyReconstruction,
        )
        from graphnet_tpu.training.loss_functions import LogCoshLoss
        from graphnet_tpu.training.trainer import Trainer

        model = StandardModel(
            backbone=DynEdge(nb_inputs=4),
            tasks=(EnergyReconstruction(loss_function=LogCoshLoss()),),
        )
        tr = Trainer(model, averaging="swa")
        p1 = {"w": jnp.asarray(1.0)}
        p2 = {"w": jnp.asarray(3.0)}
        tr._update_averages(p1)
        tr._update_averages(p2)
        assert float(tr._avg_params["w"]) == pytest.approx(2.0)

        tr2 = Trainer(model, averaging="ema", ema_decay=0.5)
        tr2._update_averages(p1)
        tr2._update_averages(p2)
        assert float(tr2._avg_params["w"]) == pytest.approx(2.0)


class TestArgparse:
    def test_standard_arguments(self):
        from graphnet_tpu.utils.argparse import ArgumentParser

        parser = ArgumentParser().with_standard_arguments(
            ("batch-size", 16), "max-epochs", "learning-rate"
        )
        args = parser.parse_args([])
        assert args.batch_size == 16
        assert args.max_epochs == 5
        assert args.learning_rate == 1e-3
