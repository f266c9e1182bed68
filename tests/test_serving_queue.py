"""ServingQueue: micro-batched per-frame serving (the mitigation for
dispatch-dominated single-event latency — VERDICT r2 weak #8; reference
per-frame use case ``deployment/icecube/inference_module.py:81-129``)."""

import threading

import numpy as np
import pytest

from graphnet_tpu.deployment.serving_queue import (
    ServingQueue,
    serve_events_parallel,
)


class FakeEvent:
    def __init__(self, i):
        self.i = i
        self.n_pulses = 3


class CountingModule:
    """Records coalesced batch sizes; returns row = event index."""

    def __init__(self):
        self.batches = []
        self.lock = threading.Lock()

    def __call__(self, events):
        with self.lock:
            self.batches.append(len(events))
        return np.asarray([[e.i, 2.0 * e.i] for e in events], np.float32)


def test_single_event_roundtrip():
    mod = CountingModule()
    with ServingQueue(mod, max_wait_ms=0.0) as sq:
        row = sq.predict(FakeEvent(7), timeout=5)
    np.testing.assert_allclose(row, [7.0, 14.0])


def test_coalesces_concurrent_requests():
    mod = CountingModule()
    with ServingQueue(mod, max_batch=16, max_wait_ms=20.0) as sq:
        futs = [sq.submit(FakeEvent(i)) for i in range(16)]
        rows = [f.result(timeout=5) for f in futs]
    for i, row in enumerate(rows):
        np.testing.assert_allclose(row, [i, 2.0 * i])
    # far fewer module calls than events
    assert len(mod.batches) < 16
    assert max(mod.batches) > 1


def test_respects_max_batch():
    mod = CountingModule()
    with ServingQueue(mod, max_batch=4, max_wait_ms=50.0) as sq:
        futs = [sq.submit(FakeEvent(i)) for i in range(10)]
        [f.result(timeout=5) for f in futs]
    assert max(mod.batches) <= 4


def test_error_propagates_to_every_waiter():
    class Boom:
        def __call__(self, events):
            raise ValueError("nope")

    with ServingQueue(Boom(), max_wait_ms=5.0) as sq:
        futs = [sq.submit(FakeEvent(i)) for i in range(3)]
        for f in futs:
            with pytest.raises(ValueError):
                f.result(timeout=5)


def test_node_level_list_results():
    class NodeLevel:
        def __call__(self, events):
            return [
                np.full((e.n_pulses, 1), e.i, np.float32)
                for e in events
            ]

    with ServingQueue(NodeLevel(), max_wait_ms=5.0) as sq:
        futs = [sq.submit(FakeEvent(i)) for i in range(4)]
        rows = [f.result(timeout=5) for f in futs]
    for i, row in enumerate(rows):
        assert row.shape == (3, 1)
        assert (row == i).all()


def test_parallel_helper_preserves_order():
    mod = CountingModule()
    events = [FakeEvent(i) for i in range(40)]
    rows = serve_events_parallel(
        mod, events, n_workers=8, max_batch=16, max_wait_ms=5.0
    )
    for i, row in enumerate(rows):
        np.testing.assert_allclose(row, [i, 2.0 * i])
    assert max(mod.batches) > 1


def test_closed_queue_rejects():
    sq = ServingQueue(CountingModule(), max_wait_ms=0.0)
    sq.close()
    with pytest.raises(RuntimeError):
        sq.submit(FakeEvent(0))


def test_real_deployment_module(tmp_path):
    """End-to-end with a real DeploymentModule on the bundled DB:
    queued single-event predictions == direct batched predictions."""
    jax = pytest.importorskip("jax")
    from graphnet_tpu.data.constants import FEATURES, TRUTH
    from graphnet_tpu.data.dataloader import DataLoader
    from graphnet_tpu.data.sqlite_dataset import SQLiteDataset
    from graphnet_tpu.deployment.deployment_module import (
        DeploymentModule,
    )
    from graphnet_tpu.models.detector.prometheus import Prometheus
    from graphnet_tpu.models.gnn.dynedge import DynEdge
    from graphnet_tpu.models.graphs import KNNGraph
    from graphnet_tpu.models.standard_model import StandardModel
    from graphnet_tpu.models.task.reconstruction import (
        EnergyReconstruction,
    )
    from graphnet_tpu.training.loss_functions import LogCoshLoss
    from graphnet_tpu.training.trainer import Trainer
    from graphnet_tpu.utils.config import save_model_config

    ds = SQLiteDataset(
        path="data/examples/sqlite/prometheus/prometheus-events.db",
        graph_definition=KNNGraph(detector=Prometheus()),
        pulsemaps="total",
        features=FEATURES.PROMETHEUS,
        truth=TRUTH.PROMETHEUS,
        truth_table="mc_truth",
    )
    model = StandardModel(
        backbone=DynEdge(nb_inputs=4),
        tasks=(
            EnergyReconstruction(
                loss_function=LogCoshLoss(),
                target_labels=("total_energy",),
            ),
        ),
    )
    trainer = Trainer(model)
    trainer.init(next(iter(DataLoader(ds, batch_size=4))))
    config_path = str(tmp_path / "model.yml")
    params_path = str(tmp_path / "params.pkl")
    save_model_config(model, config_path)
    trainer.save_state_dict(params_path)

    module = DeploymentModule(config_path, params_path)
    events = [ds[i] for i in range(6) if ds[i].n_pulses >= 1]
    direct = module(events)
    queued = serve_events_parallel(
        module, events, n_workers=4, max_batch=8, max_wait_ms=10.0
    )
    np.testing.assert_allclose(
        np.stack(queued), direct, rtol=1e-4, atol=1e-5
    )
