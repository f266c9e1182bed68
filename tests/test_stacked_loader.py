"""DataLoader(stack_k=k) host-side batch stacking + Trainer consumption.

The stack_k path exists for tunneled TPU runtimes where device_put cost
scales with transfer-dispatch (leaf) count: k same-shape batches are
np.stack-ed on the HOST and transferred as ONE put, and the Trainer scans
the k steps in one dispatch.  These tests pin the contract on CPU:

  * the stacked leaves are exactly the np.stack of the unstacked batches;
  * Trainer.fit on a stack_k loader reproduces the per-step losses of
    the plain steps_per_dispatch path bit-for-bit;
  * leftovers (< k same-shape batches at epoch end) still arrive as
    plain EventBatches.
"""

import numpy as np
import pytest

import jax

from graphnet_tpu.batch import EventBatch, StackedBatches


class _ArrayDataset:
    """Minimal dataset: fixed-length random events + one float label."""

    def __init__(self, n=40, L=24, D=4, seed=0):
        rng = np.random.default_rng(seed)
        self._events = [
            rng.standard_normal((L, D)).astype(np.float32)
            for _ in range(n)
        ]
        self._energy = np.abs(
            rng.standard_normal(n).astype(np.float32) * 10 + 20
        )

    def __len__(self):
        return len(self._events)

    def event_lengths(self):
        return np.asarray([len(e) for e in self._events])

    def __getitem__(self, i):
        from graphnet_tpu.models.graphs.graph_definition import Event

        return Event(
            x=self._events[i],
            features=["f0", "f1", "f2", "f3"],
            labels={"total_energy": self._energy[i]},
        )

    def get_events(self, idxs):
        return [self[i] for i in idxs]


def _loader(ds, **kw):
    from graphnet_tpu.data.dataloader import DataLoader

    return DataLoader(
        ds, batch_size=8, shuffle=False, buckets=(24,), **kw
    )


def test_stacked_leaves_match_plain_batches():
    ds = _ArrayDataset(n=40)
    plain = list(_loader(ds))
    stacked = list(_loader(ds, stack_k=2))

    assert len(plain) == 5
    # 5 batches -> 2 StackedBatches(k=2) + 1 leftover EventBatch
    kinds = [type(b) for b in stacked]
    assert kinds.count(StackedBatches) == 2
    assert kinds.count(EventBatch) == 1

    flat = []
    for b in stacked:
        flat.extend(b.unstack() if isinstance(b, StackedBatches) else [b])
    assert len(flat) == len(plain)
    for a, b in zip(plain, flat):
        la, ta = jax.tree_util.tree_flatten(a)
        lb, tb = jax.tree_util.tree_flatten(b)
        assert ta == tb
        for xa, xb in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_trainer_stacked_matches_steps_per_dispatch():
    from graphnet_tpu.models.gnn.dynedge import DynEdge
    from graphnet_tpu.models.standard_model import StandardModel
    from graphnet_tpu.models.task.reconstruction import EnergyReconstruction
    from graphnet_tpu.training.loss_functions import LogCoshLoss
    from graphnet_tpu.training.trainer import Trainer

    def model():
        return StandardModel(
            backbone=DynEdge(nb_inputs=4),
            tasks=(
                EnergyReconstruction(
                    loss_function=LogCoshLoss(),
                    target_labels=("total_energy",),
                ),
            ),
        )

    ds = _ArrayDataset(n=32)  # 4 batches of 8 -> two k=2 dispatches x2

    t_plain = Trainer(model(), steps_per_dispatch=2, seed=7)
    h_plain = t_plain.fit(
        _loader(ds), max_epochs=2, use_default_schedule=False
    )

    t_stacked = Trainer(model(), seed=7)
    h_stacked = t_stacked.fit(
        _loader(ds, stack_k=2), max_epochs=2, use_default_schedule=False
    )

    np.testing.assert_allclose(
        h_stacked["train_loss"], h_plain["train_loss"], rtol=0, atol=0
    )
    p1 = jax.tree_util.tree_leaves(t_plain.state.params)
    p2 = jax.tree_util.tree_leaves(t_stacked.state.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-7)


def test_trainer_stacked_swa_matches():
    from graphnet_tpu.models.gnn.dynedge import DynEdge
    from graphnet_tpu.models.standard_model import StandardModel
    from graphnet_tpu.models.task.reconstruction import EnergyReconstruction
    from graphnet_tpu.training.loss_functions import LogCoshLoss
    from graphnet_tpu.training.trainer import Trainer

    def model():
        return StandardModel(
            backbone=DynEdge(nb_inputs=4),
            tasks=(
                EnergyReconstruction(
                    loss_function=LogCoshLoss(),
                    target_labels=("total_energy",),
                ),
            ),
        )

    ds = _ArrayDataset(n=32)
    t_plain = Trainer(model(), steps_per_dispatch=2, averaging="swa", seed=3)
    t_plain.fit(_loader(ds), max_epochs=1, use_default_schedule=False)
    t_stacked = Trainer(model(), averaging="swa", seed=3)
    t_stacked.fit(
        _loader(ds, stack_k=2), max_epochs=1, use_default_schedule=False
    )
    a1 = jax.tree_util.tree_leaves(t_plain._avg_params)
    a2 = jax.tree_util.tree_leaves(t_stacked._avg_params)
    for a, b in zip(a1, a2):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-7)


@pytest.mark.slow
def test_stack_k_through_sqlite_fast_path():
    """stack_k composes with the vectorised SQLite fast-collate route
    (collate_from_arrays to_device=False) — the path the e2e bench's
    `kns` phase runs.  Stacked leaves must equal the np.stack of the
    plain loader's batches on the same synthetic DB."""
    pytest.importorskip("graphnet_tpu.datasets.synthetic")
    import bench

    plain_loader = bench._e2e_loader(300)
    stacked_loader = bench._e2e_loader(300, stack_k=2)
    # fast path must actually engage (the point of this test)
    plain = list(plain_loader)
    assert plain_loader._fast_ok is True
    stacked = list(stacked_loader)
    assert stacked_loader._fast_ok is True

    flat = []
    for b in stacked:
        flat.extend(b.unstack() if isinstance(b, StackedBatches) else [b])
    assert len(flat) == len(plain)
    for a, b in zip(plain, flat):
        la, ta = jax.tree_util.tree_flatten(a)
        lb, tb = jax.tree_util.tree_flatten(b)
        assert ta == tb
        for xa, xb in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_trainer_prefetch_pipeline_matches_plain():
    """fit(prefetch=4) streams all epochs through ONE warm EpochPipeline
    (background device_put producer, in-band epoch markers) and must
    reproduce the plain path's losses and params exactly — including
    composed with stack_k loaders."""
    from graphnet_tpu.models.gnn.dynedge import DynEdge
    from graphnet_tpu.models.standard_model import StandardModel
    from graphnet_tpu.models.task.reconstruction import (
        EnergyReconstruction,
    )
    from graphnet_tpu.training.loss_functions import LogCoshLoss
    from graphnet_tpu.training.trainer import Trainer

    def model():
        return StandardModel(
            backbone=DynEdge(nb_inputs=4),
            tasks=(
                EnergyReconstruction(
                    loss_function=LogCoshLoss(),
                    target_labels=("total_energy",),
                ),
            ),
        )

    ds = _ArrayDataset(n=32)

    t_plain = Trainer(model(), seed=11)
    h_plain = t_plain.fit(
        _loader(ds), max_epochs=3, use_default_schedule=False
    )
    t_pf = Trainer(model(), seed=11)
    h_pf = t_pf.fit(
        _loader(ds), max_epochs=3, use_default_schedule=False, prefetch=4
    )
    np.testing.assert_allclose(
        h_pf["train_loss"], h_plain["train_loss"], rtol=0, atol=0
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(t_plain.state.params),
        jax.tree_util.tree_leaves(t_pf.state.params),
    ):
        np.testing.assert_allclose(a, b, rtol=0, atol=0)

    # composes with stack_k (the measured-fastest tunneled delivery)
    t_pfs = Trainer(model(), seed=11)
    h_pfs = t_pfs.fit(
        _loader(ds, stack_k=2),
        max_epochs=3,
        use_default_schedule=False,
        prefetch=4,
    )
    np.testing.assert_allclose(
        h_pfs["train_loss"], h_plain["train_loss"], rtol=0, atol=0
    )


def test_epoch_pipeline_markers_and_close():
    """EpochPipeline serves exactly per-epoch slices, forwards
    set_epoch to the source, propagates errors, and close() stops a
    producer blocked on a full queue."""
    import time as _time

    from graphnet_tpu.data.prefetch import EpochPipeline

    class _Src:
        def __init__(self):
            self.epochs = []

        def set_epoch(self, e):
            self.epochs.append(e)

        def __iter__(self):
            e = self.epochs[-1]
            for i in range(3):
                yield np.full((2,), 10 * e + i, np.float32)

    src = _Src()
    with EpochPipeline(src, n_epochs=2, prefetch=2) as pipe:
        ep0 = [int(b[0]) for b in pipe.epoch()]
        ep1 = [int(b[0]) for b in pipe.epoch()]
    assert ep0 == [0, 1, 2]
    assert ep1 == [10, 11, 12]
    assert src.epochs == [0, 1]

    # error propagation
    class _Boom:
        def __iter__(self):
            yield np.zeros(1, np.float32)
            raise RuntimeError("boom")

    pipe = EpochPipeline(_Boom(), n_epochs=1, prefetch=2)
    it = pipe.epoch()
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        next(it)

    # close() unblocks a producer stuck on a full queue
    class _Endless:
        def __iter__(self):
            while True:
                yield np.zeros(1, np.float32)

    pipe = EpochPipeline(_Endless(), n_epochs=1, prefetch=1)
    next(pipe.epoch())  # start the producer; queue fills
    pipe.close()
    deadline = _time.time() + 5.0
    while pipe._thread.is_alive() and _time.time() < deadline:
        _time.sleep(0.02)
    assert not pipe._thread.is_alive()
