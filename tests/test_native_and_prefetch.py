"""Native C++ collate equivalence + prefetching loader behaviour."""

import numpy as np
import pytest

from graphnet_tpu.batch import make_batch
from graphnet_tpu.data.prefetch import PrefetchingLoader
from graphnet_tpu.native import get_lib, native_pad_events


def events(B=6, seed=0):
    rng = np.random.default_rng(seed)
    return [
        rng.standard_normal((int(rng.integers(3, 40)), 5)).astype(
            np.float32
        )
        for _ in range(B)
    ]


class TestNativeCollate:
    def test_builds(self):
        assert get_lib() is not None, "native collate failed to build"

    def test_matches_numpy(self):
        evs = events()
        L = 64
        res = native_pad_events(evs, L)
        assert res is not None
        x, mask, n = res
        B = len(evs)
        # numpy reference
        x_ref = np.zeros((B, L, 5), np.float32)
        mask_ref = np.zeros((B, L), bool)
        for i, e in enumerate(evs):
            x_ref[i, : len(e)] = e
            mask_ref[i, : len(e)] = True
        np.testing.assert_array_equal(x, x_ref)
        np.testing.assert_array_equal(mask, mask_ref)
        np.testing.assert_array_equal(n, [len(e) for e in evs])

    def test_truncation(self):
        evs = [np.ones((50, 3), np.float32)]
        x, mask, n = native_pad_events(evs, 16)
        assert n[0] == 16
        assert mask[0].sum() == 16
        assert (x[0] == 1).all()

    def test_collate_uses_it(self):
        # end-to-end through collate_events (via make_batch-level check)
        evs = events(seed=3)
        batch = make_batch(evs, length=64)
        from graphnet_tpu.models.graphs.graph_definition import Event
        from graphnet_tpu.data.dataloader import collate_events

        wrapped = [
            Event(x=e, features=[f"f{i}" for i in range(5)])
            for e in evs
        ]
        batch2 = collate_events(wrapped, length=64)
        np.testing.assert_array_equal(
            np.asarray(batch.x), np.asarray(batch2.x)
        )
        np.testing.assert_array_equal(
            np.asarray(batch.mask), np.asarray(batch2.mask)
        )


class TestPrefetch:
    def test_yields_all_batches(self):
        evs = events(B=12, seed=1)
        batches = [make_batch(evs[i : i + 4]) for i in range(0, 12, 4)]
        out = list(PrefetchingLoader(batches, prefetch=2))
        assert len(out) == 3
        for a, b in zip(out, batches):
            np.testing.assert_array_equal(
                np.asarray(a.x), np.asarray(b.x)
            )

    def test_propagates_errors(self):
        def bad_loader():
            yield make_batch(events(B=2, seed=2))
            raise RuntimeError("boom")

        class L:
            def __iter__(self):
                return bad_loader()

        with pytest.raises(RuntimeError, match="boom"):
            list(PrefetchingLoader(L()))


def test_prefetch_through_trainer():
    """PrefetchingLoader wraps a DataLoader transparently for fit()."""
    import os

    import pytest as _pytest

    from graphnet_tpu.constants import EXAMPLE_SQLITE_DATA

    if not os.path.exists(EXAMPLE_SQLITE_DATA):
        _pytest.skip("example data not present")

    import jax.numpy as jnp

    from graphnet_tpu.data.constants import FEATURES, TRUTH
    from graphnet_tpu.data.dataloader import DataLoader
    from graphnet_tpu.data.sqlite_dataset import SQLiteDataset
    from graphnet_tpu.models.detector.prometheus import Prometheus
    from graphnet_tpu.models.gnn.dynedge import DynEdge
    from graphnet_tpu.models.graphs import KNNGraph
    from graphnet_tpu.models.standard_model import StandardModel
    from graphnet_tpu.models.task.reconstruction import (
        EnergyReconstruction,
    )
    from graphnet_tpu.training.loss_functions import LogCoshLoss
    from graphnet_tpu.training.trainer import Trainer

    ds = SQLiteDataset(
        path=EXAMPLE_SQLITE_DATA,
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
                transform_prediction_and_target=lambda x: jnp.log10(
                    x
                ),
            ),
        ),
    )
    loader = PrefetchingLoader(
        DataLoader(ds, batch_size=16, shuffle=True, seed=0),
        prefetch=2,
    )
    trainer = Trainer(model, learning_rate=1e-4)
    history = trainer.fit(
        loader, max_epochs=2, use_default_schedule=False
    )
    assert len(history["train_loss"]) == 2
    assert np.isfinite(history["train_loss"]).all()


class TestParallelFetch:
    """DataLoader(num_workers=N): same batches as serial, threads get
    their own SQLite connections."""

    def test_num_workers_matches_serial(self):
        import os
        import numpy as np
        import pytest
        from graphnet_tpu.constants import EXAMPLE_SQLITE_DATA
        from graphnet_tpu.data.constants import FEATURES, TRUTH
        from graphnet_tpu.data.dataloader import DataLoader
        from graphnet_tpu.data.prefetch import PrefetchingLoader
        from graphnet_tpu.data.sqlite_dataset import SQLiteDataset
        from graphnet_tpu.models.detector.prometheus import Prometheus
        from graphnet_tpu.models.graphs import KNNGraph

        if not os.path.exists(EXAMPLE_SQLITE_DATA):
            pytest.skip("example data not present")
        ds = SQLiteDataset(
            path=EXAMPLE_SQLITE_DATA,
            graph_definition=KNNGraph(detector=Prometheus()),
            pulsemaps="total",
            features=FEATURES.PROMETHEUS,
            truth=TRUTH.PROMETHEUS,
            truth_table="mc_truth",
        )
        serial = list(DataLoader(ds, batch_size=16, shuffle=False))
        # threaded fetch + prefetch thread on top (stacked thread use)
        threaded = list(
            PrefetchingLoader(
                DataLoader(ds, batch_size=16, shuffle=False, num_workers=4)
            )
        )
        assert len(serial) == len(threaded)
        for a, b in zip(serial, threaded):
            np.testing.assert_allclose(np.asarray(b.x), np.asarray(a.x))
            np.testing.assert_array_equal(
                np.asarray(b.n_pulses), np.asarray(a.n_pulses)
            )
