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

    def test_pipelined_slow_path_and_accounting(self):
        """The pipelined iterator must also match serial on the
        per-Event (slow) route, and keep padding accounting identical."""
        import os
        import numpy as np
        import pytest
        from graphnet_tpu.constants import EXAMPLE_SQLITE_DATA
        from graphnet_tpu.data.constants import FEATURES, TRUTH
        from graphnet_tpu.data.dataloader import DataLoader
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
        serial = DataLoader(ds, batch_size=16, shuffle=False)
        serial._fast_ok = False  # force the Event route
        sb = list(serial)
        piped = DataLoader(
            ds, batch_size=16, shuffle=False, num_workers=3
        )
        piped._fast_ok = False
        pb = list(piped)
        assert len(sb) == len(pb)
        for a, b in zip(sb, pb):
            np.testing.assert_allclose(np.asarray(b.x), np.asarray(a.x))
        assert piped.padding_efficiency == pytest.approx(
            serial.padding_efficiency
        )


class TestCachingLoader:
    """CachingLoader: epoch 0 materialises, later epochs replay from the
    cache (shuffled) without touching the inner loader."""

    def _loader(self, **kw):
        import os
        import pytest
        from graphnet_tpu.constants import EXAMPLE_SQLITE_DATA
        from graphnet_tpu.data.constants import FEATURES, TRUTH
        from graphnet_tpu.data.dataloader import DataLoader
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
        return DataLoader(ds, batch_size=16, shuffle=False, **kw)

    def test_replay_matches_and_inner_not_reiterated(self):
        import numpy as np
        from graphnet_tpu.data.prefetch import CachingLoader

        inner = self._loader()
        calls = []
        orig_iter = type(inner).__iter__

        class Counting:
            def __init__(self, l):
                self.l = l

            def __len__(self):
                return len(self.l)

            def __iter__(self):
                calls.append(1)
                return orig_iter(self.l)

        cl = CachingLoader(Counting(inner), shuffle=True, seed=7)
        ep0 = list(cl)
        ep1 = list(cl)
        ep2 = list(cl)
        assert len(calls) == 1  # inner loader ran exactly once
        assert len(ep0) == len(ep1) == len(ep2)

        def key(b):
            return np.asarray(b.n_pulses).tobytes()

        assert sorted(key(b) for b in ep0) == sorted(key(b) for b in ep1)
        # shuffled order differs between epochs (same multiset)
        if len(ep0) > 2:
            assert [key(b) for b in ep1] != [key(b) for b in ep2] or [
                key(b) for b in ep0
            ] != [key(b) for b in ep1]
        # content identity: replayed batch equals its epoch-0 original
        m0 = {key(b): np.asarray(b.x) for b in ep0}
        for b in ep1:
            np.testing.assert_array_equal(np.asarray(b.x), m0[key(b)])

    def test_trains_through_trainer(self):
        import jax.numpy as jnp
        from graphnet_tpu.data.prefetch import CachingLoader
        from graphnet_tpu.models.gnn.dynedge import DynEdge
        from graphnet_tpu.models.standard_model import StandardModel
        from graphnet_tpu.models.task.reconstruction import (
            EnergyReconstruction,
        )
        from graphnet_tpu.training.loss_functions import LogCoshLoss
        from graphnet_tpu.training.trainer import Trainer

        model = StandardModel(
            backbone=DynEdge(nb_inputs=4, dynedge_layer_sizes=((8, 8),)),
            tasks=(
                EnergyReconstruction(
                    loss_function=LogCoshLoss(),
                    target_labels=("total_energy",),
                    transform_prediction_and_target=lambda x: jnp.log10(x),
                ),
            ),
        )
        loader = CachingLoader(self._loader(), seed=3)
        trainer = Trainer(model)
        history = trainer.fit(loader, max_epochs=2)
        assert len(history["train_loss"]) == 2
        assert all(np.isfinite(v) for v in history["train_loss"])


import numpy as np  # noqa: E402  (used by TestCachingLoader.fit check)
