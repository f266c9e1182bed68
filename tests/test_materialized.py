"""Disk-materialised batch store: pack once, replay exactly (new process
included), shuffle per epoch, train through the Trainer."""

import os

import numpy as np
import pytest

# heavyweight (subprocess / full-size / torch-golden) — fast tier skips
pytestmark = pytest.mark.slow

from graphnet_tpu.batch import EventBatch, make_batch
from graphnet_tpu.data.materialized import (
    MaterializedLoader,
    materialize,
)


def _leafdict(batch):
    """Named host arrays of every populated EventBatch field."""
    out = {
        "x": np.asarray(batch.x),
        "mask": np.asarray(batch.mask),
        "n_pulses": np.asarray(batch.n_pulses),
    }
    for k, v in batch.labels.items():
        out[f"labels/{k}"] = np.asarray(v)
    for k, v in batch.node_labels.items():
        out[f"node_labels/{k}"] = np.asarray(v)
    for f in ("edges", "edge_mask", "event_weight",
              "packed_f", "packed_i", "packed_nl"):
        v = getattr(batch, f)
        if v is not None:
            out[f] = np.asarray(v)
    return out


def _key(batch):
    return np.asarray(batch.n_pulses).tobytes()


class _ListLoader:
    def __init__(self, batches):
        self.batches = batches
        self.iterations = 0

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        self.iterations += 1
        return iter(self.batches)


def synthetic_batches():
    rng = np.random.default_rng(0)
    out = []
    for bi, (B, L) in enumerate([(4, 16), (4, 16), (3, 32)]):
        events = [
            rng.standard_normal(
                (int(rng.integers(2, L + 1)), 5)
            ).astype(np.float32)
            for _ in range(B)
        ]
        batch = make_batch(
            events,
            labels={
                "energy": rng.standard_normal(B).astype(np.float32),
                "pid": rng.integers(0, 3, B).astype(np.int32),
            },
            node_labels=[
                {"t": rng.standard_normal(len(e)).astype(np.float32)}
                for e in events
            ],
            length=L,
        )
        # exercise the optional fields on one group
        if bi == 2:
            k = 3
            batch = batch.replace(
                edges=np.zeros((B, L, k), np.int32),
                edge_mask=np.ones((B, L, k), bool),
                event_weight=np.full((B,), 1.0, np.float32),
            )
        out.append(batch)
    return out


class TestMaterializedStore:
    def test_pack_and_exact_replay(self, tmp_path):
        src = synthetic_batches()
        path = str(tmp_path / "store")
        meta = materialize(_ListLoader(src), path)
        assert meta["n_batches"] == len(src)
        assert len(meta["groups"]) == 2  # (4,16) and (3,32) shapes

        ml = MaterializedLoader(path, shuffle=False)
        assert len(ml) == len(src)
        got = list(ml)
        by_key = {_key(b): b for b in src}
        for b in got:
            ref = _leafdict(by_key[_key(b)])
            here = _leafdict(b)
            assert set(here) == set(ref)
            for name in ref:
                np.testing.assert_array_equal(
                    here[name], ref[name], err_msg=name
                )
            assert b.label_spec == by_key[_key(b)].label_spec

    def test_reopen_without_source(self, tmp_path):
        """A fresh MaterializedLoader on the same path (new-process
        pattern) replays identically — the pack is self-describing."""
        src = synthetic_batches()
        path = str(tmp_path / "store")
        loader = _ListLoader(src)
        ml0 = MaterializedLoader.from_loader(loader, path, shuffle=False)
        a = [_leafdict(b) for b in ml0]
        ml1 = MaterializedLoader(path, shuffle=False)
        b = [_leafdict(x) for x in ml1]
        assert loader.iterations == 1
        for da, db in zip(a, b):
            for name in da:
                np.testing.assert_array_equal(da[name], db[name])
        # from_loader on an existing pack does not re-run the source
        MaterializedLoader.from_loader(loader, path)
        assert loader.iterations == 1

    def test_no_silent_overwrite(self, tmp_path):
        src = synthetic_batches()
        path = str(tmp_path / "store")
        materialize(_ListLoader(src), path)
        with pytest.raises(FileExistsError):
            materialize(_ListLoader(src), path)
        materialize(_ListLoader(src[:1]), path, overwrite=True)
        assert len(MaterializedLoader(path)) == 1

    def test_shuffle_per_epoch(self, tmp_path):
        rng = np.random.default_rng(1)
        src = [
            make_batch(
                [rng.standard_normal((i + 2, 3)).astype(np.float32)],
                length=16,
            )
            for i in range(8)
        ]
        path = str(tmp_path / "store")
        materialize(_ListLoader(src), path)
        ml = MaterializedLoader(path, shuffle=True, seed=5)
        e0 = [_key(b) for b in ml]
        e1 = [_key(b) for b in ml]
        assert sorted(e0) == sorted(e1)
        assert e0 != e1  # 8! orders; same-order collision ~0

    def test_empty_loader_rejected(self, tmp_path):
        with pytest.raises(ValueError):
            materialize(_ListLoader([]), str(tmp_path / "s"))

    def test_crashed_repack_invalidates_store(self, tmp_path):
        """overwrite=True removes meta.json BEFORE touching leaf files:
        a crash mid-repack leaves "no store", never stale metadata over
        half-rewritten data."""
        src = synthetic_batches()
        path = str(tmp_path / "store")
        materialize(_ListLoader(src), path)

        class Exploding:
            def __iter__(self):
                yield src[0]
                raise RuntimeError("boom")

        with pytest.raises(RuntimeError):
            materialize(Exploding(), path, overwrite=True)
        assert not os.path.exists(os.path.join(path, "meta.json"))
        with pytest.raises(FileNotFoundError):
            MaterializedLoader(path)

    def test_to_device_false_yields_host_numpy(self, tmp_path):
        src = synthetic_batches()
        path = str(tmp_path / "store")
        materialize(_ListLoader(src), path)
        ml = MaterializedLoader(path, shuffle=False, to_device=False)
        b = next(iter(ml))
        assert isinstance(np.asarray(b.x), np.ndarray)
        assert type(b.x).__module__.startswith("numpy")

    def test_stack_k_groups_consecutive_same_shape(self, tmp_path):
        """stack_k>1: consecutive same-shape batches come back as ONE
        StackedBatches (transferred in one device_put); shape-group
        boundaries and remainders fall back to single batches; the
        unstacked contents equal the plain loader's, in order."""
        from graphnet_tpu.batch import StackedBatches

        src = synthetic_batches()
        path = str(tmp_path / "store")
        materialize(_ListLoader(src), path)

        plain = list(MaterializedLoader(path, shuffle=False))
        stacked = list(
            MaterializedLoader(path, shuffle=False, stack_k=2)
        )
        # (4,16) x2 -> one stack of 2; (3,32) x1 -> single remainder
        assert [type(b).__name__ for b in stacked] == [
            "StackedBatches",
            "EventBatch",
        ]
        flat = []
        for b in stacked:
            flat.extend(
                b.unstack() if isinstance(b, StackedBatches) else [b]
            )
        assert len(flat) == len(plain)
        for a, b in zip(flat, plain):
            for name, ref in _leafdict(b).items():
                np.testing.assert_array_equal(
                    _leafdict(a)[name], ref, err_msg=name
                )

    def test_stack_k_shuffled_epochs_cover_everything(self, tmp_path):
        """Shuffled stack_k replay still serves every batch exactly once
        per epoch (stacks + singles partition the epoch)."""
        from graphnet_tpu.batch import StackedBatches

        src = synthetic_batches()
        path = str(tmp_path / "store")
        materialize(_ListLoader(src), path)
        ml = MaterializedLoader(path, shuffle=True, seed=3, stack_k=2)
        for _ in range(3):  # several epochs, different orders
            flat = []
            for b in ml:
                flat.extend(
                    b.unstack()
                    if isinstance(b, StackedBatches)
                    else [b]
                )
            assert sorted(_key(b) for b in flat) == sorted(
                _key(b) for b in src
            )

    def test_process_sharding(self, tmp_path):
        """Hosts read disjoint equal-length slices of one shared
        permutation; the union covers all batches each full epoch when
        the count divides evenly."""
        rng = np.random.default_rng(2)
        src = [
            make_batch(
                [rng.standard_normal((i + 2, 3)).astype(np.float32)],
                length=16,
            )
            for i in range(9)
        ]
        path = str(tmp_path / "store")
        materialize(_ListLoader(src), path)
        shards = [
            MaterializedLoader(
                path, seed=11, process_index=i, process_count=3
            )
            for i in range(3)
        ]
        assert all(len(s) == 3 for s in shards)
        epoch = [[_key(b) for b in s] for s in shards]
        flat = [k for part in epoch for k in part]
        assert len(set(flat)) == 9  # disjoint + complete
        # uneven: 9 batches over 4 processes -> 2 each, lockstep
        uneven = [
            MaterializedLoader(
                path, seed=11, process_index=i, process_count=4
            )
            for i in range(4)
        ]
        assert all(len(u) == 2 for u in uneven)
        assert len({k for u in uneven for k in (_key(b) for b in u)}) == 8
        with pytest.raises(ValueError):
            MaterializedLoader(path, process_index=1)
        with pytest.raises(ValueError):
            MaterializedLoader(path, process_index=3, process_count=3)
        with pytest.raises(ValueError):
            MaterializedLoader(path, process_index=0, process_count=99)

    def test_process_shards_are_shape_aligned(self, tmp_path):
        """Multi-host lockstep requires every process to serve the SAME
        batch shape at the same step — the schedule is shared and
        shape-grouped, shuffling included."""
        rng = np.random.default_rng(4)
        src = []
        for L, count in ((16, 5), (32, 7), (64, 2)):
            for _ in range(count):
                src.append(
                    make_batch(
                        [
                            rng.standard_normal((3, 4)).astype(
                                np.float32
                            )
                        ],
                        length=L,
                    )
                )
        path = str(tmp_path / "store")
        materialize(_ListLoader(src), path)
        shards = [
            MaterializedLoader(
                path, shuffle=True, seed=9, process_index=i,
                process_count=2,
            )
            for i in range(2)
        ]
        # 5//2 + 7//2 + 2//2 = 6 lockstep steps per process
        assert all(len(s) == 6 for s in shards)
        for epoch in range(3):
            seqs = [
                [b.max_length for b in s] for s in shards
            ]
            assert seqs[0] == seqs[1], f"epoch {epoch}: {seqs}"
        # and the shards are disjoint (content-keyed: n_pulses collide
        # here by construction)
        a = {np.asarray(b.x).tobytes() for b in shards[0]}
        b = {np.asarray(x.x).tobytes() for x in shards[1]}
        assert len(a) == len(b) == 6
        assert not (a & b)


class TestMaterializedTraining:
    def _sqlite_loader(self):
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
        return DataLoader(ds, batch_size=16, shuffle=False)

    def test_pack_real_pipeline_and_fit(self, tmp_path):
        """The full SQLite→graph→collate pipeline packs once and a model
        trains from the replay (the production input path)."""
        import jax.numpy as jnp
        from graphnet_tpu.models.gnn.dynedge import DynEdge
        from graphnet_tpu.models.standard_model import StandardModel
        from graphnet_tpu.models.task.reconstruction import (
            EnergyReconstruction,
        )
        from graphnet_tpu.training.loss_functions import LogCoshLoss
        from graphnet_tpu.training.trainer import Trainer

        src = self._sqlite_loader()
        path = str(tmp_path / "store")
        ml = MaterializedLoader.from_loader(src, path, seed=3)

        # replay content matches the live pipeline batch-for-batch
        live = {_key(b): _leafdict(b) for b in src}
        assert len(ml) == len(live)
        for b in ml:
            ref = live[_key(b)]
            here = _leafdict(b)
            assert set(here) == set(ref)
            for name in ref:
                np.testing.assert_array_equal(
                    here[name], ref[name], err_msg=name
                )

        model = StandardModel(
            backbone=DynEdge(
                nb_inputs=4, dynedge_layer_sizes=((8, 8),)
            ),
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
        history = Trainer(model).fit(ml, max_epochs=2)
        assert len(history["train_loss"]) == 2
        assert all(np.isfinite(v) for v in history["train_loss"])
