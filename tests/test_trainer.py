"""End-to-end training slice: DynEdge energy regression on the bundled
Prometheus SQLite DB — the minimum-slice target of SURVEY.md §7 step 4 —
plus checkpoint round-trips and predict_as_dataframe."""

import os

import numpy as np
import pytest

from graphnet_tpu.constants import EXAMPLE_SQLITE_DATA
from graphnet_tpu.data.constants import FEATURES, TRUTH
from graphnet_tpu.data.dataloader import DataLoader
from graphnet_tpu.data.sqlite_dataset import SQLiteDataset
from graphnet_tpu.models.detector.prometheus import Prometheus
from graphnet_tpu.models.gnn.dynedge import DynEdge
from graphnet_tpu.models.graphs import KNNGraph
from graphnet_tpu.models.standard_model import StandardModel
from graphnet_tpu.models.task.reconstruction import EnergyReconstruction
from graphnet_tpu.training.callbacks import piecewise_linear_schedule
from graphnet_tpu.training.loss_functions import LogCoshLoss
from graphnet_tpu.training.trainer import Trainer

import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    not os.path.exists(EXAMPLE_SQLITE_DATA),
    reason="example data not present",
)


def build(selection=None):
    graph_definition = KNNGraph(detector=Prometheus())
    ds = SQLiteDataset(
        path=EXAMPLE_SQLITE_DATA,
        graph_definition=graph_definition,
        pulsemaps="total",
        features=FEATURES.PROMETHEUS,
        truth=TRUTH.PROMETHEUS,
        truth_table="mc_truth",
        selection=selection,
    )
    model = StandardModel(
        backbone=DynEdge(
            nb_inputs=4, global_pooling_schemes=("min", "max", "mean", "sum")
        ),
        tasks=(
            EnergyReconstruction(
                loss_function=LogCoshLoss(),
                target_labels=("total_energy",),
                prediction_labels=("energy_pred",),
                transform_prediction_and_target=lambda x: jnp.log10(x),
            ),
        ),
    )
    return ds, model


class TestSchedule:
    def test_piecewise_linear(self):
        s = piecewise_linear_schedule(1e-3, [0, 50, 1000], [1e-2, 1, 1e-2])
        assert float(s(0)) == pytest.approx(1e-5)
        assert float(s(50)) == pytest.approx(1e-3)
        assert float(s(25)) == pytest.approx(1e-5 + (1e-3 - 1e-5) / 2)
        assert float(s(1000)) == pytest.approx(1e-5)
        assert float(s(5000)) == pytest.approx(1e-5)  # constant beyond


class TestTrainer:
    def test_fit_reduces_loss_and_predicts(self, tmp_path):
        ds, model = build()
        train_loader = DataLoader(ds, batch_size=16, shuffle=True, seed=1)
        val_loader = DataLoader(ds, batch_size=16, shuffle=False)
        trainer = Trainer(
            model, learning_rate=1e-4, checkpoint_dir=str(tmp_path)
        )
        history = trainer.fit(
            train_loader,
            val_loader,
            max_epochs=4,
            early_stopping_patience=10,
            use_default_schedule=False,
        )
        assert len(history["train_loss"]) == 4
        assert np.isfinite(history["train_loss"]).all()
        # training should reduce loss on this tiny dataset
        assert min(history["train_loss"][1:]) < history["train_loss"][0]

        df = trainer.predict_as_dataframe(
            val_loader, additional_attributes=["total_energy"]
        )
        assert "energy_pred" in df.columns
        assert "total_energy" in df.columns
        assert len(df) == sum(b.batch_size for b in val_loader)
        # inference-mode prediction (no transform_inference given, so the
        # raw softplus output) is positive
        assert (df["energy_pred"] > 0).all()

    def test_steps_per_dispatch_matches_single(self):
        """k steps per dispatch (lax.scan) == k sequential steps exactly:
        same per-step losses, same final params — including a leftover
        batch flushed through the single-step path."""
        import jax

        from graphnet_tpu.batch import make_batch

        rng = np.random.default_rng(0)

        def batches():
            out = []
            for s in range(5):  # 5 batches: 2 scan dispatches + 1 flush
                r = np.random.default_rng(s)
                events = [
                    r.standard_normal((int(r.integers(5, 31)), 4)).astype(
                        np.float32
                    )
                    for _ in range(8)
                ]
                labels = {
                    "total_energy": np.abs(
                        r.standard_normal(8).astype(np.float32) * 50 + 100
                    )
                }
                out.append(make_batch(events, labels=labels, length=32))
            return out

        def run(spd):
            _, model = build()
            trainer = Trainer(
                model, learning_rate=1e-3, steps_per_dispatch=spd
            )
            history = trainer.fit(
                batches(), max_epochs=1, use_default_schedule=False
            )
            return history["train_loss"][0], trainer.state.params

        loss1, params1 = run(1)
        loss2, params2 = run(2)
        np.testing.assert_allclose(loss2, loss1, rtol=1e-6)
        for a, b in zip(
            jax.tree_util.tree_leaves(params1),
            jax.tree_util.tree_leaves(params2),
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7
            )

    @pytest.mark.parametrize("mode", ["swa", "ema"])
    def test_averaging_with_steps_per_dispatch(self, mode):
        """SWA/EMA under multi-step dispatch == per-step averaging with
        single dispatch (the scan threads the average through its
        carry; regression: scanned steps used to skip averaging)."""
        import jax

        from graphnet_tpu.batch import make_batch

        def batches():
            out = []
            for s in range(4):  # 2 scan dispatches at spd=2
                r = np.random.default_rng(s)
                events = [
                    r.standard_normal((int(r.integers(5, 31)), 4)).astype(
                        np.float32
                    )
                    for _ in range(8)
                ]
                labels = {
                    "total_energy": np.abs(
                        r.standard_normal(8).astype(np.float32) * 50
                        + 100
                    )
                }
                out.append(make_batch(events, labels=labels, length=32))
            return out

        def run(spd):
            _, model = build()
            trainer = Trainer(
                model,
                learning_rate=1e-3,
                steps_per_dispatch=spd,
                averaging=mode,
            )
            trainer.fit(
                batches(), max_epochs=1, use_default_schedule=False
            )
            # fit() swapped the averaged weights in
            return trainer.state.params

        p1 = run(1)
        p2 = run(2)
        for a, b in zip(
            jax.tree_util.tree_leaves(p1),
            jax.tree_util.tree_leaves(p2),
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7
            )

    def test_state_dict_roundtrip(self, tmp_path):
        ds, model = build(selection=None)
        loader = DataLoader(ds, batch_size=8, shuffle=False)
        trainer = Trainer(model)
        batch = next(iter(loader))
        trainer.init(batch)
        p = str(tmp_path / "weights.pkl")
        trainer.save_state_dict(p)
        pred1 = trainer.predict(loader)[0]

        trainer2 = Trainer(model)
        trainer2.load_state_dict(p)
        pred2 = trainer2.predict(loader)[0]
        np.testing.assert_allclose(pred1, pred2, rtol=1e-6)

    def test_orbax_checkpoint_roundtrip(self, tmp_path):
        ds, model = build()
        loader = DataLoader(ds, batch_size=8, shuffle=False)
        trainer = Trainer(model)
        batch = next(iter(loader))
        trainer.init(batch)
        ckpt = str(tmp_path / "ckpt")
        trainer.save_checkpoint(ckpt)
        pred1 = trainer.predict(loader)[0]

        trainer2 = Trainer(model)
        trainer2.load_checkpoint(ckpt, batch)
        pred2 = trainer2.predict(loader)[0]
        np.testing.assert_allclose(pred1, pred2, rtol=1e-6)


class TestStochasticTraining:
    """Dropout/DropPath with deterministic=False trains through the
    Trainer (it supplies a per-step "dropout" rng); eval stays
    deterministic."""

    def test_convnet_with_dropout_trains(self):
        from graphnet_tpu.batch import make_batch
        from graphnet_tpu.models.gnn.convnet import ConvNet

        rng = np.random.default_rng(0)
        events = [
            rng.standard_normal((int(rng.integers(6, 25)), 4)).astype(
                np.float32
            )
            for _ in range(8)
        ]
        labels = {
            "total_energy": np.abs(
                rng.standard_normal(8).astype(np.float32) * 100 + 200
            )
        }
        batch = make_batch(events, labels=labels, length=32)
        model = StandardModel(
            backbone=ConvNet(
                nb_inputs=4,
                nb_outputs_=8,
                dropout_ratio=0.5,
                deterministic=False,
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
        trainer = Trainer(model, learning_rate=1e-3)
        history = trainer.fit([batch] * 4, max_epochs=2)
        assert all(np.isfinite(v) for v in history["train_loss"])
        # prediction path is deterministic (no rngs supplied)
        p1 = trainer.predict([batch])
        p2 = trainer.predict([batch])
        np.testing.assert_array_equal(p1[0], p2[0])

    def test_tito_transformer_dropout_trains(self):
        from graphnet_tpu.batch import make_batch
        from graphnet_tpu.models.gnn.dynedge_kaggle_tito import DynEdgeTITO

        rng = np.random.default_rng(1)
        events = [
            rng.standard_normal((int(rng.integers(6, 25)), 4)).astype(
                np.float32
            )
            for _ in range(4)
        ]
        labels = {
            "total_energy": np.abs(
                rng.standard_normal(4).astype(np.float32) * 100 + 200
            )
        }
        batch = make_batch(events, labels=labels, length=32)
        model = StandardModel(
            backbone=DynEdgeTITO(
                nb_inputs=4,
                dyntrans_layer_sizes=((32, 32),),
                n_head=4,
                dropout_rate=0.1,  # torch's training-time default
                deterministic=False,
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
        trainer = Trainer(model, learning_rate=1e-3)
        history = trainer.fit([batch] * 2, max_epochs=2)
        assert all(np.isfinite(v) for v in history["train_loss"])
        p1 = trainer.predict([batch])
        p2 = trainer.predict([batch])
        np.testing.assert_array_equal(p1[0], p2[0])


class TestMetricLogger:
    def test_jsonlines_logger_through_fit(self, tmp_path):
        from graphnet_tpu.training.callbacks import JSONLinesLogger

        ds, model = build()
        loader = DataLoader(ds, batch_size=16, shuffle=False)
        path = str(tmp_path / "runs" / "metrics.jsonl")
        logger = JSONLinesLogger(path)
        trainer = Trainer(model, metric_logger=logger)
        history = trainer.fit(loader, max_epochs=2)
        records = logger.read()
        assert records, "nothing logged"
        epoch_recs = [r for r in records if "train_loss" in r]
        assert len(epoch_recs) >= 2
        # logged epoch losses agree with the returned history
        np.testing.assert_allclose(
            [r["train_loss"] for r in epoch_recs[-2:]],
            history["train_loss"][-2:],
            rtol=1e-6,
        )
        for r in epoch_recs:
            assert np.isfinite(r["lr"])
            assert r["step"] >= 0 and "time" in r

    def test_wandb_style_duck_type(self):
        ds, model = build()
        loader = DataLoader(ds, batch_size=16, shuffle=False)
        calls = []

        class FakeWandb:
            def log(self, metrics, step=None):
                calls.append((dict(metrics), step))

        Trainer(model, metric_logger=FakeWandb()).fit(
            loader, max_epochs=1
        )
        assert calls and any("train_loss" in m for m, _ in calls)

    def test_jsonlines_logger_resume_appends(self, tmp_path):
        from graphnet_tpu.training.callbacks import JSONLinesLogger

        path = str(tmp_path / "m.jsonl")
        a = JSONLinesLogger(path)
        a.log_metrics({"train_loss": 1.0}, step=1)
        b = JSONLinesLogger(path, resume=True)
        b.log_metrics({"train_loss": 0.5}, step=2)
        recs = b.read()
        assert [r["step"] for r in recs] == [1, 2]
        # default truncates (fresh run)
        c = JSONLinesLogger(path)
        assert c.read() == []
