"""Loader/result conveniences (`training/utils.py`) + ProgressBar knob +
CombinedExtractor (reference ``training/utils.py:70-327``,
``data/extractors/combine_extractors.py``)."""

import os

import numpy as np
import pytest

from graphnet_tpu.constants import EXAMPLE_SQLITE_DATA
from graphnet_tpu.data.constants import FEATURES, TRUTH
from graphnet_tpu.data.extractors.extractor import (
    CombinedExtractor,
    Extractor,
)
from graphnet_tpu.models.detector.prometheus import Prometheus
from graphnet_tpu.models.gnn.dynedge import DynEdge
from graphnet_tpu.models.graphs import KNNGraph
from graphnet_tpu.models.standard_model import StandardModel
from graphnet_tpu.models.task.reconstruction import EnergyReconstruction
from graphnet_tpu.training.loss_functions import LogCoshLoss
from graphnet_tpu.training.trainer import Trainer
from graphnet_tpu.training.utils import (
    get_predictions,
    make_dataloader,
    make_train_validation_dataloader,
    save_results,
    save_selection,
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(EXAMPLE_SQLITE_DATA),
    reason="example data not present",
)


def _gd():
    return KNNGraph(detector=Prometheus())


def _model():
    return StandardModel(
        backbone=DynEdge(nb_inputs=4),
        tasks=(
            EnergyReconstruction(
                loss_function=LogCoshLoss(),
                target_labels=("total_energy",),
            ),
        ),
    )


COMMON = dict(
    pulsemaps="total",
    features=FEATURES.PROMETHEUS,
    truth=TRUTH.PROMETHEUS,
    truth_table="mc_truth",
)


def test_make_train_validation_dataloader_split():
    train, val = make_train_validation_dataloader(
        EXAMPLE_SQLITE_DATA,
        _gd(),
        None,
        batch_size=8,
        seed=1,
        test_size=0.25,
        **COMMON,
    )
    n_train, n_val = len(train.dataset), len(val.dataset)
    total = n_train + n_val
    assert n_val == round(0.25 * total)
    train_ids = {int(np.ravel(e.labels["event_no"])[0]) for e in map(train.dataset.__getitem__, range(n_train))}
    val_ids = {int(np.ravel(e.labels["event_no"])[0]) for e in map(val.dataset.__getitem__, range(n_val))}
    assert not train_ids & val_ids, "train/val selections overlap"
    batch = next(iter(val))
    assert batch.x.shape[0] <= 8

    # seeded: same split again
    train2, _ = make_train_validation_dataloader(
        EXAMPLE_SQLITE_DATA,
        _gd(),
        None,
        batch_size=8,
        seed=1,
        test_size=0.25,
        **COMMON,
    )
    train2_ids = {
        int(np.ravel(e.labels["event_no"])[0])
        for e in map(train2.dataset.__getitem__, range(len(train2.dataset)))
    }
    assert train2_ids == train_ids


def test_make_dataloader_labels_and_selection():
    loader = make_dataloader(
        EXAMPLE_SQLITE_DATA,
        graph_definition=_gd(),
        batch_size=4,
        shuffle=False,
        selection=None,
        labels={"double_energy": lambda ev: 2.0 * ev.labels["total_energy"]},
        **COMMON,
    )
    ev = loader.dataset[0]
    assert ev.labels["double_energy"] == pytest.approx(
        2.0 * ev.labels["total_energy"]
    )


def test_get_predictions_and_save_results(tmp_path):
    loader = make_dataloader(
        EXAMPLE_SQLITE_DATA,
        graph_definition=_gd(),
        batch_size=8,
        shuffle=False,
        **COMMON,
    )
    trainer = Trainer(_model())
    trainer.init(next(iter(loader)))
    df = get_predictions(
        trainer,
        loader,
        prediction_columns=["E_pred"],
        additional_attributes=["event_no"],
    )
    assert list(df.columns) == ["E_pred", "event_no"]
    assert len(df) == len(loader.dataset)

    save_results(
        EXAMPLE_SQLITE_DATA, "tag1", df, str(tmp_path), trainer
    )
    out = tmp_path / "prometheus-events" / "tag1"
    assert (out / "results.csv").exists()
    assert (out / "model.yml").exists()
    assert (out / "state_dict.pkl").exists()


def test_save_selection_roundtrip(tmp_path):
    path = str(tmp_path / "sel.csv")
    save_selection([1, 2, 3], path)
    assert open(path).read().strip() == "1,2,3"


def test_progress_bar_fit():
    train, val = make_train_validation_dataloader(
        EXAMPLE_SQLITE_DATA,
        _gd(),
        None,
        batch_size=16,
        test_size=0.3,
        **COMMON,
    )
    trainer = Trainer(_model(), progress_bar=True)
    history = trainer.fit(train, val, max_epochs=1)
    assert np.isfinite(history["train_loss"][-1])


class _FakeExtractor(Extractor):
    def __init__(self, name, payload):
        super().__init__(extractor_name=name)
        self._payload = payload

    def __call__(self, data):
        return dict(self._payload)


def test_combined_extractor_merges():
    comb = CombinedExtractor(
        [
            _FakeExtractor("a", {"x": [1.0]}),
            _FakeExtractor("b", {"y": [2.0]}),
        ],
        extractor_name="ab",
    )
    assert comb.name == "ab"
    assert comb(object()) == {"x": [1.0], "y": [2.0]}
