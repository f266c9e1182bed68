"""pytorch_lightning shim — just enough for the reference model code.

The reference mixes ``LightningModule`` into every ``Model``
(`models/model.py:8,21`) but the only LightningModule behavior its
*forward/loss* code path relies on is:

* being an ``nn.Module``;
* ``self.device`` (`models/components/layers.py:66` moves the recomputed
  edge_index to the module device);
* ``self.log(...)`` no-op (`models/easy_model.py:244-274`, only hit when
  training through a Trainer, which we never do).

``Trainer`` / callbacks / loggers are import-time stubs only: parity tests
drive the reference model directly (forward + manual optimizer steps),
never through a Lightning ``Trainer``.
"""

from __future__ import annotations

import sys
import types

import torch


class LightningModule(torch.nn.Module):
    @property
    def device(self) -> torch.device:
        try:
            return next(self.parameters()).device
        except StopIteration:
            return torch.device("cpu")

    def log(self, *args, **kwargs):  # noqa: D102
        pass

    def log_dict(self, *args, **kwargs):  # noqa: D102
        pass

    def save_hyperparameters(self, *args, **kwargs):  # noqa: D102
        pass

    @property
    def trainer(self):  # noqa: D102
        return getattr(self, "_refshim_trainer", None)


class Callback:
    def __init__(self, *args, **kwargs):
        pass


class _StubCallback(Callback):
    pass


class EarlyStopping(Callback):
    def __init__(self, monitor=None, patience=3, **kwargs):
        self.monitor = monitor
        self.patience = patience
        self.best_score = None


class ModelCheckpoint(Callback):
    def __init__(self, *args, **kwargs):
        pass


class TQDMProgressBar(Callback):
    pass


class Trainer:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "refshim Trainer is an import stub; drive the reference model "
            "directly (forward + manual optimizer steps)"
        )


def rank_zero_only(fn):
    return fn


def install() -> None:
    if "pytorch_lightning" in sys.modules and hasattr(
        sys.modules["pytorch_lightning"], "__refshim__"
    ):
        return

    pl = types.ModuleType("pytorch_lightning")
    pl.__refshim__ = True
    pl.__path__ = []
    pl.LightningModule = LightningModule
    pl.Callback = Callback
    pl.Trainer = Trainer

    callbacks = types.ModuleType("pytorch_lightning.callbacks")
    callbacks.Callback = Callback
    callbacks.EarlyStopping = EarlyStopping
    callbacks.ModelCheckpoint = ModelCheckpoint
    callbacks.TQDMProgressBar = TQDMProgressBar
    pl.callbacks = callbacks

    loggers = types.ModuleType("pytorch_lightning.loggers")

    class Logger:  # base class for type annotations only
        pass

    loggers.Logger = Logger
    pl.loggers = loggers

    utilities = types.ModuleType("pytorch_lightning.utilities")
    utilities.rank_zero_only = rank_zero_only
    pl.utilities = utilities

    sys.modules["pytorch_lightning"] = pl
    sys.modules["pytorch_lightning.callbacks"] = callbacks
    sys.modules["pytorch_lightning.loggers"] = loggers
    sys.modules["pytorch_lightning.utilities"] = utilities
