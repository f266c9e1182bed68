"""ArgumentParser with standard arguments (mirror of reference
``src/graphnet/utilities/argparse.py:63-154``)."""

from __future__ import annotations

import argparse
from typing import Any, Dict, List, Tuple, Union


class Options:
    """Named default options (reference ``argparse.py:20-60``)."""

    def __init__(self, *options: Union[str, Tuple[str, Any]]):
        self._options = list(options)

    def contains(self, name: str) -> bool:
        return any(self._name(o) == name for o in self._options)

    def pop_default(self, name: str) -> Any:
        for o in self._options:
            if self._name(o) == name:
                return o[1] if isinstance(o, tuple) else None
        raise KeyError(name)

    @staticmethod
    def _name(o: Union[str, Tuple[str, Any]]) -> str:
        return o[0] if isinstance(o, tuple) else o


STANDARD_ARGUMENTS: Dict[str, Dict[str, Any]] = {
    "path": dict(type=str, help="Path to dataset file(s)"),
    "pulsemap": dict(type=str, default="total", help="Pulse map name"),
    "target": dict(type=str, help="Name of the target variable"),
    "truth-table": dict(
        type=str, default="truth", help="Name of truth table"
    ),
    "chips": dict(
        nargs="*", type=int, default=None, help="TPU chips to use"
    ),
    "max-epochs": dict(type=int, default=5, help="Max training epochs"),
    "early-stopping-patience": dict(
        type=int, default=5, help="Early stopping patience (epochs)"
    ),
    "batch-size": dict(type=int, default=128, help="Batch size"),
    "num-workers": dict(
        type=int, default=10, help="Dataloader workers"
    ),
    "learning-rate": dict(type=float, default=1e-3, help="Peak LR"),
}


class ArgumentParser(argparse.ArgumentParser):
    """argparse with registry of standard training arguments."""

    standard_arguments = STANDARD_ARGUMENTS

    def with_standard_arguments(
        self, *args: Union[str, Tuple[str, Any]]
    ) -> "ArgumentParser":
        for arg in args:
            if isinstance(arg, tuple):
                name, default = arg
            else:
                name, default = arg, None
            assert name in self.standard_arguments, (
                f"unknown standard argument {name!r}"
            )
            spec = dict(self.standard_arguments[name])
            if default is not None:
                spec["default"] = default
            self.add_argument(f"--{name}", **spec)
        return self
