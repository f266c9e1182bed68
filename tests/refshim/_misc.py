"""Shims for small non-numeric dependencies of the reference package.

* ``dill``    — only used for whole-model pickling (`models/model.py:32-47`);
                the stdlib pickle API is a drop-in for everything the
                reference calls (``dump``/``load`` with a ``recurse`` kwarg).
* ``colorlog``— `utilities/logging.py:4` uses ``colorlog.ColoredFormatter``;
                a plain ``logging.Formatter`` that swallows the color kwargs
                reproduces the non-color behavior.
* ``ruamel.yaml`` — `utilities/config/base_config.py:10` uses
                ``yaml.YAML(typ="safe", pure=True)`` with ``.load``/``.dump``;
                backed here by PyYAML's safe loader/dumper.
"""

from __future__ import annotations

import logging
import pickle
import sys
import types


def _make_dill() -> types.ModuleType:
    mod = types.ModuleType("dill")
    mod.__refshim__ = True

    def dump(obj, f, *args, recurse=False, **kwargs):
        return pickle.dump(obj, f)

    def load(f, *args, **kwargs):
        return pickle.load(f)

    mod.dump = dump
    mod.load = load
    mod.dumps = lambda obj, *a, **k: pickle.dumps(obj)
    mod.loads = lambda b, *a, **k: pickle.loads(b)
    return mod


def _make_colorlog() -> types.ModuleType:
    mod = types.ModuleType("colorlog")
    mod.__refshim__ = True

    class ColoredFormatter(logging.Formatter):
        def __init__(self, fmt=None, datefmt=None, style="%", **kwargs):
            # strip colorlog's %(log_color)s / %(reset)s directives
            if fmt:
                for token in ("%(log_color)s", "%(reset)s"):
                    fmt = fmt.replace(token, "")
            kwargs.pop("log_colors", None)
            kwargs.pop("reset", None)
            kwargs.pop("secondary_log_colors", None)
            super().__init__(fmt=fmt, datefmt=datefmt, style=style)

    mod.ColoredFormatter = ColoredFormatter
    mod.StreamHandler = logging.StreamHandler
    mod.getLogger = logging.getLogger
    return mod


def _make_ruamel() -> tuple:
    import yaml as pyyaml

    pkg = types.ModuleType("ruamel")
    pkg.__refshim__ = True
    pkg.__path__ = []  # mark as package
    sub = types.ModuleType("ruamel.yaml")
    sub.__refshim__ = True

    class YAML:
        def __init__(self, typ="safe", pure=True):
            self.typ = typ

        def load(self, stream):
            return pyyaml.safe_load(stream)

        def dump(self, data, stream=None):
            return pyyaml.safe_dump(data, stream, sort_keys=False)

    sub.YAML = YAML
    pkg.yaml = sub
    return pkg, sub


def install() -> None:
    if "dill" not in sys.modules:
        sys.modules["dill"] = _make_dill()
    if "colorlog" not in sys.modules:
        sys.modules["colorlog"] = _make_colorlog()
    if "ruamel" not in sys.modules or not hasattr(
        sys.modules["ruamel"], "__refshim__"
    ):
        try:
            import ruamel.yaml  # noqa: F401  real one, if present
        except ImportError:
            pkg, sub = _make_ruamel()
            sys.modules["ruamel"] = pkg
            sys.modules["ruamel.yaml"] = sub
