"""Execute the ACTUAL reference GraphNeT source on this machine.

The reference (`/root/reference/src/graphnet`) depends on packages that are
not installed here (torch_geometric, torch_scatter, torch_cluster,
pytorch_lightning, ruamel.yaml, colorlog, dill).  This package provides
pure-torch shims for exactly the API surface the reference's *model* code
uses (documented per shim, with reference call sites), inserts them into
``sys.modules``, and imports the reference package from disk.

This turns every parity test from "matches my reading of the reference"
into "matches the reference's actual executed code": the golden
activations come from running `/root/reference/src/graphnet/models/gnn/
dynedge.py` itself (VERDICT round-2 item #1).

The shims are *test infrastructure*: they re-implement third-party
dependency APIs (PyG/torch_scatter/torch_cluster semantics), not any
reference code.
"""

from __future__ import annotations

import os
import sys
from typing import Optional

REFERENCE_SRC = "/root/reference/src"

_loaded: Optional[object] = None


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_SRC, "graphnet"))


def install_shims() -> None:
    """Populate ``sys.modules`` with the dependency shims (idempotent)."""
    if "torch_geometric" in sys.modules and hasattr(
        sys.modules["torch_geometric"], "__refshim__"
    ):
        return

    from tests.refshim import _misc, _lightning, _pyg, _torchscale

    _misc.install()
    _lightning.install()
    _pyg.install()
    _torchscale.install()


def load_reference():
    """Import the reference ``graphnet`` package from /root/reference/src.

    Returns the imported top-level module.  Raises ImportError if the
    reference tree is absent (tests should gate on
    :func:`reference_available`).
    """
    global _loaded
    if _loaded is not None:
        return _loaded
    if not reference_available():
        raise ImportError(f"no reference checkout at {REFERENCE_SRC}")

    install_shims()
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)

    import graphnet  # noqa: F401  (the reference package, from disk)
    import graphnet.utilities.logging as _ref_logging

    # Don't let the reference Logger write `logs/` dirs into the repo
    # during tests: force log_folder=None for every instantiation.
    _orig = _ref_logging.Logger._make_sure_root_logger_is_configured

    def _no_file_logging(*args, **kwargs):
        return _orig(None)  # classmethod: bound cls is baked in

    _ref_logging.Logger._make_sure_root_logger_is_configured = staticmethod(
        _no_file_logging
    )

    import logging as _pylogging

    import graphnet.models  # triggers the full model import chain

    _pylogging.getLogger(_ref_logging.LOGGER_NAME).setLevel(
        _pylogging.WARNING
    )

    _loaded = graphnet
    return graphnet
