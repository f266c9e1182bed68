"""ctypes bindings for the native (C++) host runtime pieces.

The shared library is compiled on first use from ``native/collate.cpp``
(g++ is part of the toolchain) and cached next to the source; everything
degrades gracefully to the numpy implementations when a compiler is
unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

from graphnet_tpu.constants import GRAPHNET_ROOT_DIR

_NATIVE_DIR = os.path.join(GRAPHNET_ROOT_DIR, "native")
_SRC = os.path.join(_NATIVE_DIR, "collate.cpp")
_SO = os.path.join(_NATIVE_DIR, "_collate.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++",
                "-O3",
                "-shared",
                "-fPIC",
                "-o",
                _SO,
                _SRC,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SRC):
        return None
    if not os.path.exists(_SO) or os.path.getmtime(
        _SO
    ) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.pad_events.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    lib.pad_node_labels.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_void_p,
    ]
    _lib = lib
    return _lib


def native_pad_events(
    events: List[np.ndarray], L: int
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """C++ padding of ``[n_i, D]`` float32 arrays to ``([B,L,D], [B,L],
    [B])``; None if the native library is unavailable."""
    lib = get_lib()
    if lib is None or not events:
        return None
    B = len(events)
    D = events[0].shape[1]
    contig = [
        np.ascontiguousarray(e, dtype=np.float32) for e in events
    ]
    ptrs = (ctypes.c_void_p * B)(
        *[e.ctypes.data_as(ctypes.c_void_p).value for e in contig]
    )
    lengths = np.asarray([e.shape[0] for e in contig], np.int32)
    out_x = np.empty((B, L, D), np.float32)
    out_mask = np.empty((B, L), np.uint8)
    out_n = np.empty((B,), np.int32)
    lib.pad_events(
        ptrs,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        B,
        D,
        L,
        out_x.ctypes.data_as(ctypes.c_void_p),
        out_mask.ctypes.data_as(ctypes.c_void_p),
        out_n.ctypes.data_as(ctypes.c_void_p),
    )
    return out_x, out_mask.astype(bool), out_n
