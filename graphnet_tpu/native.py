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


# -- native SQLite fetch ---------------------------------------------------
# Separate shared object (links against libsqlite3); degrades to the
# Python sqlite3 route when the build or the library is unavailable.
_SQLITE_SRC = os.path.join(_NATIVE_DIR, "sqlite_fetch.cpp")
_SQLITE_SO = os.path.join(_NATIVE_DIR, "_sqlite_fetch.so")
_sqlite_lib: Optional[ctypes.CDLL] = None
_sqlite_tried = False


def get_sqlite_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native SQLite fetcher; None if
    unavailable (no compiler / no libsqlite3)."""
    global _sqlite_lib, _sqlite_tried
    if _sqlite_lib is not None or _sqlite_tried:
        return _sqlite_lib
    _sqlite_tried = True
    if not os.path.exists(_SQLITE_SRC):
        return None
    if not os.path.exists(_SQLITE_SO) or os.path.getmtime(
        _SQLITE_SO
    ) < os.path.getmtime(_SQLITE_SRC):
        try:
            subprocess.run(
                [
                    "g++",
                    "-O3",
                    "-shared",
                    "-fPIC",
                    "-o",
                    _SQLITE_SO,
                    _SQLITE_SRC,
                    "-l:libsqlite3.so.0",
                ],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except (OSError, subprocess.SubprocessError):
            return None
    try:
        lib = ctypes.CDLL(_SQLITE_SO)
    except OSError:
        return None
    lib.gn_sqlite_open.argtypes = [ctypes.c_char_p]
    lib.gn_sqlite_open.restype = ctypes.c_void_p
    lib.gn_sqlite_close.argtypes = [ctypes.c_void_p]
    lib.gn_sqlite_fetch_f64.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_void_p,
        ctypes.c_longlong,
        ctypes.c_int32,
    ]
    lib.gn_sqlite_fetch_f64.restype = ctypes.c_longlong
    _sqlite_lib = lib
    return _sqlite_lib


def sqlite_open(path: str) -> Optional[int]:
    """Native read-only connection handle, or None if unavailable."""
    lib = get_sqlite_lib()
    if lib is None:
        return None
    return lib.gn_sqlite_open(path.encode()) or None


def sqlite_close(handle: Optional[int]) -> None:
    if handle:
        lib = get_sqlite_lib()
        if lib is not None:
            lib.gn_sqlite_close(handle)


def sqlite_fetch_f64(
    handle: int, sql: str, ncols: int, cap_hint: int = 4096
) -> Optional[np.ndarray]:
    """Run ``sql`` natively, returning a ``[n, ncols]`` float64 array.

    Returns None when the query hits non-numeric cells or errors — the
    caller falls back to the Python route (mirroring its TypeError
    fallback for NULL/TEXT).  The C call runs without the GIL.
    """
    lib = get_sqlite_lib()
    if lib is None:
        return None
    sql_b = sql.encode()
    cap = max(int(cap_hint), 16)
    for _ in range(2):
        out = np.empty((cap, ncols), np.float64)
        n = lib.gn_sqlite_fetch_f64(
            handle,
            sql_b,
            out.ctypes.data_as(ctypes.c_void_p),
            cap,
            ncols,
        )
        if n >= 0:
            return out[:n]
        if n <= -3:  # buffer too small; retry once with the exact size
            cap = -n - 3
            continue
        return None
    return None


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
