"""I3/GCD file-system discovery (mirror of reference
``src/graphnet/utilities/filesys.py:8-100``).

Pure Python — fully testable without IceTray: only the *reading* of the
discovered files needs the icecube stack.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import List, Optional, Tuple, Union


def has_extension(filename: str, extensions: List[str]) -> bool:
    """True iff ``filename`` ends in one of ``extensions``
    (reference ``filesys.py:27-30``)."""
    return bool(re.search("(" + "|".join(extensions) + ")$", filename))


def pairwise_shuffle(
    i3_list: List[str], gcd_list: List[str], seed: Optional[int] = None
) -> Tuple[List[str], List[str]]:
    """Shuffle I3 files and their paired GCD files together — evens out
    per-worker extraction load (reference ``data/utilities/random.py``;
    seedable here for reproducible conversion runs)."""
    import random as _random

    order = list(range(len(i3_list)))
    _random.Random(seed).shuffle(order)
    return (
        [i3_list[i] for i in order],
        [gcd_list[i] for i in order],
    )


def is_gcd_file(filename: str) -> bool:
    """True iff ``filename`` looks like a GCD (geometry/calibration) file
    (reference ``filesys.py:8-15``)."""
    return bool(
        re.search("(gcd|geo)", filename.lower())
        or "GeoCalibDetector" in filename
    )


def is_i3_file(filename: str) -> bool:
    """True iff ``filename`` looks like a (compressed) I3 data file
    (reference ``filesys.py:18-24``)."""
    if is_gcd_file(filename):
        return False
    return bool(re.search(r"(bz2|zst|gz)$", filename))


def find_i3_files(
    directories: Union[str, List[str]],
    gcd_rescue: Optional[str] = None,
    recursive: bool = True,
) -> Tuple[List[str], List[str]]:
    """Find I3 files and pair each with its folder's GCD file.

    By IceCube convention a folder of i3 files carries one GCD file; when a
    folder has none, ``gcd_rescue`` is used (reference ``filesys.py:33-100``).

    Returns:
        ``(i3_files, gcd_files)`` of equal length (one GCD per i3 file).
    """
    if isinstance(directories, str):
        directories = [directories]

    i3_files: List[str] = []
    gcd_files: List[str] = []
    for directory in directories:
        paths: List[Path] = []
        for pattern in ("*.bz2", "*.zst", "*.gz"):
            globber = Path(directory).rglob if recursive else Path(
                directory
            ).glob
            paths.extend(globber(pattern))

        for folder in sorted({p.parent for p in paths}):
            folder_files = sorted(str(p) for p in paths if p.parent == folder)
            folder_i3 = [f for f in folder_files if is_i3_file(f)]
            folder_gcd = [f for f in folder_files if is_gcd_file(f)]
            if len(folder_gcd) > 1:
                raise RuntimeError(
                    f"multiple GCD files in {folder}: {folder_gcd}"
                )
            if not folder_gcd:
                if gcd_rescue is None:
                    raise RuntimeError(
                        f"no GCD file in {folder} and no gcd_rescue given"
                    )
                folder_gcd = [gcd_rescue]
            i3_files.extend(folder_i3)
            gcd_files.extend(folder_gcd * len(folder_i3))
    return i3_files, gcd_files
