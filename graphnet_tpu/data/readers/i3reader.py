"""I3Reader — reads IceTray ``.i3`` files (mirror of reference
``src/graphnet/data/readers/i3reader.py:23-143``).

File discovery/pairing (``find_files``) and frame filtering
(``_skip_frame``) are pure Python and unit-tested with fakes; actually
decoding ``.i3`` files (``__call__``) requires the proprietary icecube
stack and is import-guarded exactly like the reference
(``utilities/imports.py:9-21``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Union

from graphnet_tpu.data.extractors.icecube import I3Extractor
from graphnet_tpu.data.filesys import find_i3_files
from graphnet_tpu.data.i3_filters import I3Filter, NullSplitI3Filter
from graphnet_tpu.data.readers.reader import GraphNeTFileReader
from graphnet_tpu.utils.imports import has_icecube_package


@dataclass(frozen=True)
class I3FileSet:
    """An ``.i3`` data file paired with its GCD geometry file
    (reference ``data/dataclasses.py``)."""

    i3_file: str
    gcd_file: str


class I3Reader(GraphNeTFileReader):
    """Pops physics frames from I3 files, applies filters and extractors."""

    _accepted_file_extensions = [".bz2", ".zst", ".gz"]
    _accepted_extractors = [I3Extractor]

    def __init__(
        self,
        gcd_rescue: str,
        i3_filters: Union[I3Filter, List[I3Filter], None] = None,
        icetray_verbose: int = 0,
    ):
        """Args:
        gcd_rescue: GCD file used for folders that contain i3 files but
            no GCD file of their own (reference ``i3reader.py:36-43``).
        i3_filters: frame filters; defaults to ``NullSplitI3Filter``.
        icetray_verbose: icetray log verbosity (0 silences it).
        """
        super().__init__()
        assert isinstance(gcd_rescue, str)
        if has_icecube_package() and icetray_verbose == 0:
            from icecube import icetray  # pyright: ignore

            icetray.I3Logger.global_logger = icetray.I3NullLogger()
        if i3_filters is None:
            i3_filters = [NullSplitI3Filter()]
        self._gcd_rescue = gcd_rescue
        self._i3filters = (
            i3_filters if isinstance(i3_filters, list) else [i3_filters]
        )

    def __call__(self, file_path: I3FileSet) -> List[Dict[str, Any]]:
        """Extract data from a single I3 file; one dict of
        ``{extractor_name: columns}`` per kept physics frame
        (reference ``i3reader.py:68-103``)."""
        from icecube import dataio  # pyright: ignore

        for extractor in self._extractors:
            extractor.set_gcd(
                i3_file=file_path.i3_file, gcd_file=file_path.gcd_file
            )
        io = dataio.I3File(file_path.i3_file, "r")
        data = []
        consecutive_failures = 0
        while io.more():
            try:
                frame = io.pop_physics()
                consecutive_failures = 0
            except Exception as e:  # corrupt/truncated frame streams
                if "I3" in str(e):
                    # cap retries: a corrupt stream that fails without
                    # advancing would otherwise spin forever
                    consecutive_failures += 1
                    if consecutive_failures > 100:
                        self.warning(
                            f"abandoning {file_path.i3_file} after "
                            "repeated frame decode failures"
                        )
                        break
                    continue
                raise
            if self._skip_frame(frame):
                continue
            results = [extractor(frame) for extractor in self._extractors]
            data.append(dict(zip(self.extractor_names, results)))
        return data

    def find_files(
        self, path: Union[str, List[str]]
    ) -> List[I3FileSet]:
        """Recursively pair I3 files with GCD files
        (reference ``i3reader.py:105-129``)."""
        i3_files, gcd_files = find_i3_files(path, self._gcd_rescue)
        assert len(i3_files) == len(gcd_files)
        return [
            I3FileSet(i3, gcd) for i3, gcd in zip(i3_files, gcd_files)
        ]

    def _skip_frame(self, frame) -> bool:
        """True when any filter rejects the frame
        (reference ``i3reader.py:131-143``)."""
        return any(not f(frame) for f in self._i3filters)
