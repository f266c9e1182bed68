"""Frame filters for I3 conversion (mirror of reference
``src/graphnet/data/extractors/icecube/utilities/i3_filters.py``).

The filters are duck-typed against the IceTray frame API (``frame.Has``,
``frame[...]``) so the *logic* is unit-testable with fake frames even
without the icecube stack; only real ``.i3`` decoding needs IceTray.
"""

from __future__ import annotations

from typing import List

from graphnet_tpu.utils.logging import Logger


class I3Filter(Logger):
    """Base frame filter: ``filter(frame) -> keep?`` (reference
    ``i3_filters.py:12-46``)."""

    def _keep_frame(self, frame) -> bool:
        raise NotImplementedError

    def __call__(self, frame) -> bool:
        keep = self._keep_frame(frame)
        if not isinstance(keep, bool):
            raise TypeError(
                f"expected _keep_frame to return bool, got {type(keep)}"
            )
        return keep


class NullSplitI3Filter(I3Filter):
    """Skip null-split frames (reference ``i3_filters.py:48-63``)."""

    def _keep_frame(self, frame) -> bool:
        if frame.Has("I3EventHeader"):
            if frame["I3EventHeader"].sub_event_stream == "NullSplit":
                return False
        return True


class SubEventStreamI3Filter(I3Filter):
    """Keep only frames from the named sub-event streams."""

    def __init__(self, selection: List[str]):
        super().__init__()
        self._selection = list(selection)

    def _keep_frame(self, frame) -> bool:
        if frame.Has("I3EventHeader"):
            if frame["I3EventHeader"].sub_event_stream not in self._selection:
                return False
        return True


class I3FilterMask(I3Filter):
    """Keep frames passing named FilterMask entries (any/all semantics;
    reference ``i3_filters.py:66-128``)."""

    def __init__(self, filter_names: List[str], filter_any: bool = True):
        super().__init__()
        self._filter_names = list(filter_names)
        self._filter_any = filter_any

    def _keep_frame(self, frame) -> bool:
        if "FilterMask" not in frame:
            self.warning_once(
                "FilterMask not found in frame; filter not applied."
            )
            return True
        mask = frame["FilterMask"]
        flags = []
        for name in self._filter_names:
            if name not in mask:
                self.warning_once(
                    f"FilterMask {name} not found in frame; skipping."
                )
                continue
            flags.append(bool(mask[name].condition_passed))
        if not flags:
            self.warning_once(
                "none of the FilterMask filters found in frame; "
                "filters not applied."
            )
            return True
        return any(flags) if self._filter_any else all(flags)
