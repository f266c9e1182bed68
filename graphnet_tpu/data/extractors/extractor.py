"""Extractor base class (mirror of reference
``src/graphnet/data/extractors/extractor.py:9-47``)."""

from __future__ import annotations

from typing import Any

from graphnet_tpu.utils.logging import Logger


class Extractor(Logger):
    """Maps raw per-event/per-file data to ``{column: values}``.

    The extractor's name becomes the table name in the intermediate
    format."""

    def __init__(self, extractor_name: str):
        super().__init__()
        self._extractor_name = extractor_name

    @property
    def name(self) -> str:
        return self._extractor_name

    def __call__(self, data: Any):
        raise NotImplementedError


class CombinedExtractor(Extractor):
    """Combine several extractors into one table (mirror of reference
    ``data/extractors/combine_extractors.py:12-39``).

    All combined extractors must return data on the same level (all
    event-level or all pulse-level).  Works for any extractor family;
    ``set_gcd`` is forwarded to members that support it (the I3 case).
    """

    def __init__(self, extractors: list, extractor_name: str):
        super().__init__(extractor_name=extractor_name)
        self._extractors = list(extractors)

    def set_gcd(self, i3_file: str, gcd_file: Any = None) -> None:
        for extractor in self._extractors:
            if hasattr(extractor, "set_gcd"):
                extractor.set_gcd(i3_file, gcd_file)

    def __call__(self, data: Any):
        output: dict = {}
        for extractor in self._extractors:
            output.update(extractor(data))
        return output
