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
