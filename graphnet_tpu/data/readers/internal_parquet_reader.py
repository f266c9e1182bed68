"""Reader for the framework's own merged-parquet format (mirror of
reference ``src/graphnet/data/readers/internal_parquet_reader.py``)."""

from __future__ import annotations

import os
from glob import glob
from typing import Dict, List, Union

from graphnet_tpu.data.extractors.internal import ParquetExtractor
from graphnet_tpu.data.readers.reader import GraphNeTFileReader


class ParquetReader(GraphNeTFileReader):
    """Read GraphNeT-format chunked parquet directories."""

    _accepted_file_extensions = [".parquet"]
    _accepted_extractors = [ParquetExtractor]

    def __call__(self, file_path: str) -> Dict:
        outputs = {}
        for extractor in self._extractors:
            output = extractor(file_path)
            if output is not None:
                outputs[extractor.name] = output
        return outputs

    def find_files(self, path: Union[str, List[str]]) -> List[str]:
        """One entry per chunk id: tables of the same chunk are grouped by
        the converter downstream."""
        if isinstance(path, str):
            path = [path]
        files: List[str] = []
        for p in path:
            files.extend(
                glob(os.path.join(p, "*", "*.parquet"))
            )
        return sorted(files)
