"""Samplers (mirror of reference ``src/graphnet/data/dataset/samplers.py``).

``RandomChunkSampler`` shuffles chunk order but keeps rows within a chunk
together, so the ParquetDataset's file cache stays hot (reference
``:46-119``).  ``LenMatchBatchSampler`` lives in
``graphnet_tpu.data.dataloader`` (it is integral to the bucketed collate).
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence

import numpy as np


class RandomChunkSampler:
    """Yield indices chunk-by-chunk, random chunk order, random order
    within each chunk."""

    def __init__(
        self,
        chunk_sizes: Sequence[int],
        seed: Optional[int] = None,
    ):
        self._chunk_sizes = list(chunk_sizes)
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return int(sum(self._chunk_sizes))

    def __iter__(self) -> Iterator[int]:
        cum = np.concatenate([[0], np.cumsum(self._chunk_sizes)])
        for c in self._rng.permutation(len(self._chunk_sizes)):
            start, stop = int(cum[c]), int(cum[c + 1])
            for i in self._rng.permutation(stop - start):
                yield start + int(i)
