"""DataModule — train/val(/test) datasets + loaders from one config
(mirror of reference ``src/graphnet/data/datamodule.py:18-576``)."""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Type

import numpy as np

from graphnet_tpu.data.dataloader import DataLoader
from graphnet_tpu.data.dataset import Dataset
from graphnet_tpu.utils.logging import Logger


class GraphNeTDataModule(Logger):
    """Split a dataset into train/val(/test) and build DataLoaders.

    Mirrors the reference semantics: explicit selections per split, or a
    seeded random ``train_val_split`` of all events
    (``datamodule.py:55-65,428-460``).  ``shuffle`` defaults to True for the
    train loader and False for val/test (``:84-110``).
    """

    def __init__(
        self,
        dataset_reference: Type[Dataset],
        dataset_args: Dict[str, Any],
        selection: Optional[List[int]] = None,
        test_selection: Optional[List[int]] = None,
        train_val_split: Optional[List[float]] = None,
        split_seed: int = 42,
        train_dataloader_kwargs: Optional[Dict[str, Any]] = None,
        validation_dataloader_kwargs: Optional[Dict[str, Any]] = None,
        test_dataloader_kwargs: Optional[Dict[str, Any]] = None,
    ):
        super().__init__()
        self._dataset_cls = dataset_reference
        self._dataset_args = dict(dataset_args)
        self._train_val_split = train_val_split or [0.9, 0.1]
        self._split_seed = split_seed
        self._train_dl_kwargs = dict(train_dataloader_kwargs or {})
        self._val_dl_kwargs = dict(validation_dataloader_kwargs or {})
        self._test_dl_kwargs = dict(test_dataloader_kwargs or {})
        self._train_dl_kwargs.setdefault("shuffle", True)
        self._val_dl_kwargs["shuffle"] = False
        self._test_dl_kwargs["shuffle"] = False

        if selection is None:
            probe = self._dataset_cls(**self._dataset_args)
            selection = list(probe._indices)
        if test_selection is not None:
            selection = [
                s for s in selection if s not in set(test_selection)
            ]
        train_sel, val_sel = self._split(selection)
        self._train_dataset = self._dataset_cls(
            **self._dataset_args, selection=train_sel
        )
        self._val_dataset = self._dataset_cls(
            **self._dataset_args, selection=val_sel
        )
        self._test_dataset = (
            self._dataset_cls(
                **self._dataset_args, selection=list(test_selection)
            )
            if test_selection is not None
            else None
        )

    def _split(self, selection: List[int]):
        rng = np.random.default_rng(self._split_seed)
        order = rng.permutation(len(selection))
        n_val = int(round(self._train_val_split[1] * len(selection)))
        val_idx = set(order[:n_val].tolist())
        train = [s for i, s in enumerate(selection) if i not in val_idx]
        val = [s for i, s in enumerate(selection) if i in val_idx]
        return train, val

    @property
    def train_dataset(self) -> Dataset:
        return self._train_dataset

    @property
    def val_dataset(self) -> Dataset:
        return self._val_dataset

    @property
    def test_dataset(self) -> Optional[Dataset]:
        return self._test_dataset

    def train_dataloader(self) -> DataLoader:
        return DataLoader(self._train_dataset, **self._train_dl_kwargs)

    def val_dataloader(self) -> DataLoader:
        return DataLoader(self._val_dataset, **self._val_dl_kwargs)

    def test_dataloader(self) -> DataLoader:
        assert self._test_dataset is not None, "no test selection given"
        return DataLoader(self._test_dataset, **self._test_dl_kwargs)
