"""Deployer — shard input files across worker processes (mirror of
reference ``src/graphnet/deployment/deployer.py:16-131``).

Experiment-specific subclasses implement ``_process_files`` which runs a
chain of DeploymentModules over one shard of files.  IceTray-specific
deployment (I3Deployer/I3InferenceModule) requires the proprietary icecube
stack and is provided only as an interface here.
"""

from __future__ import annotations

import multiprocessing
import time
from typing import List, Sequence

import numpy as np

from graphnet_tpu.deployment.deployment_module import DeploymentModule
from graphnet_tpu.utils.logging import Logger


class Deployer(Logger):
    """Run DeploymentModules over files, optionally in parallel."""

    def __init__(
        self,
        modules: Sequence[DeploymentModule],
        n_workers: int = 1,
    ):
        super().__init__()
        self._modules = list(modules)
        self._n_workers = n_workers

    def _process_files(
        self, settings
    ) -> None:  # pragma: no cover - interface
        raise NotImplementedError

    def _prepare_settings(self, input_files: List[str]):
        """Shard files evenly across workers
        (reference ``deployer.py:70-79``)."""
        shards = np.array_split(
            np.asarray(input_files), self._n_workers
        )
        return [list(s) for s in shards if len(s)]

    def run(self, input_files: List[str]) -> None:
        start = time.time()
        settings = self._prepare_settings(input_files)
        if len(settings) > 1:
            processes = [
                multiprocessing.Process(
                    target=self._process_files, args=(shard,)
                )
                for shard in settings
            ]
            for p in processes:
                p.start()
            for p in processes:
                p.join()
        else:
            for shard in settings:
                self._process_files(shard)
        self.info(
            f"Processed {len(input_files)} files in "
            f"{time.time() - start:.1f}s"
        )
