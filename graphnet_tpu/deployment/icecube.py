"""IceCube/IceTray deployment (mirror of reference
``src/graphnet/deployment/icecube/``: ``i3deployer.py:17``,
``inference_module.py:81-129``, ``cleaning_module.py:27``).

Import-guarded: requires the proprietary IceTray stack.  On systems with
IceTray these modules run a trained model inside an I3Tray chain, writing
predictions (I3Double per event) or cleaned pulse maps back into frames.
Untestable in this repository's CI; behaviour targets the reference.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from graphnet_tpu.deployment.deployer import Deployer
from graphnet_tpu.deployment.deployment_module import DeploymentModule
from graphnet_tpu.models.graphs.graph_definition import GraphDefinition
from graphnet_tpu.utils.imports import has_icecube_package, requires_icecube


class I3InferenceModule(DeploymentModule):
    """Per-frame inference: extract pulsemap → GraphDefinition → model →
    write ``I3Double`` outputs into the frame."""

    def __init__(
        self,
        pulsemap_extractor,
        model_config: str,
        state_dict: str,
        gcd_file: str,
        prediction_columns: Optional[List[str]] = None,
        model_name: Optional[str] = None,
    ):
        super().__init__(
            model_config=model_config,
            state_dict=state_dict,
            prediction_columns=prediction_columns,
        )
        self._pulsemap_extractor = pulsemap_extractor
        self._model_name = model_name or "graphnet_tpu"
        self._gcd_file = gcd_file
        if has_icecube_package():
            self._pulsemap_extractor.set_gcd(
                i3_file=gcd_file, gcd_file=gcd_file
            )
        # graph definition travels in the model config
        from graphnet_tpu.utils.config import load_model

        self._graph_definition: Optional[GraphDefinition] = None

    def set_graph_definition(self, gd: GraphDefinition) -> None:
        self._graph_definition = gd

    @requires_icecube
    def __call__(self, frame) -> bool:  # I3Tray module contract
        from icecube.icetray import I3Frame  # pyright: ignore
        from icecube.dataclasses import I3Double  # pyright: ignore

        features = self._pulsemap_extractor(frame)
        names = list(features.keys())
        arr = np.stack(
            [np.asarray(features[k], np.float64) for k in names], axis=1
        )
        assert self._graph_definition is not None, (
            "call set_graph_definition first"
        )
        event = self._graph_definition(arr, names)
        preds = DeploymentModule.__call__(self, event)[0]
        for col, value in zip(self.prediction_columns, preds):
            frame[f"{self._model_name}_{col}"] = I3Double(float(value))
        return True


class I3PulseCleanerModule(I3InferenceModule):
    """Node-level classifier writing a cleaned pulse map + per-pulse
    probabilities back into the frame (reference ``cleaning_module.py``)."""

    def __init__(
        self,
        pulsemap: str,
        threshold: float = 0.7,
        **kwargs: Any,
    ):
        super().__init__(**kwargs)
        self._pulsemap = pulsemap
        self._threshold = threshold

    @requires_icecube
    def __call__(self, frame) -> bool:
        from icecube import dataclasses  # pyright: ignore

        features = self._pulsemap_extractor(frame)
        names = list(features.keys())
        arr = np.stack(
            [np.asarray(features[k], np.float64) for k in names], axis=1
        )
        assert self._graph_definition is not None
        event = self._graph_definition(arr, names)
        probs = DeploymentModule.__call__(self, event)
        keep = probs[:, 0] > self._threshold
        pulse_map = dataclasses.I3RecoPulseSeriesMap.from_frame(
            frame, self._pulsemap
        )
        cleaned = dataclasses.I3RecoPulseSeriesMap()
        i = 0
        for om_key, pulses in pulse_map.items():
            kept = []
            for p in pulses:
                if i < len(keep) and keep[i]:
                    kept.append(p)
                i += 1
            if kept:
                cleaned[om_key] = dataclasses.vector_I3RecoPulse(kept)
        frame[f"{self._pulsemap}_{self._model_name}_cleaned"] = cleaned
        return True


class I3Deployer(Deployer):
    """Run inference modules over i3 files in an I3Tray chain, sharded
    across worker processes (reference ``i3deployer.py``)."""

    def __init__(
        self,
        modules: Sequence[I3InferenceModule],
        gcd_file: str,
        n_workers: int = 1,
    ):
        super().__init__(modules=modules, n_workers=n_workers)
        self._gcd_file = gcd_file

    @requires_icecube
    def _process_files(self, file_shard: List[str]) -> None:
        from icecube import dataio, icetray  # pyright: ignore
        from I3Tray import I3Tray  # pyright: ignore

        for i3_file in file_shard:
            tray = I3Tray()
            tray.Add(
                "I3Reader",
                "reader",
                FilenameList=[self._gcd_file, i3_file],
            )
            for module in self._modules:
                tray.Add(lambda frame, m=module: m(frame), "inference")
            out = i3_file.replace(".i3", "_graphnet_tpu.i3")
            tray.Add("I3Writer", "writer", Filename=out)
            tray.Execute()
            tray.Finish()
