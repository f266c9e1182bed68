"""DeploymentModule — load a trained model and run inference on events
(mirror of reference ``src/graphnet/deployment/deployment_module.py:14-100``).

A deployment module is constructed from a model-config YAML + a params
snapshot and maps batches of events to prediction arrays; experiment-
specific deployers feed it events from their native file formats.
"""

from __future__ import annotations

import pickle
from typing import List, Optional, Union

import numpy as np

from graphnet_tpu.data.dataloader import collate_events
from graphnet_tpu.models.graphs.graph_definition import Event
from graphnet_tpu.utils.logging import Logger


class DeploymentModule(Logger):
    """Trained model + params, applied to events at inference time."""

    def __init__(
        self,
        model_config: str,
        state_dict: str,
        prediction_columns: Optional[List[str]] = None,
    ):
        """Args:
        model_config: path to a model-config YAML
            (``graphnet_tpu.utils.config``).
        state_dict: path to a pickled params snapshot
            (``Trainer.save_state_dict``).
        prediction_columns: names for the output columns; defaults to the
            model's ``prediction_labels``.
        """
        super().__init__()
        from graphnet_tpu.utils.config import load_model

        self.model = load_model(model_config)
        with open(state_dict, "rb") as f:
            self.params = pickle.load(f)
        self.prediction_columns = (
            prediction_columns or self.model.prediction_labels
        )
        self._predict_fn = None

    def _compile(self):
        import jax

        from graphnet_tpu.models.standard_model import (
            deterministic_clone,
        )

        # serving is always deterministic (dropout/DropPath off)
        model = deterministic_clone(self.model)

        @jax.jit
        def predict(params, batch):
            outputs = model.apply(params, batch, inference=True)
            return [pred for pred, _ in outputs]

        self._predict_fn = predict

    def __call__(
        self, events: Union[Event, List[Event]]
    ) -> Union[np.ndarray, List[np.ndarray]]:
        """Predict on one or more events.

        Graph-level tasks: returns ``[n_events, n_cols]``, one row per
        input event (0-pulse events, which cannot be collated, yield NaN
        rows so row alignment is preserved).

        Node-level tasks (the reference's pulse-cleaner pattern, e.g.
        QUESO ``SplitInIcePulses_cleaner`` —
        ``deployment/icecube/cleaning_module.py:34-79``): returns a LIST
        of per-event ``[n_pulses_i, n_cols]`` arrays, one per input
        event (per-pulse outputs are ragged by nature)."""
        if isinstance(events, Event):
            events = [events]
        if self._predict_fn is None:
            self._compile()
        node_level = [
            bool(getattr(t, "node_level", False))
            for t in self.model.tasks
        ]
        if any(node_level):
            if not all(node_level):
                raise NotImplementedError(
                    "DeploymentModule cannot mix node-level and "
                    "graph-level tasks in one model"
                )
            return self._call_node_level(events)
        kept = [i for i, e in enumerate(events) if e.n_pulses >= 1]
        ncols = len(self.prediction_columns)
        full = np.full((len(events), ncols), np.nan, np.float32)
        if not kept:
            return full
        batch = collate_events(
            [events[i] for i in kept], min_pulses=1
        )
        n_real = batch.batch_size
        batch = self._pad_batch_size(batch)
        outs = self._predict_fn(self.params, batch)
        full[kept] = np.concatenate(
            [np.asarray(o)[:n_real] for o in outs], axis=1
        )
        return full

    def _call_node_level(
        self, events: List[Event]
    ) -> List[np.ndarray]:
        ncols = len(self.prediction_columns)
        out = [
            np.full((e.n_pulses, ncols), np.nan, np.float32)
            for e in events
        ]
        kept = [i for i, e in enumerate(events) if e.n_pulses >= 1]
        if not kept:
            return out
        batch = collate_events(
            [events[i] for i in kept], min_pulses=1
        )
        n_real = batch.batch_size
        L = batch.max_length
        batch = self._pad_batch_size(batch)
        outs = self._predict_fn(self.params, batch)  # each [B, L, d]
        stacked = np.concatenate(
            [np.asarray(o)[:n_real] for o in outs], axis=2
        )  # [n_real, L, ncols]
        for j, i in enumerate(kept):
            n = min(events[i].n_pulses, L)
            out[i][:n] = stacked[j, :n]
        return out

    def export_serving(
        self,
        path: str,
        nb_inputs: Optional[int] = None,
        batch_sizes=(1, 8, 32, 128),
        lengths=(128,),
        platforms=("cpu", "tpu"),
    ) -> dict:
        """Write an AOT serving artifact (StableHLO per (B, L) shape,
        params baked in) that :class:`~graphnet_tpu.deployment.export.
        ExportedModel` serves without any model code; see
        ``deployment/export.py``."""
        from graphnet_tpu.deployment.export import export_serving

        if nb_inputs is None:
            nb_inputs = getattr(self.model.backbone, "nb_inputs", None)
            if nb_inputs is None:
                raise ValueError(
                    "backbone has no nb_inputs field; pass nb_inputs="
                )
        return export_serving(
            self.model,
            self.params,
            path,
            nb_inputs=nb_inputs,
            prediction_columns=self.prediction_columns,
            batch_sizes=batch_sizes,
            lengths=lengths,
            platforms=platforms,
        )

    @staticmethod
    def _pad_batch_size(batch):
        """Pad the batch axis up to the next power of two (zero events,
        all-masked) so a serving process compiles at most
        ``log2(max_B) x len(L buckets)`` executables instead of one per
        distinct request size.  Padded events are trimmed from the
        output; model outputs are per-event, so real rows are unaffected
        (the padding-invariance property tested in
        ``tests/test_dynedge.py``)."""
        B = batch.batch_size
        bb = 1
        while bb < B:
            bb *= 2
        if bb == B:
            return batch
        import jax

        def pad(a):
            if not hasattr(a, "shape") or a.ndim == 0 or a.shape[0] != B:
                return a
            widths = [(0, bb - B)] + [(0, 0)] * (a.ndim - 1)
            return np.pad(np.asarray(a), widths)

        return jax.tree_util.tree_map(pad, batch)
