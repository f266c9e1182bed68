"""AOT serving artifacts: serialize the compiled model, serve without code.

The reference deploys by shipping the Python model class plus a config
YAML + state_dict and rebuilding the module in every serving process
(``/root/reference/src/graphnet/deployment/deployment_module.py:14-100``).
This module adds the TPU-native alternative the torch stack doesn't have:
:meth:`DeploymentModule.export_serving` lowers the full inference
function (graph building on device, backbone, task heads, with the
trained params baked in as constants) through ``jax.export`` into
portable StableHLO blobs — one per served ``(batch, length)`` shape — and
:class:`ExportedModel` serves them back with zero framework/model code on
the serving side.  Version-safe by construction: the artifact pins the
compiled computation, not a Python class tree.

Notes:
  * blobs are multi-platform (CPU + TPU) by default, so the same artifact
    smoke-tests on CPU and serves on TPU;
  * multi-platform lowering uses the portable XLA compute paths (the
    Pallas fast kernels are runtime-gated on the executing backend and
    are not traced into cross-platform artifacts) — serving latency is
    the XLA-path latency, correctness is identical;
  * params are embedded per blob; keep the shape grid modest (the
    default grid is 4 batch sizes x 1-2 length buckets).
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

from graphnet_tpu.batch import EventBatch
from graphnet_tpu.data.dataloader import collate_events
from graphnet_tpu.models.graphs.graph_definition import Event
from graphnet_tpu.utils.logging import Logger

_META = "serving.json"
_VERSION = 1


def export_serving(
    model,
    params,
    path: str,
    nb_inputs: int,
    prediction_columns: Sequence[str],
    batch_sizes: Sequence[int] = (1, 8, 32, 128),
    lengths: Sequence[int] = (128,),
    platforms: Sequence[str] = ("cpu", "tpu"),
) -> dict:
    """Export ``model.apply`` at every (B, L) grid point into ``path``.

    Args:
        model: a StandardModel (or compatible flax module).
        params: trained params pytree (baked into the artifact).
        path: output directory.
        nb_inputs: node-feature width D the model was trained on.
        prediction_columns: output column names, recorded in the metadata.
        batch_sizes: served batch sizes (requests pad up to the next one;
            larger requests are chunked by the largest).
        lengths: served padded lengths (the collate buckets).
        platforms: lowering platforms for the artifact.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from graphnet_tpu.models.standard_model import deterministic_clone

    model = deterministic_clone(model)

    def predict(x, mask, n_pulses):
        batch = EventBatch(x=x, mask=mask, n_pulses=n_pulses)
        outputs = model.apply(params, batch, inference=True)
        return jnp.concatenate([pred for pred, _ in outputs], axis=1)

    os.makedirs(path, exist_ok=True)
    shapes = []
    for L in sorted(set(int(x) for x in lengths)):
        for B in sorted(set(int(x) for x in batch_sizes)):
            args = (
                jax.ShapeDtypeStruct((B, L, nb_inputs), jnp.float32),
                jax.ShapeDtypeStruct((B, L), jnp.bool_),
                jax.ShapeDtypeStruct((B,), jnp.int32),
            )
            exp = jexport.export(
                jax.jit(predict), platforms=tuple(platforms)
            )(*args)
            fname = f"b{B:04d}_l{L:05d}.stablehlo"
            with open(os.path.join(path, fname), "wb") as f:
                f.write(exp.serialize())
            shapes.append({"batch": B, "length": L, "file": fname})
    meta = {
        "version": _VERSION,
        "nb_inputs": int(nb_inputs),
        "prediction_columns": list(prediction_columns),
        "platforms": list(platforms),
        "shapes": shapes,
    }
    tmp = os.path.join(path, _META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, os.path.join(path, _META))
    return meta


class ExportedModel(Logger):
    """Serve an :func:`export_serving` artifact — no model code needed.

    Mirrors the :class:`~graphnet_tpu.deployment.deployment_module.
    DeploymentModule` call contract (events in, ``[n_events, n_cols]``
    out, one row per input event — empty events yield NaN rows) so
    deployers can use either interchangeably; requests are padded to the
    exported batch grid and chunked by its largest batch size.

    Args:
        path: directory written by :func:`export_serving`.
        truncate_long: events longer than the largest exported length
            raise by default (the live module would use more pulses —
            a silent truncation would quietly degrade predictions);
            pass True to accept first-L-pulses truncation instead.
    """

    def __init__(self, path: str, truncate_long: bool = False):
        super().__init__()
        with open(os.path.join(path, _META)) as f:
            meta = json.load(f)
        if meta.get("version") != _VERSION:
            raise ValueError(
                f"unsupported artifact version {meta.get('version')!r}"
            )
        from jax import export as jexport

        self.truncate_long = truncate_long
        self.nb_inputs = meta["nb_inputs"]
        self.prediction_columns = meta["prediction_columns"]
        self._fns = {}
        for s in meta["shapes"]:
            with open(os.path.join(path, s["file"]), "rb") as f:
                self._fns[(s["batch"], s["length"])] = (
                    jexport.deserialize(f.read())
                )
        self._batch_sizes = sorted({b for b, _ in self._fns})
        self._lengths = sorted({l for _, l in self._fns})

    def __call__(
        self, events: Union[Event, List[Event]]
    ) -> np.ndarray:
        if isinstance(events, Event):
            events = [events]
        max_b = self._batch_sizes[-1]
        outs = [
            self._call_chunk(events[s : s + max_b])
            for s in range(0, len(events), max_b)
        ]
        return np.concatenate(outs, axis=0)

    def _call_chunk(self, events: List[Event]) -> np.ndarray:
        max_len = self._lengths[-1]
        long = [e.n_pulses for e in events if e.n_pulses > max_len]
        if long and not self.truncate_long:
            raise ValueError(
                f"event with {max(long)} pulses exceeds the largest "
                f"exported length {max_len}; re-export with longer "
                "lengths= or opt into ExportedModel(truncate_long=True)"
            )
        # 0-pulse events get NaN rows (they cannot be collated); rows
        # stay aligned with the input events
        kept = [i for i, e in enumerate(events) if e.n_pulses >= 1]
        ncols = len(self.prediction_columns)
        full = np.full((len(events), ncols), np.nan, np.float32)
        if not kept:
            return full
        batch = collate_events(
            [events[i] for i in kept],
            buckets=self._lengths,
            min_pulses=1,
        )
        if batch.num_features != self.nb_inputs:
            raise ValueError(
                f"events have {batch.num_features} features; artifact "
                f"was exported with nb_inputs={self.nb_inputs}"
            )
        n_real = batch.batch_size
        B = next(b for b in self._batch_sizes if b >= n_real)
        L = batch.max_length
        x = np.zeros((B, L, self.nb_inputs), np.float32)
        mask = np.zeros((B, L), bool)
        n_pulses = np.zeros((B,), np.int32)
        x[:n_real] = np.asarray(batch.x)
        mask[:n_real] = np.asarray(batch.mask)
        n_pulses[:n_real] = np.asarray(batch.n_pulses)
        out = self._fns[(B, L)].call(x, mask, n_pulses)
        full[kept] = np.asarray(out)[:n_real]
        return full
