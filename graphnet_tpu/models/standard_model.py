"""StandardModel — backbone + task heads (mirror of reference
``src/graphnet/models/standard_model.py``).

The reference composes ``graph_definition + backbone + tasks`` inside a
LightningModule.  Here graph construction is a host-side concern (the data
pipeline emits :class:`~graphnet_tpu.batch.EventBatch`), and StandardModel is
the pure, jittable device-side composition: backbone latents feeding every
task head, with summed task losses.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from graphnet_tpu.batch import EventBatch
from graphnet_tpu.models.gnn.gnn import GNN
from graphnet_tpu.models.task.task import Task

Array = jax.Array


def deterministic_clone(model):
    """Eval/predict copy of a model with stochastic regularisation
    disabled — the Lightning ``.eval()`` analogue for static flax config.
    Param structure is unchanged (the ``deterministic`` flag creates no
    parameters), so training params apply directly."""
    backbone = getattr(model, "backbone", None)
    if backbone is not None and getattr(
        backbone, "deterministic", True
    ) is False:
        return model.clone(backbone=backbone.clone(deterministic=True))
    return model


class StandardModel(nn.Module):
    """Backbone + one or more task heads.

    ``__call__`` returns per-task ``(prediction, regularisation)`` pairs;
    ``loss`` sums per-task losses (reference ``standard_model.py:71-109``).

    ``edge_definition``: optional edge rule (e.g. ``MinkowskiKNNEdges``)
    evaluated on device before the backbone — the device-side half of the
    GraphDefinition (whose host half builds nodes).  When None, backbones
    build their default kNN graph themselves (equivalent to the KNNGraph
    preset).
    """

    backbone: GNN
    tasks: Tuple[Task, ...]
    edge_definition: Optional[object] = None

    @nn.compact
    def __call__(
        self, batch: EventBatch, inference: bool = False
    ) -> List[Tuple[Array, Array]]:
        if self.edge_definition is not None and batch.edges is None:
            idx, edge_mask = self.edge_definition.build(
                batch.x, batch.mask
            )
            batch = batch.replace(edges=idx, edge_mask=edge_mask)
        latents = self.backbone(batch)
        return [
            task(latents, inference=inference)
            for task in self.tasks
        ]

    def loss(
        self,
        outputs: List[Tuple[Array, Array]],
        labels: Dict[str, Array],
        weights: Optional[Array] = None,
        node_labels: Optional[Dict[str, Array]] = None,
        mask: Optional[Array] = None,
        event_weights: Optional[Array] = None,
    ) -> Array:
        losses = [
            task.compute_loss(
                pred,
                reg,
                labels,
                weights=weights,
                node_labels=node_labels,
                mask=mask,
                event_weights=event_weights,
            )
            for task, (pred, reg) in zip(self.tasks, outputs)
        ]
        return jnp.sum(jnp.stack(losses))

    def loss_from_batch(
        self, outputs: List[Tuple[Array, Array]], batch: EventBatch
    ) -> Array:
        """Loss with node-level truth routed from the batch."""
        batch = batch.unpack()  # packed-label transport (batch.py)
        return self.loss(
            outputs,
            batch.labels,
            node_labels=batch.node_labels,
            mask=batch.mask,
            event_weights=batch.event_weight,
        )

    @property
    def target_labels(self) -> List[str]:
        return [l for task in self.tasks for l in task.targets]

    @property
    def prediction_labels(self) -> List[str]:
        return [l for task in self.tasks for l in task.predictions]
