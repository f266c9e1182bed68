"""Backbone base class (mirror of reference ``src/graphnet/models/gnn/gnn.py``).

A backbone is a flax module mapping an :class:`~graphnet_tpu.batch.EventBatch`
to per-event latents ``[B, nb_outputs]`` (or per-node latents ``[B, L, d]``
when readout is skipped).
"""

from __future__ import annotations

import jax
from flax import linen as nn

from graphnet_tpu.batch import EventBatch


class GNN(nn.Module):
    """Base class for all backbones."""

    @property
    def nb_outputs(self) -> int:  # pragma: no cover - abstract
        raise NotImplementedError

    def _resolved_compute_dtype(self):
        """jnp dtype for matmul compute, from the backbone's optional
        ``compute_dtype`` string field (None = fp32 throughout)."""
        import jax.numpy as jnp

        cd = getattr(self, "compute_dtype", None)
        return jnp.dtype(cd) if cd else None

    def __call__(self, batch: EventBatch) -> jax.Array:  # pragma: no cover
        raise NotImplementedError
