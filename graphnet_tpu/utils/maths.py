"""Math utilities (mirror of reference ``src/graphnet/utilities/maths.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def eps_like(x: jax.Array) -> jax.Array:
    """Machine epsilon of ``x``'s dtype, as a scalar of that dtype."""
    return jnp.asarray(jnp.finfo(x.dtype).eps, dtype=x.dtype)
