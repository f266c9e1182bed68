"""Exact-erf GELU with a recompute VJP.

torch ``nn.GELU``/``F.gelu`` default to the exact erf form, which the
executed-reference parity tests pin down — the tanh approximation is
NOT acceptable as a default (~1e-3 output differences).  But plain
``jax.grad`` through ``x * 0.5 * (1 + erf(x/sqrt(2)))`` makes XLA store
fp32 intermediates of the activation as backward residuals; measured on
a v5e at the DeepIce MLP shape ([12288, 1536] bf16), that residual
traffic costs +0.66 ms per block step (1.77 ms exact vs 1.11 ms tanh,
tools/bench_block_micro2.py) — ~10 ms across the 16 transformer blocks.

This version saves ONLY the (bf16) input and recomputes
``phi = 0.5*(1+erf(x/sqrt2))`` and the Gaussian pdf term in the
backward — same exact math, fp32 internal precision, no extra
residuals.  d/dx[x*phi(x)] = phi(x) + x * pdf(x).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_INV_SQRT2 = np.float32(1.0 / np.sqrt(2.0))
_INV_SQRT2PI = np.float32(1.0 / np.sqrt(2.0 * np.pi))


def _phi(xf: jax.Array) -> jax.Array:
    return 0.5 * (1.0 + jax.lax.erf(xf * _INV_SQRT2))


@jax.custom_vjp
def gelu_exact(x: jax.Array) -> jax.Array:
    xf = x.astype(jnp.float32)
    return (xf * _phi(xf)).astype(x.dtype)


def _fwd(x):
    return gelu_exact(x), x


def _bwd(x, g):
    xf = x.astype(jnp.float32)
    pdf = _INV_SQRT2PI * jnp.exp(-0.5 * xf * xf)
    dx = _phi(xf) + xf * pdf
    return ((g.astype(jnp.float32) * dx).astype(x.dtype),)


gelu_exact.defvjp(_fwd, _bwd)
