"""Loss functions — JAX-native mirrors of the reference
``src/graphnet/training/loss_functions.py``.

The central TPU-build item is the von-Mises–Fisher normaliser ``log C_m(k)``:
the reference computes the modified Bessel function with **scipy on CPU in
both forward and backward** (``loss_functions.py:242-278``), forcing a
device→host round-trip every step.  Here it is computed on device:

  * ``m == 2``: ``log I_0`` via ``jax.scipy.special.i0e`` (exactly stable);
  * ``m == 3``: closed form ``I_{1/2}(k) = sqrt(2/(pi k)) sinh(k)`` with a
    small-``k`` series for ``log(sinh k / k)``;
  * general ``m``: log-space power series for ``log I_v`` via logsumexp.

The exact/asymptotic switch at ``kappa_switch=100`` with a continuity offset
replicates the reference (``loss_functions.py:308-328``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import gammaln, i0e, i1e, logsumexp

from graphnet_tpu.utils.config import save_config

Array = jax.Array

_LOG_2PI = float(np.log(2.0 * np.pi))
_LOG_2 = float(np.log(2.0))


# ---------------------------------------------------------------------------
# log I_nu and log C_m(kappa)
# ---------------------------------------------------------------------------


def log_iv_series(nu: float, kappa: Array, n_terms: int = 256) -> Array:
    """``log I_nu(kappa)`` via the ascending series, in log space.

    Accurate for ``kappa`` up to ~a few hundred (the vMF switch point is
    100, well inside the reliable range).  ``log term_j = (2j+nu) log(k/2)
    - lgamma(j+1) - lgamma(j+nu+1)``, combined with logsumexp.
    """
    kappa = jnp.asarray(kappa, jnp.float32)
    safe = jnp.maximum(kappa, 1e-30)
    j = jnp.arange(n_terms, dtype=jnp.float32)
    log_half_k = jnp.log(safe / 2.0)
    # [..., n_terms]
    log_terms = (
        (2.0 * j + nu) * log_half_k[..., None]
        - gammaln(j + 1.0)
        - gammaln(j + nu + 1.0)
    )
    return logsumexp(log_terms, axis=-1)


def _log_sinh_over_x(x: Array) -> Array:
    """Stable ``log(sinh(x)/x)`` for x >= 0 (series below 0.1)."""
    small = x < 0.1
    x_big = jnp.where(small, 1.0, x)  # double-where: keep grads NaN-free
    big = x_big + jnp.log1p(-jnp.exp(-2.0 * x_big)) - _LOG_2 - jnp.log(x_big)
    x2 = x * x
    series = x2 / 6.0 - x2 * x2 / 180.0
    return jnp.where(small, series, big)


def log_cmk_exact(m: int, kappa: Array) -> Array:
    """``log C_m(kappa)`` exactly (reference ``LogCMK.forward``,
    ``loss_functions.py:244-259``):
    ``(m/2-1) log k - log I_{m/2-1}(k) - (m/2) log(2 pi)``."""
    kappa = jnp.asarray(kappa, jnp.float32)
    if m == 2:
        # log I_0(k) = log i0e(k) + k  (i0e is exp(-k) I_0(k))
        log_i0 = jnp.log(i0e(kappa)) + kappa
        return -log_i0 - _LOG_2PI
    if m == 3:
        # (1/2) log k - log I_{1/2}(k) - (3/2) log(2 pi)
        # I_{1/2}(k) = sqrt(2/(pi k)) sinh(k)
        # => result = -log(4 pi) - log(sinh k / k)
        return (
            -jnp.log(4.0 * jnp.pi) - _log_sinh_over_x(kappa)
        )
    nu = m / 2.0 - 1.0
    safe = jnp.maximum(kappa, 1e-30)
    return (
        nu * jnp.log(safe) - log_iv_series(nu, kappa) - (m / 2.0) * _LOG_2PI
    )


def log_cmk_approx(m: int, kappa: Array) -> Array:
    """Asymptotic approximation (arXiv:1812.04616 §8.2, with the sign
    convention of the reference ``loss_functions.py:296-306``)."""
    v = m / 2.0 - 0.5
    a = jnp.sqrt((v + 1.0) ** 2 + kappa * kappa)
    b = v - 1.0
    return -a + b * jnp.log(b + a)


def log_cmk(m: int, kappa: Array, kappa_switch: float = 100.0) -> Array:
    """Exact below ``kappa_switch``, shifted-approx above, continuous at the
    switch (reference ``loss_functions.py:308-328``)."""
    ks = jnp.asarray(kappa_switch, jnp.float32)
    offset = log_cmk_approx(m, ks) - log_cmk_exact(m, ks)
    kappa_lo = jnp.minimum(kappa, kappa_switch)  # keep exact branch finite
    return jnp.where(
        kappa < kappa_switch,
        log_cmk_exact(m, kappa_lo),
        log_cmk_approx(m, kappa) - offset,
    )


def bessel_ratio(m: int, kappa: Array) -> Array:
    """``I_{m/2}(k) / I_{m/2-1}(k)`` — d/dk of ``-log C_m`` (used by tests
    to validate gradients against the reference's ``LogCMK.backward``)."""
    kappa = jnp.asarray(kappa, jnp.float32)
    if m == 2:
        return i1e(kappa) / i0e(kappa)
    if m == 3:
        small = kappa < 1e-3
        safe = jnp.where(small, 1.0, kappa)
        big = 1.0 / jnp.tanh(safe) - 1.0 / safe
        return jnp.where(small, kappa / 3.0, big)
    lo = log_iv_series(m / 2.0, kappa)
    hi = log_iv_series(m / 2.0 - 1.0, kappa)
    return jnp.exp(lo - hi)


# ---------------------------------------------------------------------------
# Loss function classes
# ---------------------------------------------------------------------------


class LossFunction:
    """Base class: ``__call__(prediction, target, weights) -> scalar`` with
    elementwise terms available (reference ``loss_functions.py:26-60``).

    Stateless and jit-friendly: instances hold only static config.
    """

    def __call__(
        self,
        prediction: Array,
        target: Array,
        weights: Optional[Array] = None,
        return_elements: bool = False,
    ) -> Array:
        elements = self._forward(prediction, target)
        if weights is not None:
            # per-event weights are [B]; elements may be [B] or [B, d] —
            # align by appending singleton axes (a bare broadcast of [B]
            # against [B, 1] would produce a bogus [B, B] outer product)
            if weights.ndim < elements.ndim:
                weights = weights.reshape(
                    weights.shape + (1,) * (elements.ndim - weights.ndim)
                )
            elements = elements * weights
        return elements if return_elements else jnp.mean(elements)

    def _forward(self, prediction: Array, target: Array) -> Array:
        raise NotImplementedError


class MSELoss(LossFunction):
    def _forward(self, prediction: Array, target: Array) -> Array:
        if target.ndim != prediction.ndim:
            target = target.reshape(prediction.shape)
        return jnp.mean((prediction - target) ** 2, axis=-1)


class RMSELoss(MSELoss):
    def _forward(self, prediction: Array, target: Array) -> Array:
        return jnp.sqrt(super()._forward(prediction, target))


class LogCoshLoss(LossFunction):
    """Stable ``log cosh(x) = x + softplus(-2x) - log 2``
    (reference ``loss_functions.py:93-112``)."""

    @staticmethod
    def _log_cosh(x: Array) -> Array:
        return x + jax.nn.softplus(-2.0 * x) - _LOG_2

    def _forward(self, prediction: Array, target: Array) -> Array:
        if target.ndim < prediction.ndim:
            target = target[..., None]
        return self._log_cosh(prediction - target)


class CrossEntropyLoss(LossFunction):
    """Multi-class CE on logits; class ``options`` may be an int (targets
    already 0..C-1), a list (values mapped by position) or a dict (explicit
    value -> class map), mirroring reference ``loss_functions.py:115-195``.

    List/dict mapping is done with a jit-safe lookup table over the option
    values (targets are small integers like PDG codes).
    """

    @save_config
    def __init__(self, options: Union[int, List[Any], Dict[Any, int]]):
        self._options = options
        if isinstance(options, int):
            assert options >= 2
            self._nb_classes = options
            self._keys = None
            self._vals = None
        elif isinstance(options, list):
            self._nb_classes = len(options)
            self._keys = np.asarray(options, dtype=np.int64)
            self._vals = np.arange(len(options), dtype=np.int64)
        elif isinstance(options, dict):
            self._nb_classes = len(np.unique(list(options.values())))
            self._keys = np.asarray(list(options.keys()), dtype=np.int64)
            self._vals = np.asarray(list(options.values()), dtype=np.int64)
        else:
            raise ValueError(f"Unsupported options type {type(options)}")

    def _map_target(self, target: Array) -> Array:
        if self._keys is None:
            return target.astype(jnp.int32)
        target = target.reshape(-1).astype(jnp.int64)
        keys = jnp.asarray(self._keys)
        vals = jnp.asarray(self._vals)
        eq = target[:, None] == keys[None, :]  # [N, n_options]
        return jnp.sum(
            jnp.where(eq, vals[None, :], 0), axis=1
        ).astype(jnp.int32)

    def _forward(self, prediction: Array, target: Array) -> Array:
        t = self._map_target(target.reshape(-1))
        logp = jax.nn.log_softmax(prediction, axis=-1)
        onehot = jax.nn.one_hot(t, self._nb_classes, dtype=logp.dtype)
        return -jnp.sum(onehot * logp, axis=-1)


class BinaryCrossEntropyLoss(LossFunction):
    """BCE on probabilities in (0,1) (reference ``loss_functions.py:198``)."""

    def _forward(self, prediction: Array, target: Array) -> Array:
        p = jnp.clip(prediction.reshape(-1), 1e-7, 1.0 - 1e-7)
        t = target.reshape(-1).astype(p.dtype)
        return -(t * jnp.log(p) + (1.0 - t) * jnp.log1p(-p))


class VonMisesFisherLoss(LossFunction):
    """``-log C_m(|p|) - p . t`` for unit target t
    (reference ``loss_functions.py:360-401``)."""

    log_cmk_exact = staticmethod(log_cmk_exact)
    log_cmk_approx = staticmethod(log_cmk_approx)
    log_cmk = staticmethod(log_cmk)

    def _evaluate(self, prediction: Array, target: Array) -> Array:
        m = target.shape[1]
        k = jnp.linalg.norm(prediction, axis=1)
        dotprod = jnp.sum(prediction * target, axis=1)
        return -log_cmk(m, k) - dotprod


class VonMisesFisher2DLoss(VonMisesFisherLoss):
    """prediction ``[N, 2] = (angle, kappa)``; target ``[N, >=1]`` angle."""

    def _forward(self, prediction: Array, target: Array) -> Array:
        target = target.reshape(prediction.shape[0], -1)
        angle_true = target[:, 0]
        t = jnp.stack([jnp.cos(angle_true), jnp.sin(angle_true)], axis=1)
        angle_pred = prediction[:, 0]
        kappa = prediction[:, 1]
        p = kappa[:, None] * jnp.stack(
            [jnp.cos(angle_pred), jnp.sin(angle_pred)], axis=1
        )
        return self._evaluate(p, t)


class VonMisesFisher3DLoss(VonMisesFisherLoss):
    """prediction ``[N, 4] = (x, y, z, kappa)``; target unit 3-vector."""

    def _forward(self, prediction: Array, target: Array) -> Array:
        target = target.reshape(-1, 3)
        kappa = prediction[:, 3]
        p = kappa[:, None] * prediction[:, :3]
        return self._evaluate(p, target)


class EuclideanDistanceLoss(LossFunction):
    def _forward(self, prediction: Array, target: Array) -> Array:
        return jnp.sqrt(
            jnp.sum((prediction[:, :3] - target[:, :3]) ** 2, axis=1)
        )


class EnsembleLoss(LossFunction):
    """Weighted sum of losses over (optional) prediction-column slices
    (reference ``loss_functions.py:450-518``)."""

    @save_config
    def __init__(
        self,
        loss_functions: List[LossFunction],
        loss_factors: Optional[List[float]] = None,
        prediction_keys: Optional[List[List[int]]] = None,
    ):
        if loss_factors is None:
            loss_factors = [1.0] * len(loss_functions)
        assert len(loss_functions) == len(loss_factors)
        self._loss_functions = loss_functions
        self._factors = loss_factors
        self._prediction_keys = prediction_keys

    def _forward(self, prediction: Array, target: Array) -> Array:
        if self._prediction_keys is None:
            keys = [list(range(prediction.shape[1]))] * len(
                self._loss_functions
            )
        else:
            keys = self._prediction_keys
        elements = 0.0
        for fac, fn, key in zip(self._factors, self._loss_functions, keys):
            elements = elements + fac * fn._forward(
                prediction[:, key], target
            )
        return elements


class RMSEVonMisesFisher3DLoss(EnsembleLoss):
    """RMSE + 0.05 * vMF3D (reference ``loss_functions.py:521-537``)."""

    @save_config
    def __init__(self, vmfs_factor: float = 0.05):
        super().__init__(
            loss_functions=[RMSELoss(), VonMisesFisher3DLoss()],
            loss_factors=[1.0, vmfs_factor],
            prediction_keys=[[0, 1, 2], [0, 1, 2, 3]],
        )
