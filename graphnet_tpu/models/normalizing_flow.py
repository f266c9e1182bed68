"""NormalizingFlow — conditional density estimation on backbone latents
(mirror of reference ``src/graphnet/models/normalizing_flow.py:16-158``).

The reference delegates to the optional ``jammy_flows`` package (Gaussianization
flows).  Here the flow is native JAX: per target dimension, a stack of
conditional [affine -> elementwise transform] layers whose parameters are
predicted from the backbone latents (plus optional extra conditioning
columns).  Two transform families (``transform=``): the light
``"sinh_arcsinh"`` skew/tail family, and ``"spline"`` — monotone
rational-quadratic splines (arXiv:1906.04032) matching the
expressiveness of jammy_flows' Gaussianization flows.  All transforms
are analytically invertible with closed-form log-determinants, so the
exact NLLH trains end to end on device.  Directional (S²) densities:
:class:`SphericalFlow`.

Training loss is the mean negative log-likelihood (reference ``:129-145``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from graphnet_tpu.batch import EventBatch
from graphnet_tpu.models.gnn.gnn import GNN

Array = jax.Array

_LOG_2PI = float(np.log(2.0 * np.pi))


def _sinh_arcsinh(z: Array, eps: Array, delta: Array) -> Array:
    """x = sinh(delta * arcsinh(z) + eps) — invertible for delta > 0."""
    return jnp.sinh(delta * jnp.arcsinh(z) + eps)


# softplus(c) == 1 → zero-init spline derivatives start at slope 1
_SOFTPLUS_INV_1 = float(np.log(np.e - 1.0))


def _rqs_prepare(
    raw: Array, n_bins: int, bound: float
) -> Tuple[Array, Array, Array]:
    """Raw spline params ``[..., 3K-1]`` → (x-edges, y-edges, derivs).

    Monotone rational-quadratic spline on ``[-bound, bound]`` with linear
    tails (Durkan et al., Neural Spline Flows, arXiv:1906.04032 §3).
    Zero raw params give uniform bins and unit derivatives — the identity
    map — so a zero-initialised conditioner starts at the base density.
    """
    K = n_bins
    w, h, d = (
        raw[..., :K],
        raw[..., K : 2 * K],
        raw[..., 2 * K :],
    )
    # bin widths/heights: softmax, floored so no bin collapses
    min_frac = 1e-3
    widths = jax.nn.softmax(w, axis=-1)
    widths = min_frac + (1 - min_frac * K) * widths
    heights = jax.nn.softmax(h, axis=-1)
    heights = min_frac + (1 - min_frac * K) * heights
    x_edges = jnp.cumsum(widths, axis=-1) * (2 * bound) - bound
    x_edges = jnp.concatenate(
        [jnp.full_like(x_edges[..., :1], -bound), x_edges], axis=-1
    )
    y_edges = jnp.cumsum(heights, axis=-1) * (2 * bound) - bound
    y_edges = jnp.concatenate(
        [jnp.full_like(y_edges[..., :1], -bound), y_edges], axis=-1
    )
    # interior derivatives > 0; boundary derivatives pinned to 1 so the
    # spline meets the identity tails C¹-continuously
    d_in = jax.nn.softplus(d + _SOFTPLUS_INV_1)  # > 0; == 1 at d == 0
    ones = jnp.ones_like(d_in[..., :1])
    derivs = jnp.concatenate([ones, d_in, ones], axis=-1)  # [..., K+1]
    return x_edges, y_edges, derivs


def _rqs_bin_quantities(edges_x, edges_y, derivs, idx):
    take = lambda t, i: jnp.take_along_axis(t, i[..., None], axis=-1)[
        ..., 0
    ]
    x_k = take(edges_x, idx)
    x_k1 = take(edges_x, idx + 1)
    y_k = take(edges_y, idx)
    y_k1 = take(edges_y, idx + 1)
    d_k = take(derivs, idx)
    d_k1 = take(derivs, idx + 1)
    dx = x_k1 - x_k
    s = (y_k1 - y_k) / dx
    return x_k, y_k, dx, y_k1 - y_k, s, d_k, d_k1


def _rqs_forward_and_logdet(
    z: Array, raw: Array, n_bins: int, bound: float
) -> Tuple[Array, Array]:
    """Elementwise spline forward x = f(z) and log|df/dz|."""
    ex, ey, dv = _rqs_prepare(raw, n_bins, bound)
    inside = (z > -bound) & (z < bound)
    zc = jnp.clip(z, -bound, bound)
    idx = jnp.clip(
        jnp.sum(zc[..., None] > ex[..., 1:-1], axis=-1), 0, n_bins - 1
    )
    x_k, y_k, dx, dy, s, d_k, d_k1 = _rqs_bin_quantities(ex, ey, dv, idx)
    xi = jnp.clip((zc - x_k) / dx, 0.0, 1.0)
    om = 1.0 - xi
    denom = s + (d_k1 + d_k - 2.0 * s) * xi * om
    x = y_k + dy * (s * xi * xi + d_k * xi * om) / denom
    deriv = (
        s * s * (d_k1 * xi * xi + 2.0 * s * xi * om + d_k * om * om)
    ) / (denom * denom)
    x = jnp.where(inside, x, z)
    logdet = jnp.where(inside, jnp.log(deriv), 0.0)
    return x, logdet


def _rqs_inverse_and_logdet(
    x: Array, raw: Array, n_bins: int, bound: float
) -> Tuple[Array, Array]:
    """Elementwise spline inverse z = f⁻¹(x) and log|dz/dx|."""
    ex, ey, dv = _rqs_prepare(raw, n_bins, bound)
    inside = (x > -bound) & (x < bound)
    xc = jnp.clip(x, -bound, bound)
    idx = jnp.clip(
        jnp.sum(xc[..., None] > ey[..., 1:-1], axis=-1), 0, n_bins - 1
    )
    x_k, y_k, dx, dy, s, d_k, d_k1 = _rqs_bin_quantities(ex, ey, dv, idx)
    r = xc - y_k
    t = d_k1 + d_k - 2.0 * s
    a = dy * (s - d_k) + r * t
    b = dy * d_k - r * t
    c = -s * r
    disc = jnp.maximum(b * b - 4.0 * a * c, 0.0)
    xi = jnp.clip(
        2.0 * c / (-b - jnp.sqrt(disc) - 1e-12), 0.0, 1.0
    )
    om = 1.0 - xi
    z = x_k + xi * dx
    denom = s + t * xi * om
    deriv = (
        s * s * (d_k1 * xi * xi + 2.0 * s * xi * om + d_k * om * om)
    ) / (denom * denom)
    z = jnp.where(inside, z, x)
    logdet = jnp.where(inside, -jnp.log(deriv), 0.0)
    return z, logdet


def _sinh_arcsinh_inv_and_logdet(
    x: Array, eps: Array, delta: Array
) -> Tuple[Array, Array]:
    z = jnp.sinh((jnp.arcsinh(x) - eps) / delta)
    # d x / d z = cosh(delta asinh(z) + eps) * delta / sqrt(1 + z^2)
    u = delta * jnp.arcsinh(z) + eps
    logdet_fwd = (
        jnp.log(jnp.cosh(u))
        + jnp.log(delta)
        - 0.5 * jnp.log1p(z * z)
    )
    return z, -logdet_fwd  # logdet of the inverse map


class NormalizingFlow(nn.Module):
    """Backbone + conditional flow over ``nb_targets`` dimensions.

    ``__call__(batch) -> nllh [B]``; ``log_prob``/``sample`` provide the
    density interface.  ``condition_columns`` optionally appends batch
    label columns to the conditioning vector (reference's ``state_dict``-
    conditioning options, ``normalizing_flow.py:40-76``).
    """

    backbone: GNN
    nb_targets: int = 1
    target_labels: Tuple[str, ...] = ("energy",)
    n_layers: int = 3
    condition_columns: Tuple[str, ...] = ()
    # per-layer elementwise transform after the conditional affine:
    #   "sinh_arcsinh" — 2-param skew/tail family (light, default)
    #   "spline"       — K-bin rational-quadratic spline (arXiv:1906.04032),
    #                    the richer family matching jammy_flows'
    #                    Gaussianization-flow expressiveness
    transform: str = "sinh_arcsinh"
    spline_bins: int = 8
    spline_bound: float = 4.0

    @property
    def _params_per_dim(self) -> int:
        if self.transform == "spline":
            # 2 affine + K widths + K heights + (K-1) interior derivatives
            return 2 + 3 * self.spline_bins - 1
        assert self.transform == "sinh_arcsinh", self.transform
        return 4

    def setup(self) -> None:
        # defined in setup() (not @compact) so log_prob/sample can run as
        # alternative apply methods sharing the same parameters
        # normalise latents first: backbone outputs are O(10-100) and
        # un-normalised conditioning destabilises the NLLH optimisation
        self._cond_norm = nn.LayerNorm(epsilon=1e-5, name="cond_norm")
        self._cond_0 = nn.Dense(128, name="cond_0")
        self._cond_1 = nn.Dense(
            self.n_layers * self.nb_targets * self._params_per_dim,
            kernel_init=nn.initializers.zeros,
            name="cond_1",
        )

    def _flow_params(self, latents: Array) -> Array:
        """[B, n_layers * nb_targets * params_per_dim] raw parameters.

        The head is zero-initialised so the flow starts at the identity
        (standard-normal density) regardless of latent scale."""
        h = self._cond_norm(latents)
        return self._cond_1(nn.relu(self._cond_0(h)))

    def _conditioning(self, batch: EventBatch) -> Array:
        # every density entry point (log_prob/sample/...) funnels through
        # here, so the packed-label transport is unpacked here too (no-op
        # when labels are already dicts; __call__'s unpack then no-ops)
        batch = batch.unpack()
        latents = self.backbone(batch)
        if self.condition_columns:
            extra = [
                batch.labels[c].reshape(latents.shape[0], -1)
                for c in self.condition_columns
            ]
            latents = jnp.concatenate([latents] + extra, axis=-1)
        return latents

    def _nllh(self, params: Array, y: Array) -> Array:
        """params [B, L*T*P], y [B, T] -> negative log likelihood [B]."""
        B = y.shape[0]
        P = self._params_per_dim
        p = params.reshape(B, self.n_layers, self.nb_targets, P)
        x = y
        logdet = jnp.zeros((B, self.nb_targets))
        for layer in range(self.n_layers - 1, -1, -1):
            mu = p[:, layer, :, 0]
            log_s = jnp.clip(p[:, layer, :, 1], -7.0, 7.0)
            if self.transform == "spline":
                z, ld = _rqs_inverse_and_logdet(
                    x,
                    p[:, layer, :, 2:],
                    self.spline_bins,
                    self.spline_bound,
                )
            else:
                # bound the sinh-arcsinh skew/tail params: unbounded eps
                # or extreme delta overflow sinh() and NaN the likelihood
                eps = 2.0 * jnp.tanh(p[:, layer, :, 2])
                delta = 0.2 + jax.nn.softplus(p[:, layer, :, 3] + 0.55)
                # invert: affine then transform (forward order t∘affine)
                z, ld = _sinh_arcsinh_inv_and_logdet(x, eps, delta)
            logdet = logdet + ld
            x = (z - mu) * jnp.exp(-log_s)
            logdet = logdet - log_s
        base_logp = -0.5 * (x * x + _LOG_2PI)
        return -jnp.sum(base_logp + logdet, axis=1)

    def __call__(
        self, batch: EventBatch, inference: bool = False
    ) -> Array:
        batch = batch.unpack()  # packed-label transport (batch.py)
        latents = self._conditioning(batch)
        params = self._flow_params(latents)
        cols = []
        for label in self.target_labels:
            v = batch.labels[label]
            cols.append(v if v.ndim > 1 else v[:, None])
        y = jnp.concatenate(cols, axis=1).astype(jnp.float32)
        return self._nllh(params, y)

    def loss(self, nllh: Array) -> Array:
        return jnp.mean(nllh)

    # --- Trainer contract (same as StandardModel) ----------------------
    def loss_from_batch(self, outputs: Array, batch: EventBatch) -> Array:
        """Mean NLLH — lets ``Trainer.fit`` train flows directly
        (reference trains flows through the same fit loop via
        StandardFlowTask, ``task.py:388-470``)."""
        if batch.event_weight is not None:
            return jnp.mean(outputs * batch.event_weight)
        return jnp.mean(outputs)

    @property
    def prediction_labels(self):
        return [f"{t}_nllh" for t in self.target_labels]

    @property
    def tasks(self):
        return ()

    def _log_prob(self, batch: EventBatch, y: Array) -> Array:
        latents = self._conditioning(batch)
        params = self._flow_params(latents)
        return -self._nllh(params, y)

    def log_prob(
        self, variables, batch: EventBatch, y: Array
    ) -> Array:
        """log p(y | batch) for arbitrary y ``[B, nb_targets]``."""
        return self.apply(variables, batch, y, method=self._log_prob)

    def _params_only(self, batch: EventBatch) -> Array:
        return self._flow_params(self._conditioning(batch))

    def sample(
        self, variables, batch: EventBatch, key, n_samples: int = 100
    ) -> Array:
        """Draw samples ``[B, n_samples, nb_targets]``."""

        params = self.apply(
            variables, batch, method=self._params_only
        )
        B = params.shape[0]
        P = self._params_per_dim
        p = params.reshape(B, self.n_layers, self.nb_targets, P)
        z = jax.random.normal(
            key, (B, n_samples, self.nb_targets)
        )
        x = z
        for layer in range(self.n_layers):
            mu = p[:, None, layer, :, 0]
            log_s = jnp.clip(p[:, None, layer, :, 1], -7.0, 7.0)
            x = x * jnp.exp(log_s) + mu
            if self.transform == "spline":
                raw = jnp.broadcast_to(
                    p[:, None, layer, :, 2:],
                    (B, n_samples, self.nb_targets, P - 2),
                )
                x, _ = _rqs_forward_and_logdet(
                    x, raw, self.spline_bins, self.spline_bound
                )
            else:
                eps = 2.0 * jnp.tanh(p[:, None, layer, :, 2])
                delta = 0.2 + jax.nn.softplus(
                    p[:, None, layer, :, 3] + 0.55
                )
                x = _sinh_arcsinh(x, eps, delta)
        return x


class SphericalFlow(nn.Module):
    """Conditional density on the unit sphere S² for *directional* targets
    — the physics use case the reference covers via jammy_flows' spherical
    flows (``normalizing_flow.py:16-158`` with ``jammy_flows`` pdfs).

    The density is a conditional mixture of ``n_components`` von
    Mises–Fisher distributions whose means, concentrations and weights
    are predicted from backbone latents:

        p(y | x) = Σ_k w_k(x) · C₃(κ_k(x)) · exp(κ_k(x) μ_k(x)·y)

    Exactly normalised on S² (∫_{S²} p = 1 by construction), exact NLLH,
    trains through the same ``Trainer`` contract as
    :class:`NormalizingFlow`.  ``log C₃`` reuses the device-native vMF
    normaliser of ``training/loss_functions.py``.
    """

    backbone: GNN
    target_labels: Tuple[str, ...] = ("direction",)
    n_components: int = 8
    condition_columns: Tuple[str, ...] = ()

    def setup(self) -> None:
        self._cond_norm = nn.LayerNorm(epsilon=1e-5, name="cond_norm")
        self._cond_0 = nn.Dense(128, name="cond_0")
        # per component: 3 (mean dir) + 1 (log kappa) + 1 (logit weight)
        self._cond_1 = nn.Dense(
            self.n_components * 5,
            kernel_init=nn.initializers.zeros,
            name="cond_1",
        )

    @property
    def nb_targets(self) -> int:
        return 3

    def _mixture_params(
        self, latents: Array
    ) -> Tuple[Array, Array, Array]:
        """-> (mu [B,K,3] unit, kappa [B,K] > 0, log_w [B,K])."""
        B = latents.shape[0]
        h = self._cond_norm(latents)
        raw = self._cond_1(nn.relu(self._cond_0(h))).reshape(
            B, self.n_components, 5
        )
        # zero-init head => raw = 0: spread the component means over fixed
        # distinct anchor directions so the mixture starts near-uniform
        # but the components are distinguishable (symmetry breaking)
        anchors = self._anchor_directions(self.n_components)
        mu = raw[..., 0:3] + anchors[None, :, :]
        mu = mu / jnp.maximum(
            jnp.linalg.norm(mu, axis=-1, keepdims=True), 1e-6
        )
        # kappa in (0, ~700): softplus keeps gradients alive near 0
        kappa = jax.nn.softplus(raw[..., 3]) * 10.0 + 1e-3
        kappa = jnp.minimum(kappa, 700.0)
        log_w = jax.nn.log_softmax(raw[..., 4], axis=-1)
        return mu, kappa, log_w

    @staticmethod
    def _anchor_directions(k: int) -> Array:
        """k roughly-uniform fixed directions (Fibonacci sphere)."""
        i = np.arange(k, dtype=np.float64) + 0.5
        phi = np.pi * (1.0 + np.sqrt(5.0)) * i
        z = 1.0 - 2.0 * i / k
        r = np.sqrt(np.maximum(1.0 - z * z, 0.0))
        pts = np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=-1)
        return jnp.asarray(pts, jnp.float32)

    def _conditioning(self, batch: EventBatch) -> Array:
        # every density entry point (log_prob/sample/...) funnels through
        # here, so the packed-label transport is unpacked here too (no-op
        # when labels are already dicts; __call__'s unpack then no-ops)
        batch = batch.unpack()
        latents = self.backbone(batch)
        if self.condition_columns:
            extra = [
                batch.labels[c].reshape(latents.shape[0], -1)
                for c in self.condition_columns
            ]
            latents = jnp.concatenate([latents] + extra, axis=-1)
        return latents

    def _log_prob_from_params(
        self, mu: Array, kappa: Array, log_w: Array, y: Array
    ) -> Array:
        """y [B, 3] (unit) -> log p [B]."""
        from graphnet_tpu.training.loss_functions import log_cmk

        dot = jnp.einsum("bkd,bd->bk", mu, y)
        comp = log_cmk(3, kappa) + kappa * dot  # [B, K]
        return jax.nn.logsumexp(log_w + comp, axis=-1)

    def __call__(
        self, batch: EventBatch, inference: bool = False
    ) -> Array:
        batch = batch.unpack()  # packed-label transport (batch.py)
        mu, kappa, log_w = self._mixture_params(
            self._conditioning(batch)
        )
        label = self.target_labels[0]
        y = jnp.asarray(batch.labels[label], jnp.float32)
        y = y / jnp.maximum(
            jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-6
        )
        return -self._log_prob_from_params(mu, kappa, log_w, y)

    # --- Trainer contract ---------------------------------------------
    def loss_from_batch(self, outputs: Array, batch: EventBatch) -> Array:
        if batch.event_weight is not None:
            return jnp.mean(outputs * batch.event_weight)
        return jnp.mean(outputs)

    @property
    def prediction_labels(self):
        return [f"{t}_nllh" for t in self.target_labels]

    @property
    def tasks(self):
        return ()

    # --- density interface --------------------------------------------
    def _log_prob(self, batch: EventBatch, y: Array) -> Array:
        mu, kappa, log_w = self._mixture_params(
            self._conditioning(batch)
        )
        return self._log_prob_from_params(mu, kappa, log_w, y)

    def log_prob(self, variables, batch: EventBatch, y: Array) -> Array:
        """log p(y | batch) for unit vectors y ``[B, 3]``."""
        return self.apply(variables, batch, y, method=self._log_prob)

    def _params_method(self, batch: EventBatch):
        return self._mixture_params(self._conditioning(batch))

    def mean_direction(self, variables, batch: EventBatch) -> Array:
        """Mixture mean direction (unit) per event ``[B, 3]``."""
        mu, kappa, log_w = self.apply(
            variables, batch, method=self._params_method
        )
        m = jnp.einsum("bk,bkd->bd", jnp.exp(log_w), mu)
        return m / jnp.maximum(
            jnp.linalg.norm(m, axis=-1, keepdims=True), 1e-6
        )
