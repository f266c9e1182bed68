"""Loss function tests with analytic/scipy references.

Mirrors the reference's test strategy (SURVEY.md §4): log-cosh vs direct
evaluation, exact vMF normaliser vs scipy Bessel and the closed-form m=3
expression, gradients vs the analytic Bessel ratio.
"""

import numpy as np
import scipy.special
import pytest

import jax
import jax.numpy as jnp

from graphnet_tpu.training.loss_functions import (
    BinaryCrossEntropyLoss,
    CrossEntropyLoss,
    EnsembleLoss,
    EuclideanDistanceLoss,
    LogCoshLoss,
    MSELoss,
    RMSELoss,
    RMSEVonMisesFisher3DLoss,
    VonMisesFisher2DLoss,
    VonMisesFisher3DLoss,
    bessel_ratio,
    log_cmk,
    log_cmk_exact,
)


def scipy_log_cmk(m, kappa):
    return (
        (m / 2.0 - 1.0) * np.log(kappa)
        - np.log(scipy.special.iv(m / 2.0 - 1.0, kappa))
        - (m / 2.0) * np.log(2 * np.pi)
    )


class TestLogCMK:
    @pytest.mark.parametrize("m", [2, 3, 4, 5])
    def test_exact_vs_scipy(self, m):
        kappa = np.concatenate(
            [np.linspace(0.01, 10, 50), np.linspace(10, 99, 30)]
        ).astype(np.float32)
        got = np.asarray(log_cmk_exact(m, jnp.asarray(kappa)))
        exp = scipy_log_cmk(m, kappa.astype(np.float64))
        np.testing.assert_allclose(got, exp, rtol=2e-4, atol=2e-4)

    def test_m3_closed_form(self):
        # Wikipedia: C_3(k) = k / (4 pi sinh k)
        kappa = np.linspace(0.1, 50, 40).astype(np.float32)
        got = np.asarray(log_cmk_exact(3, jnp.asarray(kappa)))
        exp = np.log(kappa / (4 * np.pi * np.sinh(kappa.astype(np.float64))))
        np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-4)

    def test_small_kappa_stable(self):
        for m in (2, 3):
            v = np.asarray(log_cmk_exact(m, jnp.asarray([0.0, 1e-8, 1e-4])))
            assert np.isfinite(v).all()
            # C_m(0) = Gamma(m/2) / (2 pi^{m/2}) (uniform density on sphere)
            exp = np.log(
                scipy.special.gamma(m / 2.0) / (2 * np.pi ** (m / 2.0))
            )
            np.testing.assert_allclose(v[0], exp, rtol=1e-4)

    @pytest.mark.parametrize("m", [2, 3])
    def test_switch_continuity(self, m):
        # the shifted approx must coincide with the exact branch at the
        # switch point, so steps across it match the local slope (~ -1)
        k = jnp.asarray([100.0 - 1e-3, 100.0 + 1e-3])
        v = np.asarray(log_cmk(m, k))
        assert abs(v[1] - v[0]) < 1e-2

    @pytest.mark.parametrize("m", [2, 3])
    def test_gradient_matches_bessel_ratio(self, m):
        # d/dk (-log C_m) = I_{m/2}/I_{m/2-1}  (reference LogCMK.backward)
        kappa = np.linspace(0.2, 90, 25).astype(np.float32)
        g = np.asarray(
            jax.vmap(jax.grad(lambda k: -log_cmk_exact(m, k)))(
                jnp.asarray(kappa)
            )
        )
        exp = scipy.special.iv(m / 2.0, kappa) / scipy.special.iv(
            m / 2.0 - 1.0, kappa
        )
        np.testing.assert_allclose(g, exp, rtol=1e-3, atol=1e-3)
        got_ratio = np.asarray(bessel_ratio(m, jnp.asarray(kappa)))
        np.testing.assert_allclose(got_ratio, exp, rtol=1e-4, atol=1e-4)

    def test_large_kappa_finite_grad(self):
        for m in (2, 3):
            g = jax.grad(lambda k: log_cmk(m, k))(jnp.float32(5000.0))
            assert np.isfinite(g)


class TestLosses:
    def test_log_cosh_vs_direct(self):
        x = np.linspace(-5, 5, 51).astype(np.float32)
        got = np.asarray(LogCoshLoss._log_cosh(jnp.asarray(x)))
        np.testing.assert_allclose(
            got, np.log(np.cosh(x)), rtol=1e-5, atol=1e-5
        )

    def test_mse_rmse(self):
        p = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
        t = jnp.asarray([[0.0, 0.0], [3.0, 0.0]])
        np.testing.assert_allclose(
            np.asarray(MSELoss()(p, t, return_elements=True)), [2.5, 8.0]
        )
        np.testing.assert_allclose(
            np.asarray(RMSELoss()(p, t, return_elements=True)),
            np.sqrt([2.5, 8.0]),
            rtol=1e-6,
        )

    def test_cross_entropy_options(self):
        logits = jnp.asarray([[2.0, 0.0, 0.0], [0.0, 2.0, 0.0]])
        # int options
        ce = CrossEntropyLoss(3)
        l_int = np.asarray(
            ce(logits, jnp.asarray([0, 1]), return_elements=True)
        )
        # list options: pid values [12, 13, 16]
        ce_list = CrossEntropyLoss([12, 13, 16])
        l_list = np.asarray(
            ce_list(logits, jnp.asarray([12, 13]), return_elements=True)
        )
        np.testing.assert_allclose(l_int, l_list, rtol=1e-6)
        # dict options: {12: 0, -12: 0, 13: 1}
        ce_dict = CrossEntropyLoss({12: 0, -12: 0, 13: 1, -13: 1, 16: 2})
        l_dict = np.asarray(
            ce_dict(logits, jnp.asarray([-12, -13]), return_elements=True)
        )
        np.testing.assert_allclose(l_int, l_dict, rtol=1e-6)

    def test_bce(self):
        p = jnp.asarray([0.9, 0.1])
        t = jnp.asarray([1.0, 0.0])
        got = np.asarray(BinaryCrossEntropyLoss()(p, t, return_elements=True))
        np.testing.assert_allclose(got, -np.log([0.9, 0.9]), rtol=1e-5)

    def test_vmf3d_value(self):
        # prediction = kappa * mu with mu == target => loss = -logC3(k) - k
        kappa = 5.0
        mu = np.array([0.0, 0.0, 1.0], dtype=np.float32)
        pred = jnp.asarray([[0.0, 0.0, 1.0, kappa]])
        targ = jnp.asarray([mu])
        got = float(VonMisesFisher3DLoss()(pred, targ))
        exp = -scipy_log_cmk(3, np.float64(kappa)) - kappa
        np.testing.assert_allclose(got, exp, rtol=1e-4)

    def test_vmf2d_value(self):
        kappa = 3.0
        pred = jnp.asarray([[0.7, kappa]])
        targ = jnp.asarray([[0.7]])
        got = float(VonMisesFisher2DLoss()(pred, targ))
        exp = -scipy_log_cmk(2, np.float64(kappa)) - kappa
        np.testing.assert_allclose(got, exp, rtol=1e-4)

    def test_euclidean(self):
        p = jnp.asarray([[1.0, 0.0, 0.0]])
        t = jnp.asarray([[0.0, 0.0, 0.0]])
        assert float(EuclideanDistanceLoss()(p, t)) == pytest.approx(1.0)

    def test_rmse_vmf_ensemble(self):
        pred = jnp.asarray([[0.1, 0.2, 0.9, 2.0]])
        targ = jnp.asarray([[0.0, 0.0, 1.0]])
        combo = float(RMSEVonMisesFisher3DLoss(vmfs_factor=0.05)(pred, targ))
        rmse = float(RMSELoss()(pred[:, :3], targ))
        vmf = float(VonMisesFisher3DLoss()(pred, targ))
        np.testing.assert_allclose(combo, rmse + 0.05 * vmf, rtol=1e-5)

    def test_weights(self):
        p = jnp.asarray([[1.0], [1.0]])
        t = jnp.asarray([[0.0], [0.0]])
        w = jnp.asarray([1.0, 3.0])
        got = float(MSELoss()(p, t, weights=w))
        assert got == pytest.approx(2.0)
