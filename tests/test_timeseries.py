import jax.numpy as jnp
import numpy as np
import pytest

from pysteps_tpu.timeseries import autoregression, correlation


def test_yule_walker_ar2_known_values():
    # AR(2) with gamma1=0.9, gamma2=0.8: phi from the 2x2 Toeplitz solve
    gamma = jnp.array([0.9, 0.8])
    phi = np.asarray(autoregression.estimate_ar_params_yw(gamma))
    G = np.array([[1.0, 0.9], [0.9, 1.0]])
    expected = np.linalg.solve(G, np.array([0.9, 0.8]))
    np.testing.assert_allclose(phi[:2], expected, atol=1e-5)
    c = 1 - 0.9 * expected[0] - 0.8 * expected[1]
    np.testing.assert_allclose(phi[2], np.sqrt(c), atol=1e-5)


def test_yule_walker_recovers_simulated_ar2():
    rng = np.random.RandomState(0)
    phi_true = np.array([1.2, -0.4])
    n = 200000
    x = np.zeros(n)
    for t in range(2, n):
        x[t] = phi_true[0] * x[t - 1] + phi_true[1] * x[t - 2] + rng.randn()
    gamma = [np.corrcoef(x[2:], x[1:-1])[0, 1], np.corrcoef(x[2:], x[:-2])[0, 1]]
    phi = np.asarray(autoregression.estimate_ar_params_yw(jnp.array(gamma)))
    np.testing.assert_allclose(phi[:2], phi_true, atol=0.02)


def test_iterate_ar_model_batched():
    # window (levels, p, m, n); each level with its own phi
    x = jnp.ones((3, 2, 4, 4))
    phi = jnp.array([[0.5, 0.3, 0.1], [0.2, 0.7, 0.0], [0.1, 0.1, 1.0]])
    eps = jnp.ones((3, 4, 4))
    out = autoregression.iterate_ar_model(x, phi, eps=eps)
    assert out.shape == (3, 2, 4, 4)
    # x_new = phi1*x_t + phi2*x_{t-1} + phi_pert*eps, all inputs ones
    expected = phi[:, 0] + phi[:, 1] + phi[:, 2]
    np.testing.assert_allclose(
        np.asarray(out[:, -1, 0, 0]), np.asarray(expected), atol=1e-6
    )


def test_iterate_matches_reference_ordering():
    # verify lag ordering: phi[0] applies to the most recent state
    x = jnp.stack([jnp.full((1, 2, 2), 1.0), jnp.full((1, 2, 2), 2.0)], axis=1)[0]
    # window: oldest=1, newest=2; shape (p=2, 2, 2)
    phi = jnp.array([0.9, 0.0, 0.0])  # only lag-1 (newest) matters
    out = autoregression.iterate_ar_model(x, phi)
    np.testing.assert_allclose(np.asarray(out[-1]), 0.9 * 2.0, atol=1e-6)
    phi = jnp.array([0.0, 0.5, 0.0])  # only lag-2 (oldest)
    out = autoregression.iterate_ar_model(x, phi)
    np.testing.assert_allclose(np.asarray(out[-1]), 0.5 * 1.0, atol=1e-6)


def test_adjust_lag2():
    g2 = autoregression.adjust_lag2_corrcoef1(0.9, 0.1)
    assert float(g2) >= 2 * 0.81 - 1
    g2b = autoregression.adjust_lag2_corrcoef2(0.9, 0.5)
    assert np.isfinite(float(g2b))


def test_stationarity_test():
    assert autoregression.test_ar_stationarity([0.5, 0.2])
    assert not autoregression.test_ar_stationarity([1.2, 0.0])


def test_temporal_autocorrelation():
    rng = np.random.RandomState(1)
    base = rng.randn(64, 64)
    x = jnp.stack([base + 0.1 * rng.randn(64, 64) for _ in range(3)])
    gamma = correlation.temporal_autocorrelation(x)
    assert len(gamma) == 2
    assert 0.9 < float(gamma[0]) <= 1.0


def test_temporal_autocorrelation_spectral_matches_spatial():
    rng = np.random.RandomState(2)
    x = rng.randn(3, 64, 64).astype(np.float32)
    g_spatial = correlation.temporal_autocorrelation(jnp.asarray(x))
    xf = jnp.stack([jnp.fft.rfft2(jnp.asarray(f)) for f in x])
    g_spectral = correlation.temporal_autocorrelation(
        xf, domain="spectral", x_shape=(64, 64)
    )
    np.testing.assert_allclose(
        [float(g) for g in g_spatial], [float(g) for g in g_spectral], atol=1e-3
    )


def test_localized_ar_estimation():
    gamma = [jnp.full((8, 8), 0.9), jnp.full((8, 8), 0.8)]
    phi = autoregression.estimate_ar_params_yw_localized(gamma)
    assert phi.shape == (3, 8, 8)
    G = np.array([[1.0, 0.9], [0.9, 1.0]])
    expected = np.linalg.solve(G, np.array([0.9, 0.8]))
    np.testing.assert_allclose(np.asarray(phi[0]), expected[0], atol=1e-4)
