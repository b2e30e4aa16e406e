"""SAL, lifetime, and plot smoke tests."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from pysteps_tpu.verification import lifetime, plots, probscores, salscores


def _storm(centers, shape=(128, 128), peak=50.0, scale=8.0):
    yy, xx = np.meshgrid(np.arange(shape[0]), np.arange(shape[1]), indexing="ij")
    f = np.zeros(shape)
    for cy, cx in centers:
        f += peak * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * scale**2))
    return f


def test_sal_perfect_forecast():
    obs = _storm([(40, 40), (80, 90)])
    s, a, l = salscores.sal(obs.copy(), obs.copy())
    assert abs(a) < 1e-6
    assert abs(l) < 1e-6
    assert abs(s) < 1e-6 or np.isnan(s) is False


def test_sal_amplitude_bias():
    obs = _storm([(60, 60)])
    pred = obs * 2.0
    _, a, _ = salscores.sal(pred, obs)
    assert a > 0.5  # overforecast amplitude


def test_sal_location_shift():
    obs = _storm([(40, 40)])
    pred = _storm([(80, 90)])
    _, _, l = salscores.sal(pred, obs)
    assert l > 0.2


def test_lifetime_rules():
    ts = np.arange(0, 120, 5.0)
    corr = np.exp(-ts / 30.0)
    lf = lifetime.lifetime(corr, ts, rule="1/e")
    np.testing.assert_allclose(lf, 30.0, atol=2.5)
    lf_trapz = lifetime.lifetime(corr, ts, rule="trapz")
    assert 25 < lf_trapz < 35


def test_plots_smoke(tmp_path):
    rng = np.random.RandomState(0)
    ax = plots.plot_rankhist(np.ones(11) / 11)
    assert ax is not None
    obs = rng.rand(500) > 0.5
    P = np.clip(obs * 0.6 + rng.rand(500) * 0.4, 0, 1)
    roc = probscores.ROC_curve(P, obs.astype(float), 0.5)
    ax = plots.plot_ROC(roc)
    assert ax is not None
    rd = probscores.reldiag(P, obs.astype(float), 0.5)
    ax = plots.plot_reldiag(rd)
    assert ax is not None


def test_visualization_smoke():
    from pysteps_tpu import visualization

    field = _storm([(50, 50)]) / 2.0
    ax = visualization.plot_precip_field(field, units="mm/h")
    assert ax is not None
    uv = np.ones((2, 128, 128))
    ax = visualization.quiver(uv)
    assert ax is not None
    psd = np.abs(np.fft.rfft(field[64])) ** 2
    freq = np.fft.rfftfreq(128)
    ax = visualization.plot_spectrum1d(freq, psd)
    assert ax is not None
