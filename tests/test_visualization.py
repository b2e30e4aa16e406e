"""Smoke tests for the host-side matplotlib visualization layer
(reference test pattern: pysteps/tests/test_plt_precipfields.py,
test_plt_motionfields.py, test_plt_animate.py)."""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _close_figs():
    # close both before and after: earlier test FILES (e.g. verification
    # plot tests) may leave figures open, and plot_precip_field draws onto
    # plt.gca() like the reference does
    plt.close("all")
    yield
    plt.close("all")


def _field(m=32, n=48, seed=0):
    rng = np.random.RandomState(seed)
    f = rng.exponential(2.0, (m, n))
    f[f < 1.0] = 0.0
    f[0, 0] = np.nan
    return f


GEODATA = {
    "x1": 0.0, "x2": 48000.0, "y1": 0.0, "y2": 32000.0,
    "yorigin": "upper", "projection": None, "unit": "mm/h",
}


@pytest.mark.parametrize(
    "ptype,units",
    [("intensity", "mm/h"), ("intensity", "dBZ"), ("depth", "mm"), ("prob", "mm/h")],
)
def test_plot_precip_field(ptype, units):
    from pysteps_tpu.visualization import plot_precip_field

    f = _field()
    if ptype == "prob":
        f = np.clip(f / 10.0, 0, 1)
    ax = plot_precip_field(f, ptype=ptype, units=units, title="t",
                           geodata=GEODATA)
    assert ax is not None
    assert len(ax.get_images()) == 1


def test_plot_precip_field_colormap_config_and_bbox():
    from pysteps_tpu.visualization import plot_precip_field
    from pysteps_tpu.visualization.precipfields import get_colormap

    cmap, norm, clevs, _ = get_colormap("intensity", "mm/h", "pysteps")

    class Cfg:
        pass

    cfg = Cfg()
    cfg.cmap, cfg.norm, cfg.clevs = cmap, norm, clevs
    ax = plot_precip_field(_field(), colormap_config=cfg,
                           bbox=(2, 2, 20, 20), axis="off", colorbar=False)
    assert ax.get_xlim() == (2.0, 20.0)

    bad = Cfg()
    with pytest.raises(ValueError, match="missing attributes"):
        plot_precip_field(_field(), colormap_config=bad)


@pytest.mark.parametrize("plot_type", ["quiver", "streamplot"])
@pytest.mark.parametrize("with_geodata", [False, True])
def test_motion_plot(plot_type, with_geodata):
    from pysteps_tpu.visualization import motion_plot

    uv = np.ones((2, 32, 48), np.float32)
    uv[1] *= -0.5
    ax = motion_plot(uv, plot_type=plot_type, step=8,
                     geodata=GEODATA if with_geodata else None)
    assert ax is not None


def test_motion_plot_invalid_type():
    from pysteps_tpu.visualization import motion_plot

    with pytest.raises(ValueError, match="unknown plot_type"):
        motion_plot(np.ones((2, 8, 8)), plot_type="arrows")


def test_animate_saves_frames(tmp_path):
    from pysteps_tpu.visualization import animate

    obs = np.stack([_field(seed=i) for i in range(2)])
    fct = np.stack([np.stack([_field(seed=10 + i) for i in range(3)])
                    for _ in range(2)])  # (E, T, m, n)
    animate(obs, precip_fct=fct, motion_field=np.ones((2, 32, 48)),
            display_animation=False, savefig=True, fig_dpi=30,
            path_outputs=str(tmp_path))
    pngs = sorted(p.name for p in tmp_path.glob("*.png"))
    assert len(pngs) == 5  # 2 obs + 3 forecast frames


def test_plot_spectrum1d():
    from pysteps_tpu.visualization import plot_spectrum1d

    freq = np.fft.fftfreq(64)[: 32]
    power = np.abs(np.fft.fft(np.random.RandomState(0).randn(64)))[:32] ** 2
    ax = plot_spectrum1d(freq, power, x_units="km", y_units="dBR",
                         wavelength_ticks=[2, 4, 8, 16], label="psd")
    assert ax.get_legend() is not None


def test_thunderstorm_track_plots():
    import pandas as pd

    from pysteps_tpu.visualization.thunderstorms import (
        plot_cart_contour,
        plot_track,
    )

    tracks = [pd.DataFrame({"cen_x": [1.0, 2.0], "cen_y": [3.0, 4.0]})]
    ax = plot_track(tracks, ref_shape=(32, 48))
    assert ax.get_xlim() == (0.0, 48.0)
    contours = [[np.array([[1, 2], [3, 4]])], np.array([[5, 6]]).reshape(1, 2)]
    ax = plot_cart_contour(contours, ref_shape=(32, 48))
    assert ax is not None


def test_verification_plots():
    from pysteps_tpu.verification import plots as vplots
    from pysteps_tpu.verification.ensscores import rankhist_init, rankhist_accum
    from pysteps_tpu.verification.probscores import (
        reldiag_init,
        reldiag_accum,
        ROC_curve_init,
        ROC_curve_accum,
    )

    rng = np.random.RandomState(1)
    obs = rng.exponential(1.0, (24, 24))
    ens = obs[None] + 0.4 * rng.randn(5, 24, 24)

    rh = rankhist_init(5, X_min=0.1)
    rankhist_accum(rh, ens, obs)
    fig, ax = plt.subplots()
    vplots.plot_rankhist(rh, ax=ax)  # state-dict form (reference contract)

    from pysteps_tpu.verification.spatialscores import (
        intensity_scale_accum,
        intensity_scale_init,
    )

    iss = intensity_scale_init("FSS", [0.5, 1.0], [2, 4])
    intensity_scale_accum(iss, ens[0], obs)
    vplots.plot_intensityscale(iss, kmperpixel=2.0, unit="mm/h")

    prob = (ens >= 1.0).mean(axis=0)
    rd = reldiag_init(1.0)
    reldiag_accum(rd, prob, obs)
    fig, ax = plt.subplots()
    vplots.plot_reldiag(rd, ax=ax)

    roc = ROC_curve_init(1.0)
    ROC_curve_accum(roc, prob, obs)
    fig, ax = plt.subplots()
    vplots.plot_ROC(roc, ax=ax, opt_prob_thr=True)
