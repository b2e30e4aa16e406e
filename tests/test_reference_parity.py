"""Direct numerical parity against the reference implementation.

Imports the reference pysteps (NumPy/CPU, via benchtools' import stubs)
and compares component outputs on identical inputs.  These are the
strongest parity checks in the suite: not "within a skill bound" but
"the same numbers".
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from helpers import make_synthetic_sequence

pytestmark = pytest.mark.parity

pysteps = None


def setup_module():
    global pysteps
    import benchtools

    try:
        pysteps = benchtools.import_reference_pysteps()
    except Exception as exc:  # noqa: BLE001
        pytest.skip(f"reference pysteps unavailable: {exc}")


@pytest.fixture(scope="module")
def field_db():
    frames = make_synthetic_sequence(
        n_frames=3, shape=(128, 128), velocity=(2.0, 1.0), seed=9
    )
    db = 10.0 * np.log10(np.maximum(frames, 0.1))
    rng = np.random.RandomState(1)
    return (db + 0.05 * rng.randn(*db.shape)).astype(np.float64)


def test_bandpass_filter_weights_match(field_db):
    from pysteps_tpu.cascade.bandpass_filters import filter_gaussian

    ref = pysteps.cascade.bandpass_filters.filter_gaussian((128, 128), 6)
    mine = filter_gaussian((128, 128), 6)
    np.testing.assert_allclose(
        np.asarray(mine["weights_2d"]), ref["weights_2d"], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(mine["central_wavenumbers"]),
        np.asarray(ref["central_wavenumbers"]),
        rtol=1e-5,
    )


def test_cascade_decomposition_matches(field_db):
    from pysteps_tpu.cascade.bandpass_filters import filter_gaussian
    from pysteps_tpu.cascade.decomposition import decomposition_fft

    f = field_db[-1]
    ref_bp = pysteps.cascade.bandpass_filters.filter_gaussian((128, 128), 6)
    ref = pysteps.cascade.decomposition.decomposition_fft(
        f, ref_bp, normalize=True, compute_stats=True
    )
    mine = decomposition_fft(f, filter_gaussian((128, 128), 6), normalize=True)
    np.testing.assert_allclose(
        np.asarray(mine["means"]), ref["means"], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(mine["stds"]), ref["stds"], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(mine["cascade_levels"]),
        ref["cascade_levels"],
        atol=2e-3,
    )


def test_ar_estimation_matches(field_db):
    from pysteps_tpu.timeseries import autoregression, correlation

    x = np.stack([field_db[0], field_db[1], field_db[2]])
    gamma_ref = pysteps.timeseries.correlation.temporal_autocorrelation(x)
    gamma_mine = [
        float(g) for g in correlation.temporal_autocorrelation(x)
    ]
    np.testing.assert_allclose(gamma_mine, gamma_ref, atol=1e-4)

    gamma = np.asarray(gamma_ref)
    phi_ref = pysteps.timeseries.autoregression.estimate_ar_params_yw(gamma)
    phi_mine = np.asarray(
        autoregression.estimate_ar_params_yw(gamma[None])
    )[0]
    np.testing.assert_allclose(phi_mine, phi_ref, atol=1e-3)


def test_semilagrangian_extrapolation_matches(field_db):
    from pysteps_tpu.extrapolation.semilagrangian import extrapolate

    f = field_db[-1]
    velocity = np.zeros((2, 128, 128))
    velocity[0], velocity[1] = 1.3, -0.7
    ref = pysteps.extrapolation.semilagrangian.extrapolate(
        f, velocity, 3, outval=np.nanmin(f)
    )
    mine = np.asarray(
        extrapolate(f, velocity, 3, outval=float(np.nanmin(f)))
    )
    # interior agreement (boundary fill differs at machine level)
    np.testing.assert_allclose(
        mine[:, 8:-8, 8:-8], ref[:, 8:-8, 8:-8], atol=2e-2
    )


def test_cdf_matching_matches(field_db):
    from pysteps_tpu.postprocessing.probmatching import (
        nonparam_match_empirical_cdf,
    )

    rng = np.random.RandomState(3)
    first = field_db[-1] + rng.randn(128, 128)
    target = field_db[-2]
    ref = pysteps.postprocessing.probmatching.nonparam_match_empirical_cdf(
        first, target
    )
    mine = np.asarray(nonparam_match_empirical_cdf(first, target))
    # identical up to tie-breaking between equal-valued pixels
    assert np.mean(np.abs(mine - ref) < 1e-3) > 0.999
    np.testing.assert_allclose(np.sort(mine.ravel()), np.sort(ref.ravel()), atol=1e-3)


def test_rapsd_matches(field_db):
    from pysteps_tpu.utils.spectral import rapsd

    f = field_db[-1]
    ref = pysteps.utils.spectral.rapsd(f, fft_method=np.fft)
    mine = np.asarray(rapsd(f))
    np.testing.assert_allclose(mine, ref, rtol=1e-3)

    # fft_method=None convention: input is the centred PSD
    psd2d = np.abs(np.fft.fftshift(np.fft.fft2(f))) ** 2 / f.size
    ref2 = pysteps.utils.spectral.rapsd(psd2d)
    mine2 = np.asarray(rapsd(psd2d, fft_method=None))
    np.testing.assert_allclose(mine2, ref2, rtol=1e-3)


def test_dB_transform_matches(field_db):
    from pysteps_tpu.utils.transformation import dB_transform

    frames = make_synthetic_sequence(
        n_frames=2, shape=(64, 64), velocity=(1.0, 0.0), seed=2
    )
    meta = {"unit": "mm/h", "transform": None, "zerovalue": 0.0, "threshold": 0.1}
    ref, ref_meta = pysteps.utils.transformation.dB_transform(
        frames.copy(), dict(meta), threshold=0.1, zerovalue=-15.0
    )
    mine, mine_meta = dB_transform(
        frames.copy(), dict(meta), threshold=0.1, zerovalue=-15.0
    )
    np.testing.assert_allclose(np.asarray(mine), ref, atol=1e-4)
    assert mine_meta["zerovalue"] == ref_meta["zerovalue"]


def test_fss_matches(field_db):
    from pysteps_tpu.verification.spatialscores import fss

    obs = np.maximum(field_db[-1], -15.0)
    fx = np.maximum(field_db[-2], -15.0)
    ref = pysteps.verification.spatialscores.fss(fx, obs, -5.0, 8)
    mine = float(fss(fx, obs, -5.0, 8))
    np.testing.assert_allclose(mine, ref, atol=1e-4)


def test_detcat_scores_match(field_db):
    from pysteps_tpu.verification.detcatscores import det_cat_fct

    obs = field_db[-1]
    fx = field_db[-2]
    ref = pysteps.verification.detcatscores.det_cat_fct(
        fx, obs, -5.0, ["CSI", "POD", "FAR", "BIAS"]
    )
    mine = det_cat_fct(fx, obs, -5.0, ["CSI", "POD", "FAR", "BIAS"])
    for k in ref:
        np.testing.assert_allclose(float(mine[k]), ref[k], atol=1e-6)


def test_crps_matches(field_db):
    from pysteps_tpu.verification.probscores import CRPS

    rng = np.random.RandomState(4)
    ens = field_db[-1][None] + rng.randn(6, 128, 128)
    obs = field_db[-1]
    ref = pysteps.verification.probscores.CRPS(ens, obs)
    mine = float(CRPS(ens, obs))
    np.testing.assert_allclose(mine, ref, rtol=1e-4)


def test_excprob_matches(field_db):
    from pysteps_tpu.postprocessing.ensemblestats import excprob

    rng = np.random.RandomState(5)
    ens = field_db[-1][None] + rng.randn(6, 128, 128)
    ref = pysteps.postprocessing.ensemblestats.excprob(ens, -5.0)
    mine = np.asarray(excprob(ens, -5.0))
    np.testing.assert_allclose(mine, ref, atol=1e-6)


def test_zr_conversion_matches():
    from pysteps_tpu.utils.conversion import to_rainrate

    refl = np.linspace(5.0, 55.0, 64).reshape(8, 8)
    meta = {
        "unit": "dBZ", "transform": "dB", "zerovalue": 0.0,
        "threshold": 5.0, "zr_a": 200.0, "zr_b": 1.6,
        "accutime": 5,
    }
    ref, _ = pysteps.utils.conversion.to_rainrate(refl.copy(), dict(meta))
    mine, _ = to_rainrate(refl.copy(), dict(meta))
    np.testing.assert_allclose(np.asarray(mine), ref, rtol=1e-5)


def test_tapering_matches():
    from pysteps_tpu.utils.tapering import compute_window_function

    for func in ("hann", "tukey"):
        ref = pysteps.utils.tapering.compute_window_function(64, 48, func)
        mine = np.asarray(compute_window_function(64, 48, func))
        np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_masked_tapering_matches():
    from pysteps_tpu.utils.tapering import compute_mask_window_function

    # circular radar coverage on a rectangular grid
    yy, xx = np.mgrid[0:64, 0:80]
    mask = (yy - 32.0) ** 2 + (xx - 40.0) ** 2 < 30.0**2
    ref = pysteps.utils.tapering.compute_mask_window_function(
        mask, "tukey", r_max=8.0
    )
    mine = np.asarray(compute_mask_window_function(mask, "tukey", r_max=8.0))
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_idw_interpolation_matches():
    from pysteps_tpu.utils.interpolate import idwinterp2d

    rng = np.random.RandomState(6)
    xy = rng.rand(30, 2) * 63
    values = rng.randn(30, 2)
    xgrid = np.arange(64, dtype=float)
    ygrid = np.arange(64, dtype=float)
    ref = pysteps.utils.interpolate.idwinterp2d(xy, values, xgrid, ygrid)
    mine = np.asarray(idwinterp2d(xy, values, xgrid, ygrid))
    np.testing.assert_allclose(mine, ref, atol=1e-3)


def test_boxcox_transform_matches():
    from pysteps_tpu.utils.transformation import boxcox_transform

    frames = make_synthetic_sequence(
        n_frames=2, shape=(64, 64), velocity=(1.0, 0.0), seed=8
    )
    meta = {"unit": "mm/h", "transform": None, "zerovalue": 0.0, "threshold": 0.1}
    ref, ref_meta = pysteps.utils.transformation.boxcox_transform(
        frames.copy(), dict(meta), Lambda=0.5, threshold=0.1
    )
    mine, mine_meta = boxcox_transform(
        frames.copy(), dict(meta), Lambda=0.5, threshold=0.1
    )
    np.testing.assert_allclose(np.asarray(mine), ref, atol=1e-4)


def test_centred_coord_array_matches():
    from pysteps_tpu.utils.arrays import compute_centred_coord_array

    for m, n in ((8, 8), (9, 7), (16, 9)):
        ry, rx = pysteps.utils.arrays.compute_centred_coord_array(m, n)
        my, mx = compute_centred_coord_array(m, n)
        np.testing.assert_array_equal(np.asarray(my), ry)
        np.testing.assert_array_equal(np.asarray(mx), rx)
