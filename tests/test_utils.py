"""Exact-value tests for transforms, conversions, dimension ops and
spectral utilities (reference strategy: pysteps/tests/test_utils_*.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pysteps_tpu.utils import (
    conversion,
    dimension,
    interpolate,
    spectral,
    tapering,
    transformation,
)


def test_db_transform_roundtrip():
    R = np.array([0.0, 0.05, 0.1, 1.0, 10.0, 100.0])
    meta = {"transform": None, "unit": "mm/h", "threshold": 0.1, "zerovalue": 0.0}
    Rdb, meta_db = transformation.dB_transform(R, meta)
    assert meta_db["transform"] == "dB"
    np.testing.assert_allclose(float(Rdb[3]), 0.0, atol=1e-6)  # 10log10(1)=0
    np.testing.assert_allclose(float(Rdb[4]), 10.0, atol=1e-5)
    # below threshold -> zerovalue = threshold_dB - 5
    np.testing.assert_allclose(float(Rdb[0]), meta_db["zerovalue"])
    Rback, meta_back = transformation.dB_transform(Rdb, meta_db, inverse=True)
    np.testing.assert_allclose(np.asarray(Rback[2:]), R[2:], rtol=1e-5)
    assert meta_back["transform"] is None


def test_boxcox_roundtrip():
    R = np.array([0.5, 1.0, 2.0, 8.0])
    meta = {"transform": None, "threshold": 0.1, "zerovalue": 0.0}
    Rt, meta_t = transformation.boxcox_transform(R, meta, Lambda=0.5)
    Rb, _ = transformation.boxcox_transform(Rt, meta_t, Lambda=0.5, inverse=True)
    np.testing.assert_allclose(np.asarray(Rb), R, rtol=1e-5)


def test_nq_transform():
    rng = np.random.RandomState(0)
    R = rng.gamma(2, 2, 1000).astype(np.float32)
    meta = {"transform": None, "threshold": 0.1, "zerovalue": float(R.min())}
    Rt, meta_t = transformation.NQ_transform(R, meta)
    # transformed data approximately standard normal
    assert abs(float(jnp.mean(Rt))) < 0.1
    assert 0.8 < float(jnp.std(Rt)) < 1.2
    Rb, _ = transformation.NQ_transform(Rt, meta_t, inverse=True)
    # the minimum ("zero rain") value maps to 0 in norm space by the NQT
    # contract and cannot round-trip; exclude it
    keep = R > R.min()
    np.testing.assert_allclose(
        np.asarray(Rb)[keep], R[keep], rtol=1e-3, atol=1e-3
    )


def test_conversion_chain():
    R = np.array([1.0, 5.0, 20.0])
    meta = {
        "transform": None, "unit": "mm/h", "threshold": 0.1,
        "zerovalue": 0.0, "accutime": 5, "zr_a": 200.0, "zr_b": 1.6,
    }
    Rd, meta_d = conversion.to_raindepth(R, meta)
    np.testing.assert_allclose(np.asarray(Rd), R * 5 / 60.0, rtol=1e-6)
    Rr, meta_r = conversion.to_rainrate(Rd, meta_d)
    np.testing.assert_allclose(np.asarray(Rr), R, rtol=1e-5)
    Rz, meta_z = conversion.to_reflectivity(R, meta)
    assert meta_z["unit"] == "dBZ"
    # Z = 200 R^1.6; dBZ = 10 log10 Z
    np.testing.assert_allclose(
        np.asarray(Rz), 10 * np.log10(200.0 * R**1.6), rtol=1e-5
    )


def test_aggregate_fields():
    x = np.arange(16, dtype=float).reshape(4, 4)
    out = dimension.aggregate_fields(x, 2, axis=0, method="mean")
    assert out.shape == (2, 4)
    np.testing.assert_allclose(np.asarray(out[0]), (x[0] + x[1]) / 2)
    out2 = dimension.aggregate_fields(x, [2, 2], axis=[0, 1], method="sum")
    assert out2.shape == (2, 2)
    np.testing.assert_allclose(float(out2[0, 0]), x[:2, :2].sum())


def test_square_domain_roundtrip():
    rng = np.random.RandomState(0)
    R = rng.rand(3, 60, 100).astype(np.float32)
    meta = {}
    Rs, meta_s = dimension.square_domain(R, meta, "pad")
    assert Rs.shape == (3, 100, 100)
    Rb, _ = dimension.square_domain(Rs, meta_s, inverse=True)
    np.testing.assert_allclose(np.asarray(Rb), R)


def test_rapsd_slope():
    # power-law field: slope of rapsd should be near the synthesis slope
    rng = np.random.RandomState(1)
    n = 256
    noise = rng.randn(n, n)
    fy = np.fft.fftfreq(n)[:, None]
    fx = np.fft.rfftfreq(n)[None, :]
    r = np.sqrt(fy**2 + fx**2); r[0, 0] = 1
    filt = r ** (-1.5); filt[0, 0] = 0
    field = np.fft.irfft2(np.fft.rfft2(noise) * filt, s=(n, n))
    psd = np.asarray(spectral.rapsd(jnp.asarray(field)))
    k = np.arange(len(psd))
    slope = np.polyfit(np.log(k[2:80]), np.log(psd[2:80]), 1)[0]
    assert -3.6 < slope < -2.4  # power slope = 2*amplitude slope = -3


def test_tapering_windows():
    w = tapering.compute_window_function(64, 64, "hann")
    assert w.shape == (64, 64)
    assert w.max() <= 1.0 and w.min() >= 0.0
    assert w[0, 0] == 0.0  # corners outside radius -> 0
    wt = tapering.compute_window_function(64, 64, "tukey", alpha=0.3)
    assert wt[32, 32] == 1.0


def test_idw_interpolation_recovers_plane():
    rng = np.random.RandomState(2)
    xy = rng.rand(200, 2) * 63
    vals = 2.0 * xy[:, 0] + 0.5 * xy[:, 1]
    grid = interpolate.idwinterp2d(
        xy, vals, np.arange(64.0), np.arange(64.0), k=20
    )
    truth = 2.0 * np.arange(64)[None, :] + 0.5 * np.arange(64)[:, None]
    err = np.abs(np.asarray(grid) - truth)[8:-8, 8:-8]
    assert err.mean() < 3.0


def test_spectral_mean_std_match_spatial():
    rng = np.random.RandomState(3)
    f = rng.randn(64, 64).astype(np.float32)
    F = jnp.fft.rfft2(jnp.asarray(f))
    np.testing.assert_allclose(
        float(spectral.mean(F, (64, 64))), f.mean(), atol=1e-5
    )
    np.testing.assert_allclose(
        float(spectral.std(F, (64, 64))), f.std(), rtol=1e-4
    )


def test_profiling_helpers(tmp_path):
    import jax.numpy as jnp

    from pysteps_tpu.utils import profiling

    t = profiling.Timer()
    with t("phase_a"):
        pass
    with t("phase_a"):
        pass
    assert "phase_a" in t.totals and t.totals["phase_a"] >= 0
    assert "phase_a" in t.report()

    with profiling.annotate("test-region"):
        x = jnp.ones(4) + 1
    assert float(x.sum()) == 8.0

    stats = profiling.device_memory_stats()
    assert isinstance(stats, dict)


def test_aggregate_fields_scalar_window_multi_axis():
    from pysteps_tpu.utils.dimension import aggregate_fields

    data = np.arange(16.0).reshape(4, 4)
    out = np.asarray(aggregate_fields(data, 2, axis=(0, 1)))
    assert out.shape == (2, 2)
    np.testing.assert_allclose(out[0, 0], np.mean([0, 1, 4, 5]))
