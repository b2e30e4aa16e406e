"""RainFARM downscaling tests, mirroring the reference's suite
(pysteps/tests/test_downscaling_rainfarm.py): output shape per
ds_factor, conservation of coarse aggregates, alpha estimation/return,
plus the TPU-native batched ensemble API."""

import numpy as np
import pytest

from helpers import make_synthetic_sequence

from pysteps_tpu import downscaling
from pysteps_tpu.downscaling import rainfarm
from pysteps_tpu.utils.dimension import aggregate_fields


@pytest.fixture(scope="module")
def precip_lr():
    frames = make_synthetic_sequence(n_frames=1, shape=(64, 64), seed=3)
    return np.asarray(frames[0], np.float64)


ARGS = "alpha,ds_factor,threshold,spectral_fusion,kernel_type"


@pytest.mark.parametrize(ARGS, [
    (1.0, 1, 0, False, None),
    (1, 2, 0, False, "gaussian"),
    (1, 4, 0, False, "tophat"),
    (1, 4, 0, True, "uniform"),
])
def test_rainfarm_shape(precip_lr, alpha, ds_factor, threshold,
                        spectral_fusion, kernel_type):
    out = downscaling.get_method("rainfarm")(
        precip_lr, alpha=alpha, ds_factor=ds_factor, threshold=threshold,
        spectral_fusion=spectral_fusion, kernel_type=kernel_type, seed=4,
    )
    assert np.asarray(out).shape == (
        precip_lr.shape[0] * ds_factor, precip_lr.shape[1] * ds_factor
    )


@pytest.mark.parametrize(ARGS, [
    (1.0, 1, 0, False, None),
    (1, 2, 0, False, None),
    (1, 4, 0, False, None),
    (1, 4, 0, True, None),
])
def test_rainfarm_aggregate(precip_lr, alpha, ds_factor, threshold,
                            spectral_fusion, kernel_type):
    """Aggregating the downscaled field back to the coarse grid must
    reproduce the input (reference: test_downscaling_rainfarm.py:74-103;
    f32 device arithmetic -> relative tolerance instead of the
    reference's f64 decimal=6)."""
    out = downscaling.get_method("rainfarm")(
        precip_lr, alpha=alpha, ds_factor=ds_factor, threshold=threshold,
        spectral_fusion=spectral_fusion, kernel_type=kernel_type, seed=4,
    )
    agg = np.asarray(aggregate_fields(np.asarray(out), ds_factor, axis=(0, 1)))
    expected = precip_lr.copy()
    expected[expected < threshold] = 0.0
    scale = max(float(np.max(np.abs(expected))), 1e-6)
    assert np.allclose(agg, expected, atol=2e-3 * scale)


@pytest.mark.parametrize("alpha", [1.0, None])
def test_rainfarm_alpha(precip_lr, alpha):
    out, got_alpha = downscaling.get_method("rainfarm")(
        precip_lr, alpha=alpha, ds_factor=2, threshold=0,
        return_alpha=True, seed=4,
    )
    if alpha is None:
        assert np.isfinite(got_alpha) and got_alpha != 1.0
    else:
        assert got_alpha == alpha


def test_rainfarm_ensemble(precip_lr):
    """Batched API: shape, per-member conservation, member diversity."""
    ens = np.asarray(rainfarm.downscale_ensemble(precip_lr, 4, 6, seed=9))
    assert ens.shape == (6, precip_lr.shape[0] * 4, precip_lr.shape[1] * 4)
    scale = max(float(np.max(np.abs(precip_lr))), 1e-6)
    for j in range(6):
        agg = np.asarray(aggregate_fields(ens[j], 4, axis=(0, 1)))
        assert np.allclose(agg, precip_lr, atol=2e-3 * scale)
    assert np.std(ens[0] - ens[1]) > 1e-3


def test_rainfarm_single_matches_ensemble_law(precip_lr):
    """Same seed -> downscale() and member machinery share the core."""
    single = np.asarray(rainfarm.downscale(precip_lr, 2, seed=5))
    assert np.isfinite(single).all()
    assert (single >= 0).all() == (precip_lr >= 0).all()
