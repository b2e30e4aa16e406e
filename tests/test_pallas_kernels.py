"""CPU coverage for the TPU Pallas kernels via the Pallas interpreter.

The hot-loop kernels (PWL CDF matching, rim mask, matmul iDFT) are gated
behind ``_use_pallas()`` and never execute in the CPU test suite; these
tests run them in interpret mode against their exact XLA counterparts so
kernel regressions are caught without TPU hardware.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pysteps_tpu.ops import pallas_dilate, pallas_histmatch
from pysteps_tpu.nowcasts import utils as nowcast_utils
from pysteps_tpu.postprocessing.probmatching import (
    _match_cdf_presorted,
    _prepare_cdf_target,
)


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(pallas_dilate, "INTERPRET", True)
    monkeypatch.setattr(pallas_histmatch, "INTERPRET", True)


def test_rim_kernels_match_xla_path():
    rng = np.random.default_rng(3)
    field = rng.normal(0.0, 10.0, (64, 128)).astype(np.float32)
    for kr, r, thr in [(1, 1, 12.0), (3, 6, 8.0)]:
        ref = np.asarray(
            nowcast_utils.compute_dilated_mask(jnp.asarray(field) >= thr, kr, r)
        )
        fused = np.asarray(
            pallas_dilate.dilated_rim_from_field_pallas(
                jnp.asarray(field), thr, kr, r
            )
        )
        np.testing.assert_allclose(fused, ref, atol=1e-6)
        tiled = np.asarray(
            pallas_dilate.dilated_rim_pallas(jnp.asarray(field) >= thr, kr, r)
        )
        np.testing.assert_allclose(tiled, ref, atol=1e-6)


def test_match_cdf_pwl_tracks_exact_sort():
    rng = np.random.default_rng(0)
    shape = (64, 64)
    target = np.where(
        rng.random(shape) > 0.6, rng.gamma(2.0, 6.0, shape) + 5.0, -15.0
    ).astype(np.float32)
    field = np.maximum(
        target + rng.normal(0.0, 1.5, shape).astype(np.float32), target.min()
    )
    ranked, zv = _prepare_cdf_target(jnp.asarray(target))
    tstate = pallas_histmatch.prepare_target(ranked, zv)
    exact = np.asarray(
        _match_cdf_presorted(jnp.asarray(field), ranked, zv, exact=True)
    )
    fast = np.asarray(pallas_histmatch.match_cdf_pwl(jnp.asarray(field), tstate))
    wet = exact > -14.9
    err = np.abs(exact - fast)
    # PWL quantile map: knot-exact, sub-0.1 dB typical wet error
    assert err[wet].mean() < 0.1
    assert np.percentile(err[wet], 95) < 0.5
    # dry pixels override exactly
    dry = field == field.min()
    np.testing.assert_allclose(fast[dry], float(zv))
    # output distribution matches the target's (rank conservation)
    assert abs((fast > -10).mean() - (exact > -10).mean()) < 0.01


def test_matfft_irfft2_matches_xla():
    from pysteps_tpu.ops import matfft

    rng = np.random.default_rng(1)
    for shape in [(64, 64), (32, 96)]:
        m, n = shape
        spec = (
            rng.normal(size=(m, n // 2 + 1))
            + 1j * rng.normal(size=(m, n // 2 + 1))
        ).astype(np.complex64)
        ref = np.fft.irfft2(spec, s=shape)
        got = np.asarray(
            matfft.irfft2_mat(jnp.asarray(spec), shape, precision="highest")
        )
        np.testing.assert_allclose(got, ref, atol=1e-4 * max(1.0, np.abs(ref).max()))
