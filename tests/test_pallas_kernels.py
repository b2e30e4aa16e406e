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


def test_pwl_apply_variants_agree():
    """The three apply kernels (flat compare-cube, one-hot-matmul
    hierarchical, sublane-gather hierarchical) evaluate the same
    128-segment PWL map; agreement is exact up to bf16x3 summation
    order (~1e-6 relative)."""
    rng = np.random.default_rng(7)
    field = np.maximum(
        rng.normal(0.0, 2.0, (128, 128)), 0.0
    ).astype(np.float32)
    target = np.sort(
        np.maximum(rng.normal(0.5, 3.0, 128 * 128), 0.0)
    ).astype(np.float32)
    tstate = pallas_histmatch.prepare_target(
        jnp.asarray(target), jnp.float32(target[0])
    )
    init = jnp.asarray(field).reshape(-1)
    edges, d0, d1, q0, zv, zt = pallas_histmatch.build_pwl_coeffs(
        init, tstate
    )
    flat = np.asarray(
        pallas_histmatch.match_cdf_pwl_flat(jnp.asarray(field), tstate)
    )
    from pysteps_tpu.ops.pallas_chain import pack_hier_lut

    e16, M3 = pack_hier_lut(edges, d0, d1)
    hier = np.asarray(
        pallas_histmatch.pwl_apply_hier(init, e16, M3, q0, zv, zt)
    ).reshape(field.shape)
    e8, T = pallas_histmatch.pack_gather_lut(edges, d0, d1)
    gath = np.asarray(
        pallas_histmatch.pwl_apply_gather(init, e8, T, q0, zv, zt)
    ).reshape(field.shape)
    scale = np.abs(flat).max()
    assert np.abs(hier - flat).max() < 1e-5 * scale
    assert np.abs(gath - flat).max() < 1e-5 * scale
    # the default dispatcher picks the gather kernel at this size
    assert (
        pallas_histmatch._tile_rows(field.size // 128) % 32 == 0
    )


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


def test_matfft_rfft2_matches_xla():
    from pysteps_tpu.ops import matfft

    rng = np.random.default_rng(2)
    for shape in [(64, 64), (32, 96)]:
        x = rng.normal(size=shape).astype(np.float32)
        ref = np.fft.rfft2(x)
        got = np.asarray(matfft.rfft2_mat(jnp.asarray(x), precision="highest"))
        np.testing.assert_allclose(got, ref, atol=1e-3 * max(1.0, np.abs(ref).max()))
        # round trip through the inverse
        back = np.asarray(
            matfft.irfft2_mat(jnp.asarray(got), shape, precision="highest")
        )
        np.testing.assert_allclose(back, x, atol=1e-4)


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


class TestPallasWarpStrips:
    """Strip-tiled resample/warp kernels (2048^2+ VMEM fix) vs the XLA
    shift path, in interpret mode."""

    @pytest.fixture(autouse=True)
    def _interpret_warp(self, monkeypatch):
        from pysteps_tpu.ops import pallas_warp

        monkeypatch.setattr(pallas_warp, "INTERPRET", True)

    def _disp(self, shape, seed=0, amp=5.0):
        rng = np.random.default_rng(seed)
        y = np.linspace(0, 2 * np.pi, shape[0])[:, None]
        x = np.linspace(0, 2 * np.pi, shape[1])[None, :]
        dy = amp * np.sin(y + 0.3) * np.cos(2 * x)
        dx = amp * np.cos(2 * y) * np.sin(x + 0.1)
        field = rng.normal(0.0, 3.0, shape).astype(np.float32)
        return field, dx.astype(np.float32), dy.astype(np.float32)

    def test_resample0_strip_matches_whole_field(self, monkeypatch):
        from pysteps_tpu.ops import pallas_warp

        shape = (64, 256)
        field, _, dy = self._disp(shape, seed=1)
        i_grid = np.arange(shape[0])[:, None].astype(np.float32)
        cy = i_grid + dy
        idx0 = np.floor(cy).astype(np.int32)
        frac = (cy - np.floor(cy)).astype(np.float32)
        whole = np.asarray(pallas_warp.axis_resample_pallas(
            jnp.asarray(field), jnp.asarray(idx0), jnp.asarray(frac), 8, 0))
        # force the strip path: budget below 64*256*4 = 64 KiB
        monkeypatch.setattr(pallas_warp, "_FIELD_VMEM_BUDGET", 40 * 1024)
        assert pallas_warp._lane_strip(*shape) == 128
        striped = np.asarray(pallas_warp.axis_resample_pallas(
            jnp.asarray(field), jnp.asarray(idx0), jnp.asarray(frac), 8, 0))
        np.testing.assert_allclose(striped, whole, atol=1e-6)

    def test_fused_warp_strip_matches_warp_shifted(self, monkeypatch):
        from pysteps_tpu.ops import pallas_warp
        from pysteps_tpu.ops import warp as warp_mod

        shape = (64, 128)
        field, dx, dy = self._disp(shape, seed=2, amp=4.0)
        disp = jnp.stack([jnp.asarray(dx), jnp.asarray(dy)])
        ref = np.asarray(warp_mod.warp_shifted(
            jnp.asarray(field), disp, 8, mode="constant", cval=-15.0))
        disp_t = jnp.stack([disp[0].T, disp[1].T])
        monkeypatch.setattr(pallas_warp, "_FIELD_VMEM_BUDGET", 33 * 1024)
        got = np.asarray(pallas_warp.warp_fused_pallas(
            jnp.asarray(field), jnp.asarray(dy), disp_t, 8, -15.0))
        np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_lane_strip_bounds(self):
        from pysteps_tpu.ops import pallas_warp

        assert pallas_warp._lane_strip(2048, 2048) == 512
        assert pallas_warp._lane_strip(4096, 4096) == 256
        assert pallas_warp._lane_strip(512, 512) == 512
        with pytest.raises(ValueError):
            pallas_warp._lane_strip(3 * 1024 * 1024, 384)
