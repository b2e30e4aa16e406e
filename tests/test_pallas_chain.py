"""Fused spatial-chain kernel (ops/pallas_chain.py) equivalence tests.

Run through the Pallas interpreter on the CPU mesh: the fused
match+rim+warp must reproduce the composition of the standalone kernels
(match_cdf_pwl / dilated rim / warp_fused_pallas) up to f32
summation-order noise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    from pysteps_tpu.ops import (
        pallas_chain,
        pallas_dilate,
        pallas_histmatch,
        pallas_warp,
    )

    for mod in (pallas_chain, pallas_dilate, pallas_histmatch, pallas_warp):
        monkeypatch.setattr(mod, "INTERPRET", True)


def _setup(m=256, n=256, seed=0):
    from pysteps_tpu.ops import pallas_histmatch as ph

    rng = np.random.RandomState(seed)
    init = jnp.asarray(rng.randn(m, n).astype(np.float32) * 3)
    target = jnp.asarray(
        np.sort(rng.gamma(2, 1, m * n)).astype(np.float32)
    )
    tstate = ph.prepare_target(target, target[0])
    dy = jnp.asarray(
        3.3 + 0.5 * np.sin(np.linspace(0, 4, m))[:, None]
        * np.ones((m, n)), jnp.float32,
    )
    dx = jnp.asarray(
        -2.1 + 0.3 * np.cos(np.linspace(0, 3, n))[None, :]
        * np.ones((m, n)), jnp.float32,
    )
    disp_t = jnp.stack([dx.T, dy.T])
    return init, tstate, dy, disp_t


def test_fused_chain_matches_composition():
    from pysteps_tpu.ops import pallas_chain as pc
    from pysteps_tpu.ops import pallas_histmatch as ph
    from pysteps_tpu.ops import pallas_warp as pw
    from pysteps_tpu.ops.pallas_dilate import dilated_rim_from_field_pallas

    init, tstate, dy, disp_t = _setup()
    D, kr, r = 16, 3, 5
    thr, cval = jnp.float32(1.0), jnp.float32(np.nan)

    matched = ph.match_cdf_pwl(init, tstate)
    rim_ref = dilated_rim_from_field_pallas(matched, thr, kr, r)
    warped_ref = pw.warp_fused_pallas(matched, dy, disp_t, D, cval)

    edges, d0, d1, q0, zval, ztrg = ph.build_pwl_coeffs(
        init.reshape(-1), tstate
    )
    e16, M3 = ph.pack_gather_lut(edges, d0, d1)
    out, rim = pc.match_warp_rim(
        init, e16, M3, q0, zval, ztrg, thr, dy, disp_t, cval, D, kr, r,
        do_rim=True,
    )

    w_ref, w_out = np.asarray(warped_ref), np.asarray(out)
    assert np.array_equal(np.isnan(w_ref), np.isnan(w_out))
    span = np.nanmax(w_ref) - np.nanmin(w_ref)
    assert np.nanmax(
        np.abs(np.nan_to_num(w_ref) - np.nan_to_num(w_out))
    ) < 1e-4 * max(span, 1.0)
    np.testing.assert_allclose(
        np.asarray(rim_ref), np.asarray(rim), atol=1e-6
    )


def test_hier_lut_is_exact_pwl():
    """The hierarchical evaluation must equal the flat K-edge sum in f64."""
    from pysteps_tpu.ops import pallas_chain as pc
    from pysteps_tpu.ops import pallas_histmatch as ph

    init, tstate, dy, disp_t = _setup(m=128, n=128, seed=3)
    edges, d0, d1, q0, zval, ztrg = jax.tree.map(
        np.asarray,
        ph.build_pwl_coeffs(init.reshape(-1), tstate),
    )
    cum = (
        np.asarray(init).reshape(-1)[:, None] >= edges[None, :]
    ).astype(np.float64)
    ref = q0 + cum @ d0.astype(np.float64) + np.asarray(init).reshape(
        -1
    ) * (cum @ d1.astype(np.float64))
    ref = np.where(np.asarray(init).reshape(-1) == zval, ztrg, ref)

    e16, M3 = ph.pack_gather_lut(jnp.asarray(edges), jnp.asarray(d0),
                                 jnp.asarray(d1))
    out, _ = pc.match_warp_rim(
        init, e16, M3, jnp.float32(q0), jnp.float32(zval),
        jnp.float32(ztrg), jnp.float32(1.0),
        jnp.zeros_like(init),
        jnp.zeros((2,) + init.shape[::-1], jnp.float32),
        jnp.float32(0.0), 8, 1, 0, do_rim=False,
    )
    span = ref.max() - ref.min()
    assert np.abs(
        np.asarray(out).reshape(-1) - ref
    ).max() < 1e-4 * max(span, 1.0)


def test_steps_chain_path_equivalence():
    """STEPS forecasts with and without the fused chain must agree to
    float tolerance (the chain only reorders f32 summation)."""
    import os

    from tests.helpers import make_synthetic_sequence

    from pysteps_tpu import nowcasts
    from pysteps_tpu.ops import warp as warp_mod

    if jax.default_backend() != "tpu":
        pytest.skip("chain path engages on TPU only (gated by _use_pallas)")

    frames = np.asarray(
        make_synthetic_sequence(n_frames=3, shape=(256, 256),
                                velocity=(2.0, 1.0), seed=7)
    )
    precip_db = 10 * np.log10(np.maximum(frames, 0.01) / 0.01) - 10.0
    velocity = np.stack(
        [np.full((256, 256), 2.0), np.full((256, 256), 1.0)]
    ).astype(np.float32)
    kwargs = dict(
        n_ens_members=4, n_cascade_levels=6, precip_thr=-10.0,
        noise_method="nonparametric", probmatching_method="cdf",
        mask_method="incremental", seed=42, domain="spectral",
    )
    f = nowcasts.get_method("steps")
    out_chain = np.asarray(f(precip_db, velocity, 4, **kwargs))
    os.environ["PYSTEPS_TPU_NO_CHAIN"] = "1"
    try:
        out_plain = np.asarray(f(precip_db, velocity, 4, **kwargs))
    finally:
        del os.environ["PYSTEPS_TPU_NO_CHAIN"]
    assert np.array_equal(np.isnan(out_chain), np.isnan(out_plain))
    d = np.nanmax(np.abs(np.nan_to_num(out_chain) - np.nan_to_num(out_plain)))
    assert d < 0.05, d
