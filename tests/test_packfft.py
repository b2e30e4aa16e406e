"""Packed Hermitian spectral layout (ops/packfft): exactness of every
algebraic identity the packed STEPS scan relies on, plus model-level
equivalence of the packed and unpacked spectral-domain paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pysteps_tpu.ops import packfft
from pysteps_tpu.utils import spectral as spectral_utils

M, N = 64, 96


@pytest.fixture(scope="module")
def X():
    rng = np.random.default_rng(7)
    field = rng.normal(size=(M, N)).astype(np.float32)
    return jnp.asarray(np.fft.rfft2(field).astype(np.complex64))


def test_pack_unpack_roundtrip(X):
    P = packfft.pack(X)
    assert P.shape == (M, N // 2)
    np.testing.assert_allclose(
        np.asarray(packfft.unpack(P)), np.asarray(X), rtol=1e-5, atol=1e-3
    )


def _valid_coeffs(rng, shape):
    """Random real half-plane coefficients with the ky symmetry every
    actual filter has on the folded columns (|F| of a Hermitian plane)."""
    w = rng.uniform(0.1, 2.0, size=shape).astype(np.float32)
    for col in (0, -1):
        c = w[..., :, col]
        w[..., :, col] = 0.5 * (c + np.roll(c[..., ::-1], 1, axis=-1))
    return jnp.asarray(w)


def test_mul_real_matches_unpacked(X):
    w = _valid_coeffs(np.random.default_rng(3), (M, N // 2 + 1))
    got = packfft.unpack(packfft.mul_real(packfft.pack(X), w))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(X * w), rtol=1e-5, atol=1e-3
    )


def test_mul_real_broadcasts_filter_bank(X):
    w = _valid_coeffs(np.random.default_rng(4), (5, M, N // 2 + 1))
    got = packfft.unpack(packfft.mul_real(packfft.pack(X)[None], w))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(X[None] * w), rtol=1e-5, atol=1e-3
    )


def test_mean_std_match_parseval(X):
    P = packfft.pack(X)
    np.testing.assert_allclose(
        float(packfft.mean(P, (M, N))),
        float(spectral_utils.mean(X, (M, N))),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(packfft.std(P, (M, N))),
        float(spectral_utils.std(X, (M, N))),
        rtol=1e-4,
    )


def test_irfft2_mat_packed(X):
    ref = np.asarray(jnp.fft.irfft2(X, s=(M, N)))
    got = np.asarray(packfft.irfft2_mat(packfft.pack(X), (M, N)))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-3)


def test_zero_dc_only_field_dc(X):
    P = packfft.zero_dc(packfft.pack(X))
    U = np.asarray(packfft.unpack(P))
    ref = np.asarray(X)
    assert abs(U[0, 0]) < 1e-3 * max(abs(ref[0, 0]), 1.0)
    # the Nyquist column's own DC survives
    np.testing.assert_allclose(U[0, -1], ref[0, -1], rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(U[1:, :], ref[1:, :], rtol=1e-5, atol=1e-3)


def test_white_law():
    """Packed white draw equals rfft2(white) in law: correct per-bin
    variances, and its inverse transform is unit-variance white noise."""
    keys = jax.random.split(jax.random.PRNGKey(0), 200)
    P = jax.vmap(lambda k: packfft.white(k, (M, N)))(keys)
    p2 = np.asarray(jnp.real(P) ** 2 + jnp.imag(P) ** 2)
    interior = p2[:, :, 1:].mean()
    col0 = p2[:, :, 0].mean()
    np.testing.assert_allclose(interior, M * N, rtol=0.05)
    np.testing.assert_allclose(col0, 2 * M * N, rtol=0.05)
    fields = np.asarray(jax.vmap(lambda p: packfft.irfft2(p, (M, N)))(P))
    assert abs(fields.std() - 1.0) < 0.02
    assert abs(fields.mean()) < 0.02
    # spatial whiteness: neighbour correlation ~ 0
    c = np.mean(fields[:, :, :-1] * fields[:, :, 1:])
    assert abs(c) < 0.02


def test_steps_spectral_packed_matches_unpacked_deterministic(monkeypatch):
    """No-noise spectral STEPS is deterministic: the packed and unpacked
    paths must agree to float tolerance."""
    from pysteps_tpu.nowcasts import steps

    rng = np.random.default_rng(11)
    base = rng.gamma(2.0, 1.5, size=(3, 64, 64)).astype(np.float32)
    base[base < 1.0] = 0.0
    velocity = np.ones((2, 64, 64), np.float32)

    def run():
        return np.asarray(
            steps.forecast(
                base, velocity, 4, n_ens_members=2, n_cascade_levels=4,
                precip_thr=0.5, noise_method=None, vel_pert_method=None,
                probmatching_method=None, mask_method=None, seed=5,
                domain="spectral",
            )
        )

    ref = run()
    monkeypatch.setenv("PYSTEPS_TPU_PACK", "1")
    got = run()
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_steps_spectral_packed_stochastic_stats(monkeypatch):
    """With noise the packed path draws differently-shaped randomness, so
    equivalence is statistical: ensemble mean/std fields stay close."""
    from pysteps_tpu.nowcasts import steps

    rng = np.random.default_rng(12)
    base = rng.gamma(2.0, 2.0, size=(3, 64, 64)).astype(np.float32)
    base[base < 1.5] = 0.0
    velocity = np.full((2, 64, 64), 0.5, np.float32)

    def run():
        return np.asarray(
            steps.forecast(
                base, velocity, 3, n_ens_members=24, n_cascade_levels=4,
                precip_thr=0.5, noise_method="nonparametric",
                vel_pert_method=None, probmatching_method="cdf",
                mask_method="incremental", timestep=5, kmperpixel=1.0,
                seed=5, domain="spectral",
            )
        )

    ref = run()
    monkeypatch.setenv("PYSTEPS_TPU_PACK", "1")
    got = run()
    assert got.shape == ref.shape
    # ensemble-mean fields of the two formulations agree closely
    em_ref, em_got = ref.mean(axis=0), got.mean(axis=0)
    rmse = np.sqrt(np.nanmean((em_ref - em_got) ** 2))
    scale = np.nanstd(em_ref) + 1e-6
    assert rmse / scale < 0.6
    # global intensity statistics agree tightly (CDF matching anchors them)
    np.testing.assert_allclose(np.nanmean(got), np.nanmean(ref), rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.nanstd(got), np.nanstd(ref), rtol=0.05)
