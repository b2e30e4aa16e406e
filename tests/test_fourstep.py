"""Four-step factorized DFT matmuls (ops/fourstep.py) and their matfft
routing for sides beyond the dense-matrix window."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.parametrize("n", [512, 1024, 2048])
def test_fourstep_1d_matches_numpy(n):
    from pysteps_tpu.ops import fourstep as fs

    rng = np.random.RandomState(0)
    x = rng.randn(3, n).astype(np.float32)
    Xr, Xi = jax.jit(
        lambda a: fs.fft_c2c(a, jnp.zeros_like(a), inverse=False)
    )(jnp.asarray(x))
    ref = np.fft.fft(x, axis=-1)
    scale = np.abs(ref).max()
    assert np.abs(np.asarray(Xr) - ref.real).max() < 1e-5 * scale
    assert np.abs(np.asarray(Xi) - ref.imag).max() < 1e-5 * scale

    Rr, Ri = jax.jit(fs.rfft_last)(jnp.asarray(x))
    refr = np.fft.rfft(x, axis=-1)
    assert np.abs(np.asarray(Rr) - refr.real).max() < 1e-5 * scale
    assert np.abs(np.asarray(Ri) - refr.imag).max() < 1e-5 * scale

    back = jax.jit(fs.irfft_last)(
        jnp.asarray(refr.real.astype(np.float32)),
        jnp.asarray(refr.imag.astype(np.float32)),
    )
    assert np.abs(np.asarray(back) - x).max() < 1e-5


def test_matfft_routes_large_grids(monkeypatch):
    from pysteps_tpu.ops import matfft

    # 2048 sits inside the dense-matrix window (r5: measured 1.54x
    # faster than the XLA FFT with in-place transients); factorable
    # grids beyond it route through the four-step matmuls unless the
    # kill switch is set
    assert matfft.supported((2048, 2048))
    assert matfft.supported((1536, 2048))
    assert matfft.supported((4096, 4096))
    monkeypatch.setenv("PYSTEPS_TPU_NO_FOURSTEP", "1")
    assert not matfft.supported((4096, 4096))
    monkeypatch.delenv("PYSTEPS_TPU_NO_FOURSTEP")
    rng = np.random.RandomState(1)
    m, n = 2048, 2048
    x = rng.randn(m, n).astype(np.float32)
    spec_ref = np.fft.rfft2(x)
    spec = np.asarray(jax.jit(matfft.rfft2_mat)(jnp.asarray(x)))
    assert (
        np.abs(spec - spec_ref).max() / np.abs(spec_ref).max() < 1e-5
    )
    back = np.asarray(
        jax.jit(lambda s: matfft.irfft2_mat(s, (m, n)))(
            jnp.asarray(spec_ref.astype(np.complex64))
        )
    )
    assert np.abs(back - x).max() < 1e-4
