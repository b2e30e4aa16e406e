"""
DFT-by-matmul transforms for the nowcast hot loops.

XLA's TPU FFT leaves the MXU idle (it lowers to a vector-unit
Cooley-Tukey); at nowcasting grid sizes (<= ~1024^2) an explicit
DFT-matrix contraction runs ~3x faster for the in-scan batched inverse
transform because the O(n) extra arithmetic is free on the systolic array
while both formulations are HBM-bound.  Used by
``cascade.decomposition.recompose_spectral_core`` (the one inverse FFT per
member-step of spectral-domain STEPS, reference: nowcasts/steps.py:122-126).

Precision: matmuls run at ``jax.lax.Precision.HIGH`` (bfloat16x3 passes,
~1e-4 max relative error on the recomposed field — well below radar
observation noise); pass precision="highest" for ~1e-6.

The DFT matrices are built host-side as numpy constants (device closure
constants trigger axon D2H readbacks, see CLAUDE.md) and cached per shape.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pysteps_tpu.tuning import MATFFT_MAX_SIDE as _MAX_SIDE


@functools.lru_cache(maxsize=8)
def _idft_mats(m, n):
    """Constants for irfft2 on an (m, n//2+1) half-plane."""
    k = np.arange(m)
    C = (np.cos(2 * np.pi * np.outer(k, k) / m) / m).astype(np.float32)
    S = (np.sin(2 * np.pi * np.outer(k, k) / m) / m).astype(np.float32)
    rf = n // 2 + 1
    kk = np.arange(rf)
    x = np.arange(n)
    w = np.full(rf, 2.0, np.float32)
    w[0] = 1.0
    if n % 2 == 0:
        w[-1] = 1.0
    Cr = (np.cos(2 * np.pi * np.outer(kk, x) / n) * w[:, None] / n).astype(
        np.float32
    )
    Sr = (np.sin(2 * np.pi * np.outer(kk, x) / n) * w[:, None] / n).astype(
        np.float32
    )
    return C, S, Cr, Sr


def supported(shape):
    m, n = shape
    if m <= _MAX_SIDE and n <= _MAX_SIDE:
        return True
    # beyond the dense-matrix window: four-step factorized matmul DFT
    # (ops/fourstep.py) — needs even n and power-of-two-factorable axes.
    # The roundtrip measured 1.34x faster than the XLA FFT at 2048^2
    # (1767 vs 2580 us/member); its transpose/reshape transients
    # (~0.25-0.4 GB per member) are bounded by the in-scan member
    # sub-chunk the outer-chunk path applies above the dense window
    # (tuning.inner_chunk_for_outer), which is what let this flip from
    # the r5 opt-in to default-on.  PYSTEPS_TPU_NO_FOURSTEP=1 restores
    # the XLA FFT above the window.
    import os

    if os.environ.get("PYSTEPS_TPU_NO_FOURSTEP"):
        return False
    from pysteps_tpu.ops import fourstep

    return bool(
        n % 2 == 0
        and fourstep._factor(m) is not None
        and fourstep._factor(n // 2) is not None
    )


def irfft2_mat(spec, shape, precision="high"):
    """Inverse rfft2 of a complex (..., m, n//2+1) half-plane via DFT
    matmuls; equivalent to ``jnp.fft.irfft2(spec, s=shape)``.  Sides
    beyond the dense-matrix window route through the four-step
    factorized matmuls (ops/fourstep.py)."""
    m, n = shape
    if m > _MAX_SIDE or n > _MAX_SIDE:
        from pysteps_tpu.ops import fourstep

        yr, yi = fourstep.fft_c2c(
            jnp.real(spec), jnp.imag(spec), inverse=True, axis=-2,
            precision=precision,
        )
        return fourstep.irfft_last(yr / m, yi / m, precision=precision)
    C, S, Cr, Sr = _idft_mats(m, n)
    ein = functools.partial(jnp.einsum, precision=precision)
    Xr = jnp.real(spec)
    Xi = jnp.imag(spec)
    # stage 1: length-m inverse c2c DFT over the row axis
    Yr = ein("km,...mr->...kr", C, Xr) - ein("km,...mr->...kr", S, Xi)
    Yi = ein("km,...mr->...kr", C, Xi) + ein("km,...mr->...kr", S, Xr)
    # stage 2: length-n c2r DFT over the half-plane axis
    return ein("...kr,rx->...kx", Yr, Cr) - ein("...kr,rx->...kx", Yi, Sr)


@functools.lru_cache(maxsize=8)
def _dft_mats(m, n):
    """Constants for rfft2 of an (m, n) real field."""
    k = np.arange(m)
    C = np.cos(2 * np.pi * np.outer(k, k) / m).astype(np.float32)
    S = np.sin(2 * np.pi * np.outer(k, k) / m).astype(np.float32)
    rf = n // 2 + 1
    x = np.arange(n)
    r = np.arange(rf)
    CrT = np.cos(2 * np.pi * np.outer(x, r) / n).astype(np.float32)
    SrT = np.sin(2 * np.pi * np.outer(x, r) / n).astype(np.float32)
    return C, S, CrT, SrT


def rfft2_mat(field, precision="high"):
    """rfft2 of a real (..., m, n) field via DFT matmuls; equivalent to
    ``jnp.fft.rfft2(field)`` (no normalization, half-plane output)."""
    m, n = field.shape[-2:]
    if m > _MAX_SIDE or n > _MAX_SIDE:
        from pysteps_tpu.ops import fourstep

        zr, zi = fourstep.rfft_last(field, precision=precision)
        xr, xi = fourstep.fft_c2c(
            zr, zi, inverse=False, axis=-2, precision=precision
        )
        return jax.lax.complex(xr, xi)
    C, S, CrT, SrT = _dft_mats(m, n)
    ein = functools.partial(jnp.einsum, precision=precision)
    # stage 1: length-n r2c DFT over the last axis
    Zr = ein("...mx,xr->...mr", field, CrT)
    Zi = -ein("...mx,xr->...mr", field, SrT)
    # stage 2: length-m c2c DFT over the row axis
    Xr = ein("km,...mr->...kr", C, Zr) + ein("km,...mr->...kr", S, Zi)
    Xi = ein("km,...mr->...kr", C, Zi) - ein("km,...mr->...kr", S, Zr)
    return jax.lax.complex(Xr, Xi)


def use_matfft():
    """Matmul DFTs pay off on MXU backends only."""
    from pysteps_tpu.ops.warp import _use_pallas

    return _use_pallas()
