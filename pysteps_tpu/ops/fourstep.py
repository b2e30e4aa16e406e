"""
Four-step (Bailey) factorized DFT-by-matmul for long transforms.

``ops/matfft.py`` evaluates DFTs as dense matrix contractions — MXU-
saturated and ~3x faster than the XLA TPU FFT in-scan, but O(n) FLOPs
per element, which overtakes the FFT around side 1024.  This module
keeps the matmul formulation while restoring ~O(a + b + n/ab twiddle)
per element: a length-``n = a*b`` DFT factors into

    x.reshape(a, b) -> DFT_a over axis 0 (matmul)
                    -> elementwise twiddle W_n^{k1 j2}
                    -> DFT_b over axis 1 (matmul)
                    -> transpose + flatten (k = k2*a + k1)

(the classic four-step algorithm).  For n = 2048 with (a, b) =
(128, 16) the per-element cost drops ~14x versus the dense matrix while
every contraction still runs on the MXU.  Real transforms use the
half-size complex packing: irfft_n == ifft_{n/2} of the Hermitian-
packed spectrum followed by an even/odd de-interleave, and rfft_n the
reverse — so the r2c/c2r stages also ride the factorized path.

All matrices are host-side numpy constants cached per shape (device
closure constants trigger axon D2H readbacks, see CLAUDE.md); matmuls
run at precision="high" (bf16x3) like ops/matfft.py, ~1e-4 relative.

Used by matfft.irfft2_mat / rfft2_mat for sides above the dense-matrix
window (tuning.MATFFT_MAX_SIDE), keeping the spectral hop on the MXU at
the 2048^2 CONUS grid (reference context: nowcasts/steps.py:122-126
spectral-domain STEPS).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _factor(n):
    """(a, b) with n = a*b, a maximal power of two <= 128 that divides
    n evenly with b >= 8 (keeps both contractions MXU-viable)."""
    for a in (128, 64, 32, 16, 8):
        if n % a == 0 and n // a >= 8:
            return a, n // a
    return None


@functools.lru_cache(maxsize=16)
def _cs(k, inverse):
    """Length-k DFT matrix as (cos, sin) with the sign convention of
    exp(-2*pi*i*j*k/n) forward / exp(+...) inverse (no normalization)."""
    jk = np.outer(np.arange(k), np.arange(k)) * (2.0 * np.pi / k)
    sgn = 1.0 if inverse else -1.0
    return (
        np.cos(jk).astype(np.float32),
        (sgn * np.sin(jk)).astype(np.float32),
    )


@functools.lru_cache(maxsize=16)
def _twiddle(a, b, inverse):
    """(a, b) twiddle W_n^{+-k1*j2}."""
    n = a * b
    ang = np.outer(np.arange(a), np.arange(b)) * (2.0 * np.pi / n)
    sgn = 1.0 if inverse else -1.0
    return (
        np.cos(ang).astype(np.float32),
        (sgn * np.sin(ang)).astype(np.float32),
    )


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def fft_c2c(xr, xi, inverse, axis=-1, precision="high"):
    """Length-n complex DFT over ``axis`` via the four-step factoring
    (falls back to a dense matmul when n has no suitable factor).
    Input/output as separate real/imag f32 arrays; no normalization."""
    n = xr.shape[axis]
    xr = jnp.moveaxis(xr, axis, -1)
    xi = jnp.moveaxis(xi, axis, -1)
    fac = _factor(n)
    ein = functools.partial(jnp.einsum, precision=precision)
    if fac is None:
        C, S = _cs(n, inverse)
        yr = ein("...j,jk->...k", xr, C) - ein("...j,jk->...k", xi, S)
        yi = ein("...j,jk->...k", xr, S) + ein("...j,jk->...k", xi, C)
        return jnp.moveaxis(yr, -1, axis), jnp.moveaxis(yi, -1, axis)
    a, b = fac
    shp = xr.shape[:-1]
    xr = xr.reshape(shp + (a, b))
    xi = xi.reshape(shp + (a, b))
    # DFT_a over the j1 axis
    Ca, Sa = _cs(a, inverse)
    yr = ein("kj,...jb->...kb", Ca, xr) - ein("kj,...jb->...kb", Sa, xi)
    yi = ein("kj,...jb->...kb", Sa, xr) + ein("kj,...jb->...kb", Ca, xi)
    # twiddle
    Tr, Ti = _twiddle(a, b, inverse)
    zr, zi = _cmul(yr, yi, Tr, Ti)
    # DFT_b over the j2 axis
    Cb, Sb = _cs(b, inverse)
    wr = ein("...kj,jl->...kl", zr, Cb) - ein("...kj,jl->...kl", zi, Sb)
    wi = ein("...kj,jl->...kl", zr, Sb) + ein("...kj,jl->...kl", zi, Cb)
    # output index k = k2*a + k1 -> transpose (k1, k2) -> (k2, k1)
    wr = jnp.swapaxes(wr, -1, -2).reshape(shp + (n,))
    wi = jnp.swapaxes(wi, -1, -2).reshape(shp + (n,))
    return jnp.moveaxis(wr, -1, axis), jnp.moveaxis(wi, -1, axis)


@functools.lru_cache(maxsize=16)
def _half_weights(n, inverse):
    """Packing weights for the half-size real-transform trick at length
    n (even): A[r] = (1 - i*W_n^{-r})/2, B[r] = (1 + i*W_n^{-r})/2 as
    (re, im) rows of length n//2 (the classic rfft post/pre-combine)."""
    n2 = n // 2
    r = np.arange(n2)
    wr = np.cos(2.0 * np.pi * r / n)
    wi = -np.sin(2.0 * np.pi * r / n)
    # forward: X[r] = A Z[r] + B conj(Z[n2-r]) with A = 1/2 - i W/2,
    # B = 1/2 + i W/2, W = wr + i wi = exp(-2 pi i r/n):
    #   -i W/2 = (wi - i wr)/2
    Are = 0.5 * (1.0 + wi)
    Aim = 0.5 * (-wr)
    Bre = 0.5 * (1.0 - wi)
    Bim = 0.5 * (wr)
    if inverse:
        # inverse combine: Z[r] = A' X[r] + B' conj(X[n2-r]) with
        # A' = 1/2 + i W^{-1}/2, B' = 1/2 - i W^{-1}/2 — the same real
        # parts, negated imaginary parts
        Aim = -Aim
        Bim = -Bim
    return (
        Are.astype(np.float32), Aim.astype(np.float32),
        Bre.astype(np.float32), Bim.astype(np.float32),
    )


def rfft_last(x, precision="high"):
    """rfft over the last axis of a real array via the half-size complex
    transform; returns (re, im) of shape (..., n//2 + 1)."""
    n = x.shape[-1]
    n2 = n // 2
    # z[t] = x[2t] + i x[2t+1]
    z = x.reshape(x.shape[:-1] + (n2, 2))
    zr, zi = fft_c2c(z[..., 0], z[..., 1], inverse=False,
                     precision=precision)
    # unpack: X[r] = A[r] Z[r] + B[r] conj(Z[n2-r]), r = 0..n2
    Are, Aim, Bre, Bim = _half_weights(n, inverse=False)
    idx = (-np.arange(n2)) % n2
    zcr = zr[..., idx]
    zci = -zi[..., idx]
    xr, xi = _cmul(zr, zi, Are, Aim)
    yr, yi = _cmul(zcr, zci, Bre, Bim)
    Xr = xr + yr
    Xi = xi + yi
    # r = n2 (Nyquist): X[n2] = Zr[0] - Zi[0]
    nyq_r = (zr[..., :1] - zi[..., :1])
    Xr = jnp.concatenate([Xr, nyq_r], axis=-1)
    Xi = jnp.concatenate([Xi, jnp.zeros_like(nyq_r)], axis=-1)
    return Xr, Xi


def irfft_last(Xr, Xi, precision="high"):
    """Inverse of :func:`rfft_last`: (..., n//2+1) half-spectrum ->
    (..., n) real samples (normalized by 1/n)."""
    n2 = Xr.shape[-1] - 1
    n = 2 * n2
    # Z[r] = A*[r] X[r] + B*[r] conj(X[n2 - r]), r = 0..n2-1
    Are, Aim, Bre, Bim = _half_weights(n, inverse=True)
    idx = n2 - np.arange(n2)
    xr = Xr[..., :n2]
    xi = Xi[..., :n2]
    xcr = Xr[..., idx]
    xci = -Xi[..., idx]
    zr1, zi1 = _cmul(xr, xi, Are, Aim)
    zr2, zi2 = _cmul(xcr, xci, Bre, Bim)
    zr = zr1 + zr2
    zi = zi1 + zi2
    yr, yi = fft_c2c(zr, zi, inverse=True, precision=precision)
    out = jnp.stack([yr, yi], axis=-1).reshape(Xr.shape[:-1] + (n,))
    return out / n2
