"""
Fourier-domain statistics (reference: pysteps/utils/spectral.py).

All functions are pure jnp and jit/vmap-safe.  The radial-bin bookkeeping for
``rapsd`` is precomputed host-side per shape (static under jit), the binned
reduction itself is a segment-sum that XLA lowers to a single pass.
"""

import functools

import jax.numpy as jnp
import jax.ops
import numpy as np

from pysteps_tpu.utils.arrays import compute_centred_coord_array


@functools.lru_cache(maxsize=64)
def _radial_bins(m, n):
    yc, xc = compute_centred_coord_array(m, n)
    r_grid = np.round(np.sqrt(xc * xc + yc * yc)).astype(np.int32)
    side = max(m, n)
    n_bins = int(side / 2) + 1 if side % 2 == 1 else int(side / 2)
    counts = np.bincount(r_grid.ravel(), minlength=n_bins)[:n_bins]
    # r_max precomputed host-side so rapsd stays traceable under jit.
    # Cache NUMPY arrays: jnp.asarray under an active trace returns a
    # Tracer, and caching one leaks it across traces (rapsd is now
    # called inside jit by the device-side parametric noise fit).
    r_max = int(r_grid.max())
    return r_grid, n_bins, np.maximum(counts, 1), r_max


def rapsd(
    field,
    fft_method="compute",
    return_freq=False,
    d=1.0,
    normalize=False,
    fft=None,
    **fft_kwargs,
):
    """Radially averaged power spectral density of a 2-D field
    (reference: pysteps/utils/spectral.py:100).

    ``fft_method`` follows the reference's convention: pass an FFT
    namespace (or leave the default) to compute the PSD from the spatial
    field; pass ``None`` to treat ``field`` as the already-centred
    (fftshifted) PSD.  The boolean ``fft`` alias is kept for
    backward compatibility.
    """
    if fft is None:
        fft = fft_method is not None
    m, n = field.shape
    r_grid, n_bins, counts, r_max = _radial_bins(m, n)
    if fft:
        psd = jnp.fft.fftshift(jnp.fft.fft2(field))
        psd = jnp.abs(psd) ** 2 / psd.size
    else:
        psd = field
    sums = jax.ops.segment_sum(
        psd.ravel(), r_grid.ravel(), num_segments=max(n_bins, r_max + 1)
    )[:n_bins]
    result = sums / counts
    if normalize:
        result = result / jnp.sum(result)
    if return_freq:
        freq = np.fft.fftfreq(max(m, n), d=d)[:n_bins]
        return result, jnp.asarray(freq)
    return result


def mean(X, shape):
    """Spatial mean from the rfft2/fft2 of a field via the DC bin
    (reference: pysteps/utils/spectral.py:79)."""
    return jnp.real(X[..., 0, 0]) / float(shape[0] * shape[1])


def std(X, shape, use_full_fft=False):
    """Spatial standard deviation from the FFT via Parseval
    (reference: pysteps/utils/spectral.py:208).  Supports leading batch axes.
    """
    res = jnp.sum(jnp.abs(X) ** 2, axis=(-2, -1)) - jnp.real(X[..., 0, 0]) ** 2
    if not use_full_fft:
        if shape[1] % 2 == 1:
            res = res + jnp.sum(jnp.abs(X[..., :, 1:]) ** 2, axis=(-2, -1))
        else:
            res = res + jnp.sum(jnp.abs(X[..., :, 1:-1]) ** 2, axis=(-2, -1))
    return jnp.sqrt(res / float(shape[0] * shape[1]) ** 2)


def corrcoef(X, Y, shape, use_full_fft=False):
    """Correlation coefficient of two fields computed in the spectral domain
    (reference: pysteps/utils/spectral.py:22).  Supports leading batch axes.
    """
    n = jnp.real(jnp.sum(X * jnp.conj(Y), axis=(-2, -1))) - jnp.real(
        X[..., 0, 0] * Y[..., 0, 0]
    )
    d1 = jnp.sum(jnp.abs(X) ** 2, axis=(-2, -1)) - jnp.real(X[..., 0, 0]) ** 2
    d2 = jnp.sum(jnp.abs(Y) ** 2, axis=(-2, -1)) - jnp.real(Y[..., 0, 0]) ** 2
    if not use_full_fft:
        sl = slice(1, None) if shape[1] % 2 == 1 else slice(1, -1)
        n = n + jnp.real(jnp.sum(X[..., :, sl] * jnp.conj(Y[..., :, sl]), axis=(-2, -1)))
        d1 = d1 + jnp.sum(jnp.abs(X[..., :, sl]) ** 2, axis=(-2, -1))
        d2 = d2 + jnp.sum(jnp.abs(Y[..., :, sl]) ** 2, axis=(-2, -1))
    return n / jnp.sqrt(d1 * d2)


def remove_rain_norain_discontinuity(R):
    """Shift wet pixels down to close the rain/no-rain gap
    (reference: pysteps/utils/spectral.py:183).  NaN-safe, jit-friendly."""
    R = jnp.asarray(R)
    zerovalue = jnp.nanmin(R)
    wet = R > zerovalue
    threshold = jnp.nanmin(jnp.where(wet, R, jnp.inf))
    R = jnp.where(wet, R - (threshold - zerovalue), R)
    return R - jnp.nanmin(R)
