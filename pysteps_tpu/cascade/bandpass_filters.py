"""
Fourier bandpass filters for cascade decomposition
(reference: pysteps/cascade/bandpass_filters.py:53,91,209).

Filter weights are static per (shape, n) pair: they are built host-side in
float64 numpy and handed to jitted kernels as constant jnp arrays.
"""

import functools

import numpy as np
import jax.numpy as jnp

from pysteps_tpu.utils.devconst import cached_constant


def filter_uniform(shape, n):
    """Single all-pass band — degenerate cascade
    (reference: bandpass_filters.py:53)."""
    del n
    try:
        height, width = shape
    except TypeError:
        height, width = shape, shape
    r_max = int(max(width, height) / 2) + 1
    return {
        "weights_1d": jnp.ones((1, r_max)),
        "weights_2d": jnp.ones((1, height, int(width / 2) + 1)),
        "central_freqs": None,
        "central_wavenumbers": None,
        "shape": (height, width),
    }


@functools.lru_cache(maxsize=32)
def _gaussian_weights(height, width, n, gauss_scale, normalize, include_mean):
    """Host-side construction of the weight bank, cached per argument
    tuple: the band_weight sweeps over the (m, n/2+1) radial grid cost
    ~50 ms of host time per forecast call at 512^2 (r4 profiler trace) —
    pure fixed cost, identical every call."""
    max_length = max(width, height)

    # radial wavenumber grid over the rfft2 half-plane, fftshift-rolled in y
    if height % 2 == 1:
        y = np.arange(-int(height / 2), int(height / 2) + 1)
    else:
        y = np.arange(-int(height / 2), int(height / 2))
    x = np.arange(int(width / 2) + 1)
    y_grid, x_grid = y[:, None], x[None, :]
    dy = int(height / 2) if height % 2 == 0 else int(height / 2) + 1
    r_2d = np.roll(np.sqrt(x_grid * x_grid + y_grid * y_grid), dy, axis=0)

    r_max = int(max_length / 2) + 1
    r_1d = np.arange(r_max)

    # log-spaced band centres: q^k geometric progression up to Nyquist
    q = (0.5 * max_length) ** (1.0 / n)
    centres = [0.5 * (q ** (k - 1) + q**k) for k in range(1, n + 1)]

    def log_q(x):
        with np.errstate(divide="ignore"):
            res = np.where(x > 0, np.log(np.maximum(x, 1e-300)) / np.log(q), 0.0)
        return res

    def band_weight(r, centre):
        u = log_q(r) - log_q(centre)
        return np.exp(-(u**2) / (2.0 * gauss_scale**2))

    weights_1d = np.stack([band_weight(r_1d, c) for c in centres])
    weights_2d = np.stack([band_weight(r_2d, c) for c in centres])

    if normalize:
        weights_1d /= weights_1d.sum(axis=0, keepdims=True)
        weights_2d /= weights_2d.sum(axis=0, keepdims=True)

    # DC bin: all weight on level 0 (field mean lives there)
    weights_1d[:, 0] = 0.0
    weights_2d[:, 0, 0] = 0.0
    if include_mean:
        weights_1d[0, 0] = 1.0
        weights_2d[0, 0, 0] = 1.0

    return weights_1d, weights_2d, tuple(centres), band_weight


def filter_gaussian(
    shape, n, gauss_scale=0.5, d=1.0, normalize=True,
    return_weight_funcs=False, include_mean=True,
):
    """n log-spaced Gaussian bandpass filters, normalized so the per-
    wavenumber weights sum to one; the DC bin is assigned to level 0
    (reference: bandpass_filters.py:91-206).  ``return_weight_funcs``
    adds the un-normalized radial weight callables under 'weight_funcs'
    (reference: bandpass_filters.py:119-121)."""
    if n < 3:
        raise ValueError("n must be greater than 2")
    try:
        height, width = shape
    except TypeError:
        height, width = shape, shape

    max_length = max(width, height)
    weights_1d, weights_2d, centres, band_weight = _gaussian_weights(
        int(height), int(width), int(n), float(gauss_scale),
        bool(normalize), bool(include_mean),
    )

    central_wavenumbers = np.array(centres)
    central_freqs = central_wavenumbers / max_length
    central_freqs[0] = 1.0 / max_length
    central_freqs[-1] = 0.5
    central_freqs = d * central_freqs

    # cache the device copies: the (n, m, n/2+1) bank is a pure function of
    # the arguments, and re-uploading ~4 MB per forecast call dominates the
    # per-call fixed cost on slow host-device links (utils/devconst.py)
    ckey = ("filter_gaussian", height, width, n, gauss_scale, d, normalize,
            include_mean)
    out = {
        "weights_1d": cached_constant(ckey + ("w1",), lambda: weights_1d),
        "weights_2d": cached_constant(ckey + ("w2",), lambda: weights_2d),
        "central_wavenumbers": jnp.asarray(central_wavenumbers),
        "central_freqs": jnp.asarray(central_freqs),
        "shape": (height, width),
    }
    if return_weight_funcs:
        out["weight_funcs"] = [
            (lambda r, c=c: band_weight(np.asarray(r, float), c))
            for c in centres
        ]
    return out
