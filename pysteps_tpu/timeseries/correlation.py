"""
Temporal autocorrelation (reference: pysteps/timeseries/correlation.py:21,133,222).

Masked/windowed correlations as fused jnp reductions; the moving-window
("localized") variant uses separable Gaussian/uniform convolutions instead
of the reference's scipy.ndimage filters.
"""

import jax
import jax.numpy as jnp

from pysteps_tpu.utils import spectral as spectral_utils


def _masked_corrcoef(a, b, mask):
    w = mask.astype(a.dtype)
    cnt = jnp.maximum(jnp.sum(w), 1.0)
    ma = jnp.sum(a * w) / cnt
    mb = jnp.sum(b * w) / cnt
    va = jnp.sum((a - ma) ** 2 * w)
    vb = jnp.sum((b - mb) ** 2 * w)
    cov = jnp.sum((a - ma) * (b - mb) * w)
    return cov / jnp.sqrt(jnp.maximum(va * vb, 1e-30))


def _gaussian_kernel1d(radius):
    half = int(max(round(4.0 * radius), 1))
    x = jnp.arange(-half, half + 1, dtype=jnp.float32)
    k = jnp.exp(-(x**2) / (2.0 * radius**2))
    return k / jnp.sum(k)


def _uniform_kernel1d(radius):
    size = 2 * int(radius) + 1
    return jnp.ones(size, dtype=jnp.float32) / size


def _sep_conv2d(field, k1d):
    # separable same-padding convolution along the last two axes
    f = field[None, None]
    ky = k1d[None, None, :, None]
    kx = k1d[None, None, None, :]
    out = jax.lax.conv_general_dilated(f, ky, (1, 1), "SAME")
    out = jax.lax.conv_general_dilated(out, kx, (1, 1), "SAME")
    return out[0, 0]


def _moving_window_corrcoef(a, b, window_radius, window="gaussian", mask=None):
    """Per-pixel correlation over a moving window
    (reference: correlation.py 'localized' path)."""
    if mask is None:
        mask = jnp.ones_like(a, dtype=bool)
    w = mask.astype(a.dtype)
    k = (
        _gaussian_kernel1d(window_radius)
        if window == "gaussian"
        else _uniform_kernel1d(window_radius)
    )
    aw = a * w
    bw = b * w
    n = jnp.maximum(_sep_conv2d(w, k), 1e-8)
    ma = _sep_conv2d(aw, k) / n
    mb = _sep_conv2d(bw, k) / n
    va = _sep_conv2d(aw * a, k) / n - ma**2
    vb = _sep_conv2d(bw * b, k) / n - mb**2
    cov = _sep_conv2d(aw * b, k) / n - ma * mb
    return cov / jnp.sqrt(jnp.maximum(va * vb, 1e-12))


def temporal_autocorrelation(
    x,
    d=0,
    domain="spatial",
    x_shape=None,
    mask=None,
    use_full_fft=False,
    window="gaussian",
    window_radius=jnp.inf,
):
    """Lag-l autocorrelations gamma_l = corr(x(t), x(t-l)) for
    l = 1..n-1, computed against the most recent field
    (reference: correlation.py:21)."""
    x = jnp.asarray(x)
    if d == 1:
        x = jnp.diff(x, axis=0)
    gamma = []
    for k in range(x.shape[0] - 1):
        if domain == "spatial":
            if window_radius == jnp.inf:
                m = mask if mask is not None else jnp.ones(x.shape[1:], dtype=bool)
                cc = _masked_corrcoef(x[-1], x[-(k + 2)], m)
            else:
                cc = _moving_window_corrcoef(
                    x[-1], x[-(k + 2)], window_radius, window=window, mask=mask
                )
        else:
            cc = spectral_utils.corrcoef(
                x[-1], x[-(k + 2)], x_shape, use_full_fft=use_full_fft
            )
        gamma.append(cc)
    return gamma


def temporal_autocorrelation_multivariate(
    x, d=0, mask=None, window="gaussian", window_radius=jnp.inf
):
    """Lag-l cross-correlation matrices Gamma_l for a q-variate series
    (reference: correlation.py:133-222).  x: (n, q, ...).

    With a finite ``window_radius`` each Gamma_l is localized per pixel
    (shape (*spatial, q, q), reference: correlation.py:203-215)."""
    x = jnp.asarray(x)
    if d == 1:
        x = jnp.diff(x, axis=0)
    n, q = x.shape[:2]
    if mask is None:
        mask = jnp.ones(x.shape[2:], dtype=bool)
    localized = window_radius != jnp.inf

    def cc(a, b):
        if localized:
            return _moving_window_corrcoef(
                a, b, window_radius, window=window, mask=mask
            )
        return _masked_corrcoef(a, b, mask)

    gamma = []
    for l in range(n):
        G = jnp.stack(
            [
                jnp.stack([cc(x[-1, i], x[-(l + 1), j]) for j in range(q)])
                for i in range(q)
            ]
        )
        if localized:  # (q, q, *spatial) -> (*spatial, q, q)
            G = jnp.moveaxis(G, (0, 1), (-2, -1))
        gamma.append(G)
    return gamma
