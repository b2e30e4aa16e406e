"""
Blob detection (reference: pysteps/feature/blob.py:27, which wraps
scikit-image blob_log — here a from-scratch Laplacian-of-Gaussian
implementation with XLA convs + max-pool non-max suppression).
"""

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel1d(sigma):
    half = int(max(round(4.0 * sigma), 1))
    x = jnp.arange(-half, half + 1, dtype=jnp.float32)
    k = jnp.exp(-(x**2) / (2.0 * sigma**2))
    return k / jnp.sum(k)


def _gauss_filter(field, sigma):
    k = _gaussian_kernel1d(sigma)
    f = field[None, None]
    f = jax.lax.conv_general_dilated(f, k[None, None, :, None], (1, 1), "SAME")
    f = jax.lax.conv_general_dilated(f, k[None, None, None, :], (1, 1), "SAME")
    return f[0, 0]


def detection(
    input_image,
    max_num_features=None,
    method="log",
    threshold=0.5,
    min_sigma=3,
    max_sigma=20,
    num_sigma=10,
    overlap=0.5,
    return_sigmas=False,
    **kwargs,
):
    """LoG blob detection (reference: feature/blob.py:27).

    Returns (N, 3) array of (x, y, sigma) rows, N <= max_num_features.
    """
    field = jnp.asarray(input_image, jnp.float32)
    field = jnp.where(jnp.isfinite(field), field, 0.0)
    m, n = field.shape

    sigmas = np.linspace(min_sigma, max_sigma, num_sigma)
    # scale-normalized LoG: sigma^2 * Laplacian(Gaussian(f))
    responses = []
    for s in sigmas:
        g = _gauss_filter(field, float(s))
        lap = (
            -4.0 * g
            + jnp.roll(g, 1, 0) + jnp.roll(g, -1, 0)
            + jnp.roll(g, 1, 1) + jnp.roll(g, -1, 1)
        )
        responses.append(-(s**2) * lap)  # bright blobs -> positive response
    cube = jnp.stack(responses)  # (S, m, n)

    # 3-D non-max suppression via max pooling
    pooled = jax.lax.reduce_window(
        cube, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1), "SAME"
    )
    peaks = (cube >= pooled) & (cube > threshold)
    scores = jnp.where(peaks, cube, -jnp.inf)

    k = int(max_num_features or 25)
    flat_scores, flat_idx = jax.lax.top_k(scores.ravel(), k)
    si, yi, xi = np.unravel_index(np.asarray(flat_idx), cube.shape)
    valid = np.asarray(jnp.isfinite(flat_scores))
    out = np.stack(
        [xi[valid], yi[valid], sigmas[si[valid]]], axis=1
    ).astype(float)
    return out
