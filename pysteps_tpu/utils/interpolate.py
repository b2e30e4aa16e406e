"""
Sparse-to-grid interpolation (reference: pysteps/utils/interpolate.py:27,118).

TPU-first design: instead of kd-trees and chunked host loops, both
interpolators compute the dense (grid x samples) squared-distance matrix —
an MXU-friendly rank-3 product — and reduce over the sample axis
(``top_k`` for k-NN IDW, a solve + matmul for RBF).  Sparse point sets in
this domain are O(100-1000) points, so the dense matrix is small relative
to the field itself.
"""

from functools import partial

import jax
import jax.numpy as jnp


def _sq_distances(xy_coord, xgrid, ygrid):
    # (G, n) squared distances between grid points and data points
    gx, gy = jnp.meshgrid(xgrid, ygrid)  # (m, n) each
    grid = jnp.stack([gx.ravel(), gy.ravel()], axis=1)  # (G, 2)
    diff = grid[:, None, :] - xy_coord[None, :, :]  # (G, n, 2)
    return jnp.sum(diff * diff, axis=-1)


@partial(jax.jit, static_argnames=("power", "k", "dist_offset"))
def _idw_core(xy_coord, values, xgrid, ygrid, power, k, dist_offset):
    d2 = _sq_distances(xy_coord, xgrid, ygrid)  # (G, n)
    if k is not None and k < xy_coord.shape[0]:
        neg_d2, idx = jax.lax.top_k(-d2, k)  # (G, k)
        d2k = -neg_d2
        vals = values[idx]  # (G, k, m)
    else:
        d2k = d2
        vals = jnp.broadcast_to(values[None], (d2.shape[0],) + values.shape)
    dist = jnp.sqrt(d2k) + dist_offset
    w = dist ** (-power)
    w = w / jnp.sum(w, axis=1, keepdims=True)
    return jnp.einsum("gk,gkm->gm", w, vals)


def idwinterp2d(xy_coord, values, xgrid, ygrid, power=0.5, k=20, dist_offset=0.5, **kwargs):
    """Inverse-distance-weighted interpolation of sparse samples to a grid
    (reference: interpolate.py:27)."""
    xy_coord = jnp.asarray(xy_coord, jnp.float32)
    values = jnp.asarray(values, jnp.float32)
    squeeze = values.ndim == 1
    if squeeze:
        values = values[:, None]
    n = xy_coord.shape[0]
    if k is not None:
        k = min(int(k), n)
    out = _idw_core(
        xy_coord, values, jnp.asarray(xgrid, jnp.float32),
        jnp.asarray(ygrid, jnp.float32), float(power), k, float(dist_offset)
    )
    out = out.T.reshape((values.shape[1], len(ygrid), len(xgrid)))
    return out[0] if squeeze else out


@partial(jax.jit, static_argnames=("epsilon",))
def _rbf_core(xy_coord, values, xgrid, ygrid, epsilon):
    # Gaussian RBF with multiquadric-style epsilon scaled from mean spacing
    n = xy_coord.shape[0]
    diff = xy_coord[:, None, :] - xy_coord[None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    A = jnp.exp(-d2 / (2.0 * epsilon**2)) + 1e-6 * jnp.eye(n)
    coeffs = jnp.linalg.solve(A, values)  # (n, m)
    g2 = _sq_distances(xy_coord, xgrid, ygrid)  # (G, n)
    K = jnp.exp(-g2 / (2.0 * epsilon**2))
    return K @ coeffs  # (G, m)


def rbfinterp2d(xy_coord, values, xgrid, ygrid, **kwargs):
    """Gaussian radial-basis-function interpolation (reference:
    interpolate.py:118; solves the dense RBF system instead of wrapping
    scipy.interpolate.Rbf)."""
    xy_coord = jnp.asarray(xy_coord, jnp.float32)
    values = jnp.asarray(values, jnp.float32)
    squeeze = values.ndim == 1
    if squeeze:
        values = values[:, None]
    eps = kwargs.get("epsilon")
    if eps is None:
        # mean nearest-neighbour spacing as the kernel scale
        diff = xy_coord[:, None, :] - xy_coord[None, :, :]
        d = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
        d = jnp.where(jnp.eye(xy_coord.shape[0], dtype=bool), jnp.inf, d)
        eps = float(jnp.clip(jnp.mean(jnp.min(d, axis=1)) * 2.0, 1.0, 1e4))
    out = _rbf_core(
        xy_coord, values, jnp.asarray(xgrid, jnp.float32),
        jnp.asarray(ygrid, jnp.float32), float(eps)
    )
    out = out.T.reshape((values.shape[1], len(ygrid), len(xgrid)))
    return out[0] if squeeze else out
