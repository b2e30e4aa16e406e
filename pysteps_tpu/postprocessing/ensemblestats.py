"""
Ensemble statistics (reference: pysteps/postprocessing/ensemblestats.py).

All fused jnp reductions over the member axis; under an ``ens``-sharded
mesh these lower to psum-style collectives.
"""

import jax.numpy as jnp
import numpy as np


def mean(X, ignore_nan=False, X_thr=None):
    """Ensemble mean over axis 0 (reference: ensemblestats.py:20)."""
    X = jnp.asarray(X)
    if X.ndim == 2:
        return X
    if X_thr is not None:
        mask = X >= X_thr
        if ignore_nan:
            mask = mask & jnp.isfinite(X)
        w = mask.astype(X.dtype)
        cnt = jnp.sum(w, axis=0)
        out = jnp.sum(jnp.where(mask, X, 0.0), axis=0) / jnp.maximum(cnt, 1.0)
        return jnp.where(cnt > 0, out, 0.0)
    if ignore_nan:
        return jnp.nanmean(X, axis=0)
    return jnp.mean(X, axis=0)


def excprob(X, X_thr, ignore_nan=False):
    """Exceedance probability P(X >= thr) over members
    (reference: ensemblestats.py:61).  X: (n_members, m, n);
    X_thr: scalar or sequence."""
    X = jnp.asarray(X)
    scalar = np.isscalar(X_thr)
    thrs = jnp.atleast_1d(jnp.asarray(X_thr, X.dtype))
    exceed = X[None, ...] >= thrs[:, None, None, None]
    if ignore_nan:
        valid = jnp.isfinite(X)[None]
        cnt = jnp.sum(valid, axis=1)
        P = jnp.sum(exceed & valid, axis=1) / jnp.maximum(cnt, 1)
    else:
        P = jnp.mean(exceed.astype(X.dtype), axis=1)
    return P[0] if scalar else P


def banddepth(X, thr=None, norm=False):
    """Band depth of ensemble members (reference: ensemblestats.py:118,
    following Lopez-Pintado & Romo 2009): for each member, the fraction of
    member pairs whose envelope contains it.  ``norm=True`` rescales the
    depths to [0, 1] (reference: ensemblestats.py:175-177)."""
    X = jnp.asarray(X)
    n = X.shape[0]
    flat = X.reshape(n, -1)
    if thr is not None:
        cols = jnp.any(flat >= thr, axis=0)
        flat = jnp.where(cols[None, :], flat, jnp.nan)
    # rank of each member per pixel
    order = jnp.argsort(flat, axis=0)
    ranks = jnp.zeros_like(order).at[order, jnp.arange(flat.shape[1])[None, :]].set(
        jnp.arange(n)[:, None]
    )
    r = ranks.astype(jnp.float32) + 1.0
    # probability a random pair's band contains this member at this pixel:
    # (r-1)*(n-r) pairs out of C(n,2); averaged over pixels
    valid = jnp.isfinite(flat)
    pair_frac = ((r - 1.0) * (n - r)) / (n * (n - 1) / 2.0)
    depth = jnp.sum(jnp.where(valid, pair_frac, 0.0), axis=1) / jnp.maximum(
        jnp.sum(valid, axis=1), 1
    )
    if norm:
        depth = (depth - depth.min()) / jnp.maximum(depth.max() - depth.min(), 1e-30)
    return depth
