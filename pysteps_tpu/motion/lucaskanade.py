"""
Dense Lucas-Kanade optical flow (reference:
pysteps/motion/lucaskanade.py:38-279).

Pipeline (all OpenCV stages re-implemented natively):
morphological declutter -> Shi-Tomasi corners (feature/shitomasi.py) ->
pyramidal LK tracking (tracking/lucaskanade.py) -> outlier removal ->
declustering -> IDW/RBF interpolation to a dense (2, m, n) field.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from pysteps_tpu.feature import shitomasi
from pysteps_tpu.feature.shitomasi import _shitomasi_core
from pysteps_tpu.tracking.lucaskanade import (  # noqa: F401 (track_features: API)
    _pyr_lk_impl,
    _rescale255,
    track_features,
    track_features_batch,
)
from pysteps_tpu.utils import cleansing, images, interpolate
from pysteps_tpu.utils.images import _morph_opening_core


def _masked_median(x, ok):
    """Median of ``x`` over ``ok`` (invalid entries sort to +inf)."""
    xs = jnp.sort(jnp.where(ok, x, jnp.inf))
    cnt = jnp.sum(ok)
    return xs[jnp.maximum(cnt - 1, 0) // 2]


def _knn_radius(d2, k):
    """Per-row distance^2 of the ~k-th nearest neighbour by bisection on
    counts — O(iters * rows * cols) compares, NO sort, NO gather (top_k
    over wide rows is a full sort on TPU; dynamic gathers are scalar)."""
    lo = jnp.zeros(d2.shape[0], d2.dtype)
    hi = jnp.full(d2.shape[0], jnp.nanmax(jnp.where(jnp.isinf(d2), 0.0, d2)) + 1.0)

    def body(_, loh):
        lo, hi = loh
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum(d2 <= mid[:, None], axis=1)
        enough = cnt >= k
        return jnp.where(enough, lo, mid), jnp.where(enough, mid, hi)

    lo, hi = jax.lax.fori_loop(0, 25, body, (lo, hi))
    return hi


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_corners", "min_distance", "block_size", "buffer_mask",
        "size_opening", "nr_levels", "half_win", "n_iter", "k_outlier",
        "idw_k", "cells_y", "cells_x",
    ),
)
def _dense_lk_fused(
    stack, max_corners, quality_level, min_distance, block_size,
    buffer_mask, size_opening, nr_levels, half_win, n_iter,
    nr_std_outlier, k_outlier, decl_scale, cells_y, cells_x,
    power, idw_k, dist_offset,
):
    """The WHOLE dense-LK pipeline as one XLA program: declutter ->
    Shi-Tomasi -> pyramidal LK -> residual filter -> localized outlier
    rejection -> decluster -> k-NN IDW densification.

    The reference runs this as 6 OpenCV/scipy stages
    (motion/lucaskanade.py:38-279); the previous port fused the compute
    but still paid 4 dispatches + 3 device->host fetches over the
    30-60 ms axon tunnel.  Gather-free throughout: neighbour statistics
    and IDW use radius-thresholded weight MATRICES (masked (rows, cols)
    compares + MXU matmuls); the k-NN radius comes from bisection on
    neighbour counts, not a sort.
    """
    T1 = stack.shape[0] - 1
    m, n = stack.shape[1:]
    K = max_corners

    minvals = jax.vmap(jnp.nanmin)(stack)
    filled = jnp.where(
        jnp.isfinite(stack), stack, minvals[:, None, None]
    )
    if size_opening > 0:
        cleaned = jax.vmap(
            lambda f, t: _morph_opening_core(f, t, size_opening)
        )(filled, minvals)
    else:
        cleaned = filled

    masked = jnp.where(jnp.isfinite(stack[:-1]), stack[:-1], jnp.nan)
    pts, valid = jax.vmap(
        lambda img: _shitomasi_core(
            img, K, quality_level, min_distance, block_size, buffer_mask
        )
    )(masked)  # (T1, K, 2), (T1, K)

    d, ok, resid = jax.vmap(
        lambda a, b, p: _pyr_lk_impl(
            _rescale255(a), _rescale255(b), p, nr_levels, half_win, n_iter
        )
    )(cleaned[:-1], cleaned[1:], pts)

    end = pts + d
    inside = (
        (end[..., 0] >= 0) & (end[..., 0] <= n - 1)
        & (end[..., 1] >= 0) & (end[..., 1] <= m - 1)
    )
    ok = valid & ok & inside
    # residual-based rejection against the per-pair median (the OpenCV
    # status analogue, tracking/lucaskanade.py)
    med = jax.vmap(_masked_median)(resid, ok)
    keep = resid <= jnp.maximum(5.0 * med, 2.0)[:, None]
    ok = ok & jnp.where((jnp.sum(ok, axis=1) > 4)[:, None], keep, True)

    # ---- localized outlier rejection (utils/cleansing.py:124 semantics:
    # Mahalanobis distance vs the k nearest neighbours) ----
    P = T1 * K
    xy = pts.reshape(P, 2)
    uv = d.reshape(P, 2)
    val = ok.reshape(P)
    if nr_std_outlier is not None:
        diff = xy[:, None, :] - xy[None, :, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        d2 = jnp.where(val[None, :] & val[:, None], d2, jnp.inf)
        r = _knn_radius(d2, k_outlier + 1)  # +1: includes self
        W = ((d2 <= r[:, None]) & val[None, :]).astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(W, axis=1), 1.0)
        mu = (W @ uv) / cnt[:, None]
        du = uv[None, :, 0] - mu[:, 0:1]
        dv = uv[None, :, 1] - mu[:, 1:2]
        Suu = jnp.sum(W * du * du, axis=1) / cnt
        Suv = jnp.sum(W * du * dv, axis=1) / cnt
        Svv = jnp.sum(W * dv * dv, axis=1) / cnt
        det = jnp.maximum(Suu * Svv - Suv * Suv, 1e-12)
        zu = uv[:, 0] - mu[:, 0]
        zv = uv[:, 1] - mu[:, 1]
        md2 = (Svv * zu * zu - 2 * Suv * zu * zv + Suu * zv * zv) / det
        val = val & (md2 <= nr_std_outlier**2)

    # ---- decluster to cell means (utils/cleansing.py:21; the reference
    # takes per-cell medians — means are the matmul-friendly equivalent)
    C = cells_y * cells_x
    cell = (
        jnp.clip((xy[:, 1] / decl_scale).astype(jnp.int32), 0, cells_y - 1)
        * cells_x
        + jnp.clip((xy[:, 0] / decl_scale).astype(jnp.int32), 0, cells_x - 1)
    )
    onehot = (
        (cell[:, None] == jnp.arange(C)[None, :]) & val[:, None]
    ).astype(jnp.float32)
    ccnt = jnp.sum(onehot, axis=0)
    cdiv = jnp.maximum(ccnt, 1.0)[:, None]
    cxy = (onehot.T @ xy) / cdiv
    cuv = (onehot.T @ uv) / cdiv
    cvalid = ccnt >= 1.0

    # ---- k-NN IDW densification (utils/interpolate.py:27): radius-
    # thresholded inverse-distance weights; numerator/denominator are
    # (G, C) @ (C, 2) MXU matmuls.  The grid axis is processed in blocks
    # (lax.map) so the (G, C) distance matrix never exceeds ~256 MB.
    gx, gy = jnp.meshgrid(
        jnp.arange(n, dtype=jnp.float32), jnp.arange(m, dtype=jnp.float32)
    )
    grid = jnp.stack([gx.ravel(), gy.ravel()], axis=1)  # (G, 2)
    G = m * n
    n_valid = jnp.sum(cvalid)
    k_eff = jnp.minimum(idw_k, jnp.maximum(n_valid, 1))

    def idw_block(grid_b):
        gd = grid_b[:, None, :] - cxy[None, :, :]
        gd2 = jnp.sum(gd * gd, axis=-1)
        gd2 = jnp.where(cvalid[None, :], gd2, jnp.inf)
        rg = _knn_radius(gd2, k_eff)
        w = jnp.where(
            (gd2 <= rg[:, None]) & cvalid[None, :],
            (jnp.sqrt(gd2) + dist_offset) ** (-power),
            0.0,
        )
        wsum = jnp.maximum(jnp.sum(w, axis=1), 1e-12)
        return (w @ cuv) / wsum[:, None]

    n_blocks = max(1, -(-(G * C) // 67_000_000))
    gb = -(-G // n_blocks)
    grid_p = jnp.pad(grid, ((0, n_blocks * gb - G), (0, 0)))
    if n_blocks == 1:
        dense_uv = idw_block(grid_p)
    else:
        dense_uv = jax.lax.map(
            idw_block, grid_p.reshape(n_blocks, gb, 2)
        ).reshape(-1, 2)
    dense_uv = jnp.where(n_valid > 0, dense_uv[:G], 0.0)
    return dense_uv.T.reshape(2, m, n), jnp.sum(val)


def dense_lucaskanade(input_images, lk_kwargs=None, fd_method="shitomasi",
                      fd_kwargs=None, interp_method="idwinterp2d",
                      interp_kwargs=None, dense=True, nr_std_outlier=3,
                      k_outlier=30, size_opening=3, decl_scale=20,
                      verbose=False, **kwargs):
    """Dense LK flow with the reference's signature
    (reference: motion/lucaskanade.py:38).  Returns (2, m, n), or (xy, uv)
    if dense=False.
    """
    if not isinstance(input_images, jax.Array):
        input_images = np.asarray(input_images, dtype=np.float32)
    if input_images.ndim != 3 or input_images.shape[0] < 2:
        raise ValueError("input_images must be (T>=2, m, n)")
    lk_kwargs = lk_kwargs or {}
    fd_kwargs = fd_kwargs or {}
    interp_kwargs = dict(interp_kwargs or {})

    if verbose:
        print("Computing the motion field with the Lucas-Kanade method.")
        t0 = time.time()

    nr_fields = input_images.shape[0]
    domain_size = input_images.shape[1:]

    # fully-fused fast path: the standard configuration (Shi-Tomasi +
    # IDW + declustering) compiles to ONE dispatch and, for device-array
    # inputs, returns a device array (no 2 MB field fetch through the
    # ~18 MB/s tunnel)
    device_input = isinstance(input_images, jax.Array)
    if (
        dense
        and fd_method == "shitomasi"
        and interp_method == "idwinterp2d"
        and decl_scale is not None
        and decl_scale > 1
    ):
        m, n = domain_size
        fd = dict(fd_kwargs)
        max_corners = int(fd.get("max_corners", fd.get("max_num_features", 1000)))
        buf = int(fd.get("buffer_mask", 5)) if fd.get("use_cmask", True) else 0
        winsize = lk_kwargs.get("winsize", (50, 50))
        half_win = max(int(winsize[0]) // 2, 2)
        criteria = lk_kwargs.get("criteria")
        n_iter = (
            20 if criteria is None
            else int(criteria[1]) if len(criteria) > 1 else 20
        )
        field, n_vec = _dense_lk_fused(
            jnp.asarray(input_images, jnp.float32),
            max_corners=max_corners,
            quality_level=float(fd.get("quality_level", 0.01)),
            min_distance=int(fd.get("min_distance", 10)),
            block_size=int(fd.get("block_size", 5)),
            buffer_mask=buf,
            size_opening=int(size_opening or 0),
            nr_levels=int(lk_kwargs.get("nr_levels", 3)),
            half_win=half_win,
            n_iter=n_iter,
            nr_std_outlier=(
                float(nr_std_outlier) if nr_std_outlier is not None else None
            ),
            k_outlier=int(k_outlier),
            decl_scale=float(decl_scale),
            cells_y=-(-m // int(decl_scale)),
            cells_x=-(-n // int(decl_scale)),
            power=float(interp_kwargs.get("power", 0.5)),
            idw_k=int(interp_kwargs.get("k", 20) or 0) or 10**9,
            dist_offset=float(interp_kwargs.get("dist_offset", 0.5)),
        )
        if verbose:
            print(f"--- {int(n_vec)} sparse vectors used ---")
            print(f"--- total time: {time.time() - t0:.2f} seconds ---")
        if device_input:
            return field
        return np.asarray(field, np.float32)

    # the whole pipeline runs in THREE device dispatches regardless of
    # the number of frame pairs: one batched declutter, one batched
    # corner detection, one batched pyramidal-LK track (per-pair eager
    # stages cost one ~50 ms tunnel round-trip each)
    minvals = [
        float(np.nanmin(f)) if np.any(np.isfinite(f)) else 0.0
        for f in input_images
    ]
    filled = np.stack(
        [
            np.where(np.isfinite(f), f, mv)
            for f, mv in zip(input_images, minvals)
        ]
    )
    if size_opening is not None and size_opening > 0:
        # stays device-resident: the tracker consumes it directly (a
        # host round-trip costs ~0.2 s over the tunnel)
        cleaned = images.morph_opening_batch(filled, minvals, size_opening)
    else:
        cleaned = filled

    masked = np.where(
        np.isfinite(input_images[:-1]), input_images[:-1], np.nan
    )
    points_list = shitomasi.detection_batch(masked, **fd_kwargs)

    xy_all, uv_all = [], []
    if any(p.shape[0] for p in points_list):
        results = track_features_batch(
            cleaned[:-1], cleaned[1:], points_list, **lk_kwargs
        )
        for xy, uv in results:
            if xy.shape[0] > 0:
                xy_all.append(xy)
                uv_all.append(uv)

    if not xy_all:
        if dense:
            return np.zeros((2,) + domain_size, dtype=np.float32)
        return np.zeros((0, 2)), np.zeros((0, 2))

    xy = np.concatenate(xy_all)
    uv = np.concatenate(uv_all)

    # outlier removal (reference: utils/cleansing.py:124)
    if nr_std_outlier is not None and xy.shape[0] > 2:
        outliers = cleansing.detect_outliers(
            uv, nr_std_outlier, coord=xy, k=k_outlier, verbose=verbose
        )
        xy, uv = xy[~outliers], uv[~outliers]

    if not dense:
        return xy, uv

    # declustering (reference: utils/cleansing.py:21)
    if decl_scale is not None and decl_scale > 1 and xy.shape[0] > 1:
        xy, uv = cleansing.decluster(xy, uv, decl_scale, 1, verbose)

    if xy.shape[0] == 0:
        return np.zeros((2,) + domain_size, dtype=np.float32)

    # densify
    xgrid = np.arange(domain_size[1], dtype=np.float32)
    ygrid = np.arange(domain_size[0], dtype=np.float32)
    interp = (
        interpolate.rbfinterp2d
        if interp_method == "rbfinterp2d"
        else interpolate.idwinterp2d
    )
    uvgrid = np.asarray(interp(xy, uv, xgrid, ygrid, **interp_kwargs))

    if verbose:
        print(f"--- total time: {time.time() - t0:.2f} seconds ---")
    return uvgrid.astype(np.float32)
