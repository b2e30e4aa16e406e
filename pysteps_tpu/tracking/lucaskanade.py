"""
Pyramidal Lucas-Kanade sparse feature tracking
(reference: pysteps/tracking/lucaskanade.py:35, which wraps OpenCV
calcOpticalFlowPyrLK — here a from-scratch XLA implementation).

Design: Gaussian image pyramid; per feature, a fixed-size patch is sampled
bilinearly around the point, the 2x2 structure-tensor system is solved, and
Newton iterations refine the displacement; coarse-to-fine propagation
doubles the estimate between levels.  All features are vmapped — the whole
sparse tracking is a handful of fused gathers and 2x2 solves.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pysteps_tpu.ops.warp import bilinear_warp


def _gauss_blur(img):
    k1 = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0], jnp.float32) / 16.0
    out = jax.lax.conv_general_dilated(
        img[None, None], k1[None, None, :, None], (1, 1), "SAME"
    )
    out = jax.lax.conv_general_dilated(
        out, k1[None, None, None, :], (1, 1), "SAME"
    )
    return out[0, 0]


def build_pyramid(image, nr_levels):
    """Gaussian pyramid: level 0 is full resolution."""
    pyr = [image]
    for _ in range(nr_levels):
        blurred = _gauss_blur(pyr[-1])
        pyr.append(blurred[::2, ::2])
    return pyr


def _gradients(img):
    kx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32) / 8.0
    gx = jax.lax.conv_general_dilated(img[None, None], kx[None, None], (1, 1), "SAME")[0, 0]
    gy = jax.lax.conv_general_dilated(img[None, None], kx.T[None, None], (1, 1), "SAME")[0, 0]
    return gx, gy


def _track_level(I, J, Ix, Iy, points, guesses, half_win, n_iter):
    """One pyramid level of LK for all features (vmapped).

    points: (N, 2) as (x, y) in this level's coordinates.
    guesses: (N, 2) initial displacement at this level.
    """
    offs = jnp.arange(-half_win, half_win + 1, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(offs, offs, indexing="ij")

    def one(pt, g):
        px, py = pt[0], pt[1]
        cy = py + dy
        cx = px + dx
        Ip = bilinear_warp(I, cy, cx, mode="nearest")
        Ixp = bilinear_warp(Ix, cy, cx, mode="nearest")
        Iyp = bilinear_warp(Iy, cy, cx, mode="nearest")
        Gxx = jnp.sum(Ixp * Ixp)
        Gxy = jnp.sum(Ixp * Iyp)
        Gyy = jnp.sum(Iyp * Iyp)
        det = Gxx * Gyy - Gxy * Gxy
        ok = det > 1e-6

        def newton(v, _):
            Jp = bilinear_warp(J, cy + v[1], cx + v[0], mode="nearest")
            dI = Ip - Jp
            bx = jnp.sum(dI * Ixp)
            by = jnp.sum(dI * Iyp)
            inv_det = 1.0 / jnp.maximum(det, 1e-12)
            vx = v[0] + (Gyy * bx - Gxy * by) * inv_det
            vy = v[1] + (Gxx * by - Gxy * bx) * inv_det
            return jnp.stack([vx, vy]), None

        v, _ = jax.lax.scan(newton, g, None, length=n_iter)
        v = jnp.where(ok, v, g)
        # final patch residual (OpenCV's `err`): mean |I - J(v)| over the
        # window — the status signal track_features filters on
        Jp = bilinear_warp(J, cy + v[1], cx + v[0], mode="nearest")
        resid = jnp.mean(jnp.abs(Ip - Jp))
        return v, ok, resid

    return jax.vmap(one)(points, guesses)


@functools.partial(
    jax.jit, static_argnames=("nr_levels", "half_win", "n_iter")
)
def _pyramidal_lk(prvs, next_img, points, nr_levels, half_win, n_iter):
    pyr_I = build_pyramid(prvs, nr_levels)
    pyr_J = build_pyramid(next_img, nr_levels)
    N = points.shape[0]
    d = jnp.zeros((N, 2), jnp.float32)
    ok_all = jnp.ones(N, dtype=bool)
    resid = jnp.zeros(N, jnp.float32)
    for lvl in range(nr_levels, -1, -1):
        I, J = pyr_I[lvl], pyr_J[lvl]
        Ix, Iy = _gradients(I)
        pts_l = points / (2.0**lvl)
        d, ok, resid = _track_level(I, J, Ix, Iy, pts_l, d, half_win, n_iter)
        ok_all = ok_all & ok
        if lvl > 0:
            d = d * 2.0
    return d, ok_all, resid


def track_features(
    prvs_image,
    next_image,
    points,
    winsize=(50, 50),
    nr_levels=3,
    criteria=None,
    flags=0,
    min_eig_thr=1e-4,
    verbose=False,
    **kwargs,
):
    """Track sparse points between two frames
    (reference: tracking/lucaskanade.py:35).

    Returns (xy, uv): starting coordinates and motion vectors of
    successfully tracked features (host-side arrays).
    """
    prvs = jnp.asarray(prvs_image, jnp.float32)
    nxt = jnp.asarray(next_image, jnp.float32)
    prvs = jnp.where(jnp.isfinite(prvs), prvs, jnp.nanmin(prvs))
    nxt = jnp.where(jnp.isfinite(nxt), nxt, jnp.nanmin(nxt))
    # normalize intensities to [0, 255] as the reference's uint8 rescale
    # does (tracking/lucaskanade.py:146-161)
    def rescale(img):
        lo, hi = jnp.min(img), jnp.max(img)
        return (img - lo) / jnp.maximum(hi - lo, 1e-9) * 255.0

    prvs, nxt = rescale(prvs), rescale(nxt)

    points = jnp.asarray(points, jnp.float32).reshape(-1, 2)
    if points.shape[0] == 0:
        return np.zeros((0, 2)), np.zeros((0, 2))
    half_win = max(int(winsize[0]) // 2, 2)
    n_iter = 20 if criteria is None else int(criteria[1]) if len(criteria) > 1 else 20

    d, ok, resid = _pyramidal_lk(
        prvs, nxt, points, int(nr_levels), half_win, n_iter
    )
    m, n = prvs.shape
    end = points + d
    inside = (
        (end[:, 0] >= 0) & (end[:, 0] <= n - 1)
        & (end[:, 1] >= 0) & (end[:, 1] <= m - 1)
    )
    ok = np.asarray(ok & inside)
    # residual-based rejection (OpenCV status analogue): a diverged Newton
    # iteration leaves a large |I - J(v)| patch residual; threshold
    # adaptively against the population median so well-tracked noisy
    # imagery is untouched
    resid = np.asarray(resid)
    if ok.sum() > 4:
        med = float(np.median(resid[ok]))
        ok = ok & (resid <= max(5.0 * med, 2.0))
    xy = np.asarray(points)[ok]
    uv = np.asarray(d)[ok]
    if verbose:
        print(f"--- {ok.sum()} sparse vectors found ---")
    return xy, uv
