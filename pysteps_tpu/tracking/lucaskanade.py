"""
Pyramidal Lucas-Kanade sparse feature tracking
(reference: pysteps/tracking/lucaskanade.py:35, which wraps OpenCV
calcOpticalFlowPyrLK — here a from-scratch XLA implementation).

Design (TPU-first): per feature, a fixed-size patch around the point is
needed at every Newton iteration.  Dynamic gathers are scalar on TPU
(~170 ns/element — 20 iterations x 80 points x 51^2 samples would cost
~1 s), so ALL patch sampling is expressed as separable interpolation-
matrix products instead: an extended patch is extracted once per level
with two banded (tri-weight) matrices P = Ry @ img @ Cx^T, and each
Newton step resamples the window inside the extended patch with small
per-point matrices built elementwise from the scalar displacement —
batched einsums on the MXU, zero gathers in the loop.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


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


def _tri(x):
    """Bilinear (hat) interpolation weight."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(x))


def _extract_patches(imgs, px, py, half_ext):
    """Extract (N, E, E) patches centred at fractional (px, py) from each
    (m, n) image in ``imgs`` (stacked on axis 0), E = 2*half_ext + 1,
    via banded interpolation matrices (edge samples renormalize, which
    approximates edge-clamped sampling).  Returns (C, N, E, E)."""
    m, n = imgs.shape[1:]
    offs = jnp.arange(-half_ext, half_ext + 1, dtype=jnp.float32)
    rows = jnp.arange(m, dtype=jnp.float32)
    cols = jnp.arange(n, dtype=jnp.float32)
    # (N, E, m): weight of image row r for patch row k of point p
    Ry = _tri(rows[None, None, :] - (py[:, None, None] + offs[None, :, None]))
    Cx = _tri(cols[None, None, :] - (px[:, None, None] + offs[None, :, None]))
    Ry = Ry / jnp.maximum(jnp.sum(Ry, axis=-1, keepdims=True), 1e-6)
    Cx = Cx / jnp.maximum(jnp.sum(Cx, axis=-1, keepdims=True), 1e-6)
    return jnp.einsum("pkm,cmn,pln->cpkl", Ry, imgs, Cx)


def _window_matrices(v, half_win, half_ext):
    """(N, W, E) resampling matrices selecting the W-window shifted by the
    scalar per-point displacement ``v`` inside an E-extended patch."""
    W = 2 * half_win + 1
    E = 2 * half_ext + 1
    i = jnp.arange(W, dtype=jnp.float32)[None, :, None]
    k = jnp.arange(E, dtype=jnp.float32)[None, None, :]
    margin = float(half_ext - half_win)
    w = _tri(k - i - margin - v[:, None, None])
    return w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-6)


def _track_level(I, J, Ix, Iy, points, guesses, half_win, n_iter):
    """One pyramid level of LK for all features, gather-free.

    points: (N, 2) as (x, y) in this level's coordinates.
    guesses: (N, 2) initial displacement at this level.
    """
    margin = 6
    half_ext = half_win + margin
    px, py = points[:, 0], points[:, 1]

    # fixed template quantities: sample the W-window at v=0 from extended
    # patches (one big einsum per image)
    patches = _extract_patches(jnp.stack([I, Ix, Iy]), px, py, half_ext)
    zero = jnp.zeros_like(px)
    W0y = _window_matrices(zero, half_win, half_ext)
    W0x = W0y
    Ip, Ixp, Iyp = (
        jnp.einsum("pik,pkl,pjl->pij", W0y, patches[c], W0x) for c in range(3)
    )
    Gxx = jnp.sum(Ixp * Ixp, axis=(1, 2))
    Gxy = jnp.sum(Ixp * Iyp, axis=(1, 2))
    Gyy = jnp.sum(Iyp * Iyp, axis=(1, 2))
    det = Gxx * Gyy - Gxy * Gxy
    ok = det > 1e-6
    inv_det = 1.0 / jnp.maximum(det, 1e-12)

    # moving target: extended J patches at the GUESS (so Newton only has
    # to cover the per-level residual within +-margin)
    gx0, gy0 = guesses[:, 0], guesses[:, 1]
    Jext = _extract_patches(J[None], px + gx0, py + gy0, half_ext)[0]

    def sample_J(v):
        Wy = _window_matrices(v[:, 1], half_win, half_ext)
        Wx = _window_matrices(v[:, 0], half_win, half_ext)
        return jnp.einsum("pik,pkl,pjl->pij", Wy, Jext, Wx)

    def newton(v, _):
        Jp = sample_J(v)
        dI = Ip - Jp
        bx = jnp.sum(dI * Ixp, axis=(1, 2))
        by = jnp.sum(dI * Iyp, axis=(1, 2))
        vx = v[:, 0] + (Gyy * bx - Gxy * by) * inv_det
        vy = v[:, 1] + (Gxx * by - Gxy * bx) * inv_det
        v_new = jnp.clip(
            jnp.stack([vx, vy], axis=1), -(margin - 1.0), margin - 1.0
        )
        return jnp.where(ok[:, None], v_new, v), None

    v, _ = jax.lax.scan(newton, jnp.zeros_like(guesses), None, length=n_iter)
    # final patch residual (OpenCV's `err`): mean |I - J(v)| over the
    # window — the status signal track_features filters on
    resid = jnp.mean(jnp.abs(Ip - sample_J(v)), axis=(1, 2))
    return guesses + v, ok, resid


def _pyr_lk_impl(prvs, next_img, points, nr_levels, half_win, n_iter):
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


def _rescale255(img):
    img = jnp.where(jnp.isfinite(img), img, jnp.nanmin(img))
    lo, hi = jnp.min(img), jnp.max(img)
    return (img - lo) / jnp.maximum(hi - lo, 1e-9) * 255.0


@functools.partial(
    jax.jit, static_argnames=("nr_levels", "half_win", "n_iter")
)
def _pyramidal_lk(prvs, next_img, points, nr_levels, half_win, n_iter):
    return _pyr_lk_impl(prvs, next_img, points, nr_levels, half_win, n_iter)


@functools.partial(
    jax.jit, static_argnames=("nr_levels", "half_win", "n_iter")
)
def _pyramidal_lk_batch(prvs_b, next_b, points_b, nr_levels, half_win,
                        n_iter):
    """All frame pairs tracked in ONE dispatch: per-pair [0,255] rescale
    fused in, pyramids and patch einsums vmapped over the pair axis."""
    def one(a, b, p):
        return _pyr_lk_impl(
            _rescale255(a), _rescale255(b), p, nr_levels, half_win, n_iter
        )

    return jax.vmap(one)(prvs_b, next_b, points_b)


def _filter_tracks(points, d, ok, resid, n_real, shape):
    m, n = shape
    end = points + d
    inside = (
        (end[:, 0] >= 0) & (end[:, 0] <= n - 1)
        & (end[:, 1] >= 0) & (end[:, 1] <= m - 1)
    )
    ok = np.asarray(ok & inside)[:n_real]
    resid = np.asarray(resid)[:n_real]
    # residual-based rejection (OpenCV status analogue), adaptive vs the
    # population median
    if ok.sum() > 4:
        med = float(np.median(resid[ok]))
        ok = ok & (resid <= max(5.0 * med, 2.0))
    return points[:n_real][ok], np.asarray(d)[:n_real][ok]


def track_features_batch(prvs_stack, next_stack, points_list,
                         winsize=(50, 50), nr_levels=3, criteria=None,
                         **kwargs):
    """Track sparse points for a batch of frame pairs in one compiled
    dispatch (the per-pair loop costs ~0.2 s of tunnel latency per pair
    otherwise).  points_list: per-pair (N_t, 2) arrays; returns a list
    of (xy, uv) pairs."""
    n_pairs = len(points_list)
    half_win = max(int(winsize[0]) // 2, 2)
    n_iter = 20 if criteria is None else int(criteria[1]) if len(criteria) > 1 else 20
    n_reals = [p.shape[0] for p in points_list]
    n_max = max(max(n_reals), 1)
    n_max += -n_max % 32
    padded = np.zeros((n_pairs, n_max, 2), np.float32)
    for t, p in enumerate(points_list):
        if p.shape[0]:
            padded[t, : p.shape[0]] = np.asarray(p, np.float32)
    d, ok, resid = _pyramidal_lk_batch(
        jnp.asarray(prvs_stack, jnp.float32),
        jnp.asarray(next_stack, jnp.float32),
        jnp.asarray(padded), int(nr_levels), half_win, n_iter,
    )
    d = np.asarray(d)
    ok = np.asarray(ok)
    resid = np.asarray(resid)
    shape = np.asarray(prvs_stack).shape[1:]
    return [
        _filter_tracks(padded[t], d[t], ok[t], resid[t], n_reals[t], shape)
        for t in range(n_pairs)
    ]


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

    points = np.asarray(points, np.float32).reshape(-1, 2)
    n_real = points.shape[0]
    if n_real == 0:
        return np.zeros((0, 2)), np.zeros((0, 2))
    # pad the feature count to a multiple of 32: stable executable shapes
    # across frames (feature counts vary per pair; each distinct N would
    # otherwise recompile)
    n_pad = -n_real % 32
    if n_pad:
        points = np.concatenate(
            [points, np.repeat(points[:1], n_pad, axis=0)], axis=0
        )
    pts_dev = jnp.asarray(points)
    half_win = max(int(winsize[0]) // 2, 2)
    n_iter = 20 if criteria is None else int(criteria[1]) if len(criteria) > 1 else 20

    d, ok, resid = _pyramidal_lk(
        prvs, nxt, pts_dev, int(nr_levels), half_win, n_iter
    )
    m, n = prvs.shape
    end = pts_dev + d
    inside = (
        (end[:, 0] >= 0) & (end[:, 0] <= n - 1)
        & (end[:, 1] >= 0) & (end[:, 1] <= m - 1)
    )
    ok = np.asarray(ok & inside)[:n_real]
    # residual-based rejection (OpenCV status analogue): a diverged Newton
    # iteration leaves a large |I - J(v)| patch residual; threshold
    # adaptively against the population median so well-tracked noisy
    # imagery is untouched
    resid = np.asarray(resid)[:n_real]
    if ok.sum() > 4:
        med = float(np.median(resid[ok]))
        ok = ok & (resid <= max(5.0 * med, 2.0))
    xy = points[:n_real][ok]
    uv = np.asarray(d)[:n_real][ok]
    if verbose:
        print(f"--- {ok.sum()} sparse vectors found ---")
    return xy, uv
