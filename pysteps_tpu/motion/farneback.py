"""
Farneback polynomial-expansion dense optical flow
(reference: pysteps/motion/farneback.py:40-269, which wraps OpenCV's
calcOpticalFlowFarneback — here a from-scratch XLA implementation of
Farneback 2003).

Everything is separable Gaussian correlations (XLA convs): the per-pixel
quadratic expansion f ~ x^T A x + b^T x + c is solved in closed form from
six Gaussian-weighted moments, and the displacement solve is a 2x2
per-pixel system — fully fused elementwise math.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pysteps_tpu.ops.warp import bilinear_warp, warp_shifted_multi


def _gauss_kernel(n, sigma):
    x = jnp.arange(-n, n + 1, dtype=jnp.float32)
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    return g / jnp.sum(g)


def _sep_corr(field, kx, ky):
    out = jax.lax.conv_general_dilated(
        field[None, None], ky[None, None, :, None], (1, 1), "SAME"
    )
    out = jax.lax.conv_general_dilated(out, kx[None, None, None, :], (1, 1), "SAME")
    return out[0, 0]


def _poly_exp(img, n=7, sigma=1.5):
    """Quadratic polynomial expansion: returns per-pixel (A, b) with
    A = [[r4, r6/2], [r6/2, r5]], b = [r2, r3] (Farneback's notation)."""
    x = jnp.arange(-n, n + 1, dtype=jnp.float32)
    g = jnp.exp(-(x**2) / (2 * sigma**2))

    # 1-D basis correlations
    gx = g * x
    gx2 = g * x * x

    # Build the (small) normal-equation matrix G for basis
    # {1, x, y, x^2, y^2, xy} under weight g(x)g(y); solve for equivalent
    # correlation kernels via its inverse applied to the moment stack.
    sg = jnp.sum(g)
    sgx2 = jnp.sum(gx2)
    sgx4 = jnp.sum(g * x**4)
    G = jnp.asarray(
        [
            [sg * sg, 0, 0, sgx2 * sg, sgx2 * sg, 0],
            [0, sgx2 * sg, 0, 0, 0, 0],
            [0, 0, sgx2 * sg, 0, 0, 0],
            [sgx2 * sg, 0, 0, sgx4 * sg, sgx2 * sgx2, 0],
            [sgx2 * sg, 0, 0, sgx2 * sgx2, sgx4 * sg, 0],
            [0, 0, 0, 0, 0, sgx2 * sgx2],
        ],
        jnp.float32,
    )
    Ginv = jnp.linalg.inv(G)

    # moment images m_k = <w * basis_k * f>
    m0 = _sep_corr(img, g, g)
    m1 = _sep_corr(img, gx, g)     # x moment (cols)
    m2 = _sep_corr(img, g, gx)     # y moment (rows)
    m3 = _sep_corr(img, gx2, g)    # x^2
    m4 = _sep_corr(img, g, gx2)    # y^2
    m5 = _sep_corr(img, gx, gx)    # xy
    M = jnp.stack([m0, m1, m2, m3, m4, m5])  # (6, m, n)

    coeffs = jnp.einsum("ij,jmn->imn", Ginv, M)
    c, bx, by, axx, ayy, axy = coeffs
    A = jnp.stack(
        [jnp.stack([axx, axy / 2]), jnp.stack([axy / 2, ayy])]
    )  # (2, 2, m, n)
    b = jnp.stack([bx, by])  # (2, m, n)
    return A, b


def _flow_iteration_impl(img1, img2, flow0, n_iter, poly_n, poly_sigma,
                         winsize, max_disp=None):
    m, n = img1.shape
    A1, b1 = _poly_exp(img1, poly_n, poly_sigma)
    A2, b2 = _poly_exp(img2, poly_n, poly_sigma)
    yy, xx = jnp.meshgrid(
        jnp.arange(m, dtype=jnp.float32), jnp.arange(n, dtype=jnp.float32),
        indexing="ij",
    )
    gw = _gauss_kernel(winsize // 2, winsize / 4.0)

    def body(flow, _):
        cy = yy + flow[1]
        cx = xx + flow[0]
        if max_disp is not None:
            # gather-free shift-decomposition warp of all 6 channels in
            # one pass (TPU: the coordinate gather is scalar)
            chans = jnp.concatenate([A2.reshape(4, m, n), b2], axis=0)
            w = warp_shifted_multi(chans, flow, int(max_disp), mode="nearest")
            A2w = w[:4].reshape(2, 2, m, n)
            b2w = w[4:6]
        else:
            A2w = jnp.stack(
                [
                    jnp.stack([bilinear_warp(A2[i, j], cy, cx, mode="nearest") for j in range(2)])
                    for i in range(2)
                ]
            )
            b2w = jnp.stack([bilinear_warp(b2[i], cy, cx, mode="nearest") for i in range(2)])
        A = (A1 + A2w) / 2.0
        db = -(b2w - b1) / 2.0
        # account for the current flow estimate: db += A @ flow
        db = db + jnp.einsum("ijmn,jmn->imn", A, flow)
        # windowed least squares: accumulate A^T A and A^T db
        G11 = _sep_corr(A[0, 0] ** 2 + A[1, 0] ** 2, gw, gw)
        G12 = _sep_corr(A[0, 0] * A[0, 1] + A[1, 0] * A[1, 1], gw, gw)
        G22 = _sep_corr(A[0, 1] ** 2 + A[1, 1] ** 2, gw, gw)
        h1 = _sep_corr(A[0, 0] * db[0] + A[1, 0] * db[1], gw, gw)
        h2 = _sep_corr(A[0, 1] * db[0] + A[1, 1] * db[1], gw, gw)
        det = G11 * G22 - G12 * G12
        # G is PSD; floor the determinant RELATIVE to the trace so flat
        # (low-texture) windows damp toward zero flow without crushing the
        # solve everywhere (an absolute floor dwarfs det when A ~ 1e-4)
        tr = G11 + G22
        det = jnp.maximum(det, 1e-6 * tr * tr + 1e-30)
        u = (G22 * h1 - G12 * h2) / det
        v = (G11 * h2 - G12 * h1) / det
        return jnp.stack([u, v]), None

    flow, _ = jax.lax.scan(body, flow0, None, length=n_iter)
    return flow


@functools.partial(
    jax.jit, static_argnames=("n_iter", "poly_n", "winsize", "max_disp")
)
def _flow_iteration(img1, img2, flow0, n_iter, poly_n, poly_sigma, winsize,
                    max_disp=None):
    return _flow_iteration_impl(
        img1, img2, flow0, n_iter, poly_n, poly_sigma, winsize, max_disp
    )


def _pyr_gauss(img):
    """sigma=1 Gaussian blur (9-tap separable, reflect padding) for the
    pyramid downsampling — matches scipy.ndimage.gaussian_filter(1.0,
    mode="mirror") to ~1e-4."""
    x = np.arange(-4, 5, dtype=np.float64)
    k = np.exp(-0.5 * x**2)
    k = jnp.asarray(k / k.sum(), jnp.float32)
    f = jnp.pad(img, 4, mode="reflect")[None, None]
    out = jax.lax.conv_general_dilated(f, k[None, None, :, None], (1, 1), "VALID")
    out = jax.lax.conv_general_dilated(out, k[None, None, None, :], (1, 1), "VALID")
    return out[0, 0]


@functools.partial(
    jax.jit,
    static_argnames=(
        "levels", "num_iterations", "poly_n", "winsize", "use_shift",
    ),
)
def _farneback_full(im1, im2, levels, num_iterations, poly_n, poly_sigma,
                    winsize, use_shift):
    """The whole coarse-to-fine solve in ONE compiled program — the
    per-level host loop cost one tunnel dispatch (+ transfers) per
    pyramid level.  Inputs are raw fields; the [0, 1] range normalization
    runs in-graph (host-side nanmin/nanmax of a device array cost a D2H
    fetch per call)."""
    lo = jnp.minimum(jnp.nanmin(im1), jnp.nanmin(im2))
    hi = jnp.maximum(jnp.nanmax(im1), jnp.nanmax(im2))
    scale = 1.0 / jnp.maximum(hi - lo, 1e-9)
    im1 = jnp.nan_to_num((im1 - lo) * scale)
    im2 = jnp.nan_to_num((im2 - lo) * scale)
    pyr = [(im1, im2)]
    for _ in range(levels - 1):
        a, b = pyr[-1]
        if min(a.shape) < 2 * winsize:
            break
        pyr.append((_pyr_gauss(a)[::2, ::2], _pyr_gauss(b)[::2, ::2]))

    flow = jnp.zeros((2,) + pyr[-1][0].shape, jnp.float32)
    for lvl in range(len(pyr) - 1, -1, -1):
        a, b = pyr[lvl]
        md = min(16, min(a.shape) // 2) if use_shift else None
        flow = _flow_iteration_impl(
            a, b, flow, num_iterations, poly_n, poly_sigma, winsize, md
        )
        if lvl > 0:
            flow = (
                jax.image.resize(
                    flow, (2,) + pyr[lvl - 1][0].shape, method="bilinear"
                )
                * 2.0
            )
    return flow


def farneback(
    input_images,
    pyr_scale=0.5,
    levels=4,
    winsize=32,
    iterations=5,
    poly_n=7,
    poly_sigma=1.5,
    flags=0,
    size_opening=0,
    sigma=0.0,
    verbose=False,
    **kwargs,
):
    """Farneback dense flow over the last two frames
    (reference: motion/farneback.py:40; same keyword names).  Returns
    (2, m, n).  ``flags`` is accepted for signature parity (the OpenCV
    bit-flags have no equivalent here); ``size_opening`` applies the
    reference's morphological declutter to the inputs; ``sigma`` > 0
    smooths the flow with magnitude preservation."""
    # the pre-rename keyword names stay accepted
    iterations = kwargs.pop("num_iterations", iterations)
    sigma = kwargs.pop("smoothing_sigma", sigma)
    del flags
    num_iterations = iterations
    smoothing_sigma = sigma
    # device-resident inputs stay on device end to end (a numpy round
    # trip costs ~0.3 s of host-link time per 512^2 retrieval — more
    # than the entire solve); numpy callers keep numpy-in/numpy-out
    device_io = isinstance(input_images, jnp.ndarray) and not isinstance(
        input_images, np.ndarray
    )
    if not device_io:
        input_images = np.asarray(input_images, dtype=np.float32)
    if input_images.ndim != 3 or input_images.shape[0] < 2:
        raise ValueError("input_images must be (T>=2, m, n)")
    if verbose:
        print("Computing the motion field with the Farneback method.")
    im1, im2 = input_images[-2], input_images[-1]
    if size_opening and size_opening > 0:
        from pysteps_tpu.utils.images import morph_opening

        thr = (jnp.nanmin if device_io else np.nanmin)(input_images)
        im1 = morph_opening(im1, thr, size_opening)
        im2 = morph_opening(im2, thr, size_opening)

    use_shift = jax.default_backend() != "cpu"
    flow = _farneback_full(
        jnp.asarray(im1, jnp.float32), jnp.asarray(im2, jnp.float32),
        int(levels), int(num_iterations), int(poly_n), float(poly_sigma),
        int(winsize), use_shift,
    )

    if device_io and not (smoothing_sigma and smoothing_sigma > 0):
        return flow
    flow = np.asarray(flow)
    if smoothing_sigma and smoothing_sigma > 0:
        mag = np.sqrt(flow[0] ** 2 + flow[1] ** 2)
        sm = np.stack(
            [gaussian_filter(flow[i], smoothing_sigma, mode="mirror") for i in range(2)]
        )
        sm_mag = np.sqrt(sm[0] ** 2 + sm[1] ** 2)
        # preserve magnitudes while smoothing directions (reference:
        # farneback.py magnitude-preserving smoothing)
        flow = sm / np.maximum(sm_mag, 1e-9) * mag
    return flow
