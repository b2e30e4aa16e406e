"""
Variational Echo Tracking (reference: pysteps/motion/vet.py:303-648 +
pysteps/motion/_vet.pyx; Laroche & Zawadzki 1995, Germann & Zawadzki 2002).

TPU-native redesign: the Cython ``_warp``/``_cost_function`` OpenMP kernels
become one jitted cost function — sector displacements are bilinearly
interpolated from sector centres to pixels (broadcast math), the template
is warped with the fused bilinear gather, and the smoothness penalty is a
second-difference stencil.  The hand-written analytic gradient is replaced
by ``jax.grad``; scipy CG drives the same coarse-to-fine scaling-guess
loop, calling the jitted value-and-grad.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
from scipy.ndimage import zoom

from pysteps_tpu.ops.warp import bilinear_warp, warp_shifted, warp_shifted_multi


def round_int(scalar):
    """Nearest integer as int (reference: vet.py:46)."""
    return int(np.round(scalar))


def ceil_int(scalar):
    """Ceiling as int (reference: vet.py:53)."""
    return int(np.ceil(scalar))


def morph(image, displacement, gradient=False):
    """Backward-warp an image with a displacement field
    (reference: vet.py:93 wrapping _vet.pyx::_warp; Beezley & Mandel 2008).

    displacement refers to the destination: out[x] = image[x - d[x]], with
    d[0] along axis 0 and d[1] along axis 1.  Returns (morphed, mask) —
    mask is int8, 2 where the source coordinate fell outside the domain
    (clamped to the nearest edge), 1 where a masked input value was
    sampled — plus, when gradient=True, the (2, m, n) derivative of the
    morphed image w.r.t. each displacement component.
    """
    if isinstance(image, np.ma.MaskedArray):
        in_mask = np.ma.getmaskarray(image).astype(np.float64)
        img = np.asarray(np.ma.filled(image, 0.0), np.float64)
    else:
        img = np.asarray(image, np.float64)
        in_mask = (~np.isfinite(img)).astype(np.float64)
        img = np.where(np.isfinite(img), img, 0.0)
    disp = np.asarray(displacement, np.float64)
    m, n = img.shape
    yy, xx = np.meshgrid(np.arange(m), np.arange(n), indexing="ij")
    cy = yy - disp[0]
    cx = xx - disp[1]
    outside = (cy < 0) | (cy > m - 1) | (cx < 0) | (cx > n - 1)

    cyj = jnp.asarray(cy, jnp.float32)
    cxj = jnp.asarray(cx, jnp.float32)
    warped = np.asarray(bilinear_warp(jnp.asarray(img, jnp.float32), cyj, cxj,
                                      mode="nearest"), np.float64)
    sampled_mask = np.asarray(
        bilinear_warp(jnp.asarray(in_mask, jnp.float32), cyj, cxj, mode="nearest")
    )
    mask = np.where(outside, 2, np.where(sampled_mask > 0, 1, 0)).astype(np.int8)
    if not gradient:
        return warped, mask
    # d out / d d_k = -dI/dx_k evaluated at the source coordinate
    gy, gx = np.gradient(img)
    grad = np.stack([
        -np.asarray(bilinear_warp(jnp.asarray(g, jnp.float32), cyj, cxj,
                                  mode="nearest"), np.float64)
        for g in (gy, gx)
    ])
    return warped, mask, grad


def vet_cost_function(
    sector_displacement_1d,
    input_images,
    blocks_shape,
    mask,
    smooth_gain,
    debug=False,
    gradient=False,
):
    """Scalar VET cost (masked SSD + smoothness), or its gradient when
    gradient=True (reference: vet.py:165-302).  Drop-in for scipy.optimize;
    internally one jitted value-and-grad evaluation."""
    input_images = np.asarray(input_images, np.float64)
    template, target = input_images[0], input_images[-1]
    m, n = template.shape
    si, sj = int(blocks_shape[0]), int(blocks_shape[1])
    interp_arrays = _interp_matrices(m, n, si, sj)
    fn = _make_cost(
        jnp.asarray(template, jnp.float32),
        jnp.asarray(target, jnp.float32),
        jnp.asarray(np.asarray(mask, bool)),
        float(smooth_gain),
        (si, sj),
        interp_arrays,
    )
    value, grad = fn(jnp.asarray(sector_displacement_1d, jnp.float32))
    if debug:
        print("cost", float(value))
    if gradient:
        return np.asarray(grad, np.float64).ravel()
    return float(value)


def vet_cost_function_gradient(*args, **kwargs):
    """Gradient of :func:`vet_cost_function` (reference: vet.py:156)."""
    kwargs["gradient"] = True
    return vet_cost_function(*args, **kwargs)


def get_padding(dimension_size, sectors):
    """Padding so the dimension divides evenly into sectors
    (reference: vet.py:60)."""
    rem = dimension_size % sectors
    if rem != 0:
        pad = sectors - rem
        before = pad // 2
        return before, before if pad % 2 == 0 else before + 1
    return 0, 0


def _sector_centers(size, n_sectors):
    coords = np.arange(size, dtype=np.float64)
    return coords.reshape(n_sectors, size // n_sectors).mean(axis=1)


def _interp_matrix(size, n_sectors):
    """Static (size, n_sectors) bilinear sector->pixel interpolation
    matrix, linearly extrapolating at the edges — the interpolation-
    coefficient construction of _vet.pyx:330+, expressed as a matrix so
    the sector-to-pixel upsampling runs as two MXU matmuls instead of 2M
    scalar gathers (TPU: dynamic gather is ~170 ns/element)."""
    W = np.zeros((size, n_sectors), np.float32)
    if n_sectors == 1:
        W[:, 0] = 1.0
        return W
    centers = _sector_centers(size, n_sectors)
    coords = np.arange(size, dtype=np.float64)
    idx = np.clip(
        np.searchsorted(centers, coords, side="right") - 1, 0, n_sectors - 2
    )
    t = (coords - centers[idx]) / (centers[idx + 1] - centers[idx])
    W[np.arange(size), idx] = 1.0 - t
    W[np.arange(size), idx + 1] = t
    return W


def _interp_matrices(m, n, si, sj):
    return (
        jnp.asarray(_interp_matrix(m, si)),
        jnp.asarray(_interp_matrix(n, sj)),
    )


@functools.partial(jax.jit, static_argnames=("sectors",))
def _sector_to_pixels(sector_displacement, sectors, interp_mats):
    """Bilinearly interpolate per-sector displacements (2, si, sj) to the
    full pixel grid via the separable interpolation matrices:
    disp_px[c] = R @ d[c] @ C^T — pure matmuls (MXU), trivially
    differentiable."""
    R, C = interp_mats
    return jnp.einsum("mi,cij,nj->cmn", R, sector_displacement, C)


def _smoothness_penalty(d):
    """Second-difference (thin-plate-like) penalty over the sector grid
    (reference: _vet.pyx smoothness term of Laroche & Zawadzki 1995)."""
    total = 0.0
    for comp in (d[0], d[1]):
        if comp.shape[0] > 2:
            dxx = comp[2:, :] - 2 * comp[1:-1, :] + comp[:-2, :]
            total += jnp.sum(dxx**2)
        if comp.shape[1] > 2:
            dyy = comp[:, 2:] - 2 * comp[:, 1:-1] + comp[:, :-2]
            total += jnp.sum(dyy**2)
        if comp.shape[0] > 1 and comp.shape[1] > 1:
            dxy = (
                comp[1:, 1:] - comp[1:, :-1] - comp[:-1, 1:] + comp[:-1, :-1]
            )
            total += 2.0 * jnp.sum(dxy**2)
    return total


def _make_cost(
    template, target, mask, smooth_gain, sectors, interp_arrays,
    max_disp=None, center_shift=(0, 0),
):
    """Jitted cost + grad closure for one sector scale.

    Pixel-space cost: masked SSD between the warped template and the
    target (reference: _vet.pyx residuals) plus smooth_gain * smoothness.
    Axis convention inside the solver follows the reference's "ij":
    displacement[0] moves axis 0 (rows), displacement[1] axis 1 (cols).

    ``max_disp`` (static int) switches the warp to the gather-free
    shift-decomposition path — on TPU the coordinate gather is scalar and
    would dominate every Adam step.  ``center_shift`` (static ints): the
    caller pre-shifted ``template`` by this integer global displacement,
    so the warp only covers the RESIDUAL displacement and ``max_disp``
    stays small (warp cost is linear in max_disp).
    """
    m, n = template.shape[-2:]
    yy, xx = jnp.meshgrid(
        jnp.arange(m, dtype=jnp.float32), jnp.arange(n, dtype=jnp.float32),
        indexing="ij",
    )
    gi, gj = float(center_shift[0]), float(center_shift[1])

    multi = template.ndim == 3  # (P, m, n) stacked pairs, one shared flow

    def cost(sector_disp_flat):
        d = sector_disp_flat.reshape((2,) + tuple(sectors))
        disp = _sector_to_pixels(d, tuple(sectors), interp_arrays)
        # morph convention: displacement refers to the destination, the
        # warped image samples at x - d (reference: _vet.pyx::_warp)
        if max_disp is not None:
            shift = jnp.stack([-(disp[1] - gj), -(disp[0] - gi)])
            if multi:
                # all image pairs share ONE displacement: a single
                # multi-channel shift-resample pass instead of P
                # sequential warps per Adam step
                warped = warp_shifted_multi(
                    template, shift, int(max_disp), mode="nearest"
                )
            else:
                warped = warp_shifted(
                    template, shift, int(max_disp), mode="nearest"
                )
        else:
            cy = yy - disp[0]
            cx = xx - disp[1]
            if multi:
                warped = jax.vmap(
                    lambda t: bilinear_warp(t, cy, cx, mode="nearest")
                )(template)
            else:
                warped = bilinear_warp(template, cy, cx, mode="nearest")
        resid = jnp.where(mask, 0.0, (warped - target) ** 2)
        sector_area = (m // sectors[0]) * (n // sectors[1])
        n_pairs = template.shape[0] if multi else 1
        return jnp.sum(resid) + (
            smooth_gain * _smoothness_penalty(d) * sector_area * n_pairs
        )

    return jax.jit(jax.value_and_grad(cost))


def _make_cost_sharded(
    template, target, mask, smooth_gain, sectors, interp_arrays, mesh
):
    """Distributed variant of ``_make_cost``: the masked-SSD residual is
    evaluated on rows sharded over the mesh's "y" axis and reduced with a
    ``psum``; the (small) sector displacement stays replicated, as does the
    smoothness penalty (SURVEY §5.8: coarse solves replicate, fine-level
    cost evaluation shards with collectives).

    The template is replicated so each shard's backward warp can gather
    rows beyond its own slice without a halo exchange.
    """
    from jax.sharding import PartitionSpec as P

    m, n = template.shape
    n_shards = mesh.shape["y"]
    if m % n_shards:
        return _make_cost(
            template, target, mask, smooth_gain, sectors, interp_arrays
        )
    m_loc = m // n_shards
    yy_full, xx_full = jnp.meshgrid(
        jnp.arange(m, dtype=jnp.float32), jnp.arange(n, dtype=jnp.float32),
        indexing="ij",
    )
    maskf = mask.astype(jnp.float32)

    def shard_ssd(disp, target_loc, mask_loc, yy_loc, xx_loc):
        # disp (replicated): full-grid (2, m, n); slice this shard's rows
        row0 = jax.lax.axis_index("y") * m_loc
        d_loc = jax.lax.dynamic_slice(
            disp, (0, row0, 0), (2, m_loc, n)
        )
        cy = yy_loc - d_loc[0]
        cx = xx_loc - d_loc[1]
        warped = bilinear_warp(template, cy, cx, mode="nearest")
        resid = jnp.where(mask_loc > 0, 0.0, (warped - target_loc) ** 2)
        return jax.lax.psum(jnp.sum(resid), "y")

    ssd_fn = jax.shard_map(
        shard_ssd,
        mesh=mesh,
        in_specs=(P(), P("y", None), P("y", None), P("y", None), P("y", None)),
        out_specs=P(),
    )

    def cost(sector_disp_flat):
        d = sector_disp_flat.reshape((2,) + tuple(sectors))
        disp = _sector_to_pixels(d, tuple(sectors), interp_arrays)
        ssd = ssd_fn(disp, target, maskf, yy_full, xx_full)
        sector_area = (m // sectors[0]) * (n // sectors[1])
        return ssd + smooth_gain * _smoothness_penalty(d) * sector_area

    return jax.jit(jax.value_and_grad(cost))


def _global_shift(template, target):
    """Global translation estimate via FFT cross-correlation — used to seed
    the coarsest scaling guess so the local optimizer is not trapped by
    fine-texture ripples.  Returns (di, dj) such that
    target(x) ~ template(x - d)."""
    t = template - np.mean(template)
    g = target - np.mean(target)
    xc = np.fft.irfft2(
        np.fft.rfft2(g) * np.conj(np.fft.rfft2(t)), s=t.shape
    )
    idx = np.unravel_index(np.argmax(xc), xc.shape)
    di = idx[0] if idx[0] <= t.shape[0] // 2 else idx[0] - t.shape[0]
    dj = idx[1] if idx[1] <= t.shape[1] // 2 else idx[1] - t.shape[1]
    return float(di), float(dj)


def _minimize_adam(cost_fns, x0, n_steps=300, lr=0.3):
    """Minimize the summed jitted costs with Adam under a cosine-decayed
    learning rate (lax.scan on device): the decay recovers the final-
    convergence precision of many fixed-lr steps at half the count."""
    opt = optax.adam(
        optax.cosine_decay_schedule(lr, n_steps, alpha=0.02)
    )

    def total(x):
        vals = [c(x) for c in cost_fns]
        val = sum(v for v, _ in vals)
        grad = sum(g for _, g in vals)
        return val, grad

    @jax.jit
    def run(x0):
        state0 = opt.init(x0)

        def step(carry, _):
            x, state = carry
            val, grad = total(x)
            updates, state = opt.update(grad, state, x)
            x = optax.apply_updates(x, updates)
            return (x, state), val

        (x, _), vals = jax.lax.scan(step, (x0, state0), None, length=n_steps)
        return x, vals[-1]

    x, final_cost = run(x0)
    return x, float(final_cost)


def vet(
    input_images,
    sectors=((32, 16, 4, 2), (32, 16, 4, 2)),
    smooth_gain=1e6,
    first_guess=None,
    intermediate_steps=False,
    verbose=True,
    indexing="yx",
    padding=0,
    options=None,
    mesh=None,
    max_disp="auto",
    **kwargs,
):
    """VET dense displacement field (reference: motion/vet.py:303).

    Returns (2, m, n) displacement in pixels/timestep (xy indexing by
    default, matching the reference's output convention).
    """
    input_images = np.asarray(input_images, dtype=np.float64)
    if input_images.ndim != 3 or input_images.shape[0] not in (2, 3):
        raise ValueError("input_images must have shape (2 or 3, m, n)")
    options = dict(options or {})
    maxiter = options.pop("maxiter", 100)
    gtol = options.pop("gtol", 0.1)

    mask = ~np.isfinite(input_images)
    fill = np.nanmin(input_images)
    imgs = np.where(mask, fill, input_images)
    mask_any = np.any(mask, axis=0)

    if padding > 0:
        imgs = np.pad(imgs, ((0, 0), (padding, padding), (padding, padding)), "edge")
        mask_any = np.pad(mask_any, ((padding, padding), (padding, padding)), "edge")

    if isinstance(sectors, (tuple, list)) and np.ndim(sectors[0]) > 0:
        sectors_i = np.sort(np.asarray(sectors[0]))  # coarse -> fine
        sectors_j = np.sort(np.asarray(sectors[1]))
    else:
        sectors_i = np.sort(np.asarray(sectors))
        sectors_j = sectors_i

    pairs = list(zip(sectors_i, sectors_j))
    if first_guess is None:
        guess = np.zeros((2, int(pairs[0][0]), int(pairs[0][1])))
        di, dj = _global_shift(imgs[0], imgs[1])
        guess[0] += di
        guess[1] += dj
    else:
        guess = np.asarray(first_guess, dtype=np.float64)
    if max_disp == "auto":
        # gather-free warp on accelerators; the XLA coordinate gather is
        # fine on CPU and the unrolled shifts only slow its compile.
        # "shift" = recentre the warp on the integer global displacement
        # (the template is pre-shifted once on host), so max_disp only
        # has to cover the RESIDUAL deformation — warp cost is linear in
        # max_disp, and the residual is small for advective flows.
        max_disp = None if jax.default_backend() == "cpu" else "shift"
    if max_disp == "shift":
        gshift = (round_int(guess[0].mean()), round_int(guess[1].mean()))
    else:
        gshift = (0, 0)
    scaling_guesses = []
    prev = pairs[0]

    for n_scale, (si, sj) in enumerate(pairs):
        # pad image so sectors divide evenly
        pad_i = get_padding(imgs.shape[1], si)
        pad_j = get_padding(imgs.shape[2], sj)
        if (pad_i, pad_j) != ((0, 0), (0, 0)):
            _imgs = np.pad(imgs, ((0, 0), pad_i, pad_j), "edge")
            _mask = np.pad(mask_any, (pad_i, pad_j), "edge")
        else:
            _imgs, _mask = imgs, mask_any

        if n_scale > 0:
            guess = zoom(
                guess, (1, si / prev[0], sj / prev[1]), order=1, mode="nearest"
            )

        m, n = _imgs.shape[1:]
        interp_arrays = _interp_matrices(m, n, int(si), int(sj))
        if max_disp == "shift":
            # residual bound after recentring: how far the current guess
            # strays from the global shift, plus optimizer headroom
            resid = np.max(
                np.abs(guess - np.asarray(gshift).reshape(2, 1, 1))
            )
            md_scale = int(np.clip(np.ceil(resid) + 6, 8, 24))
        else:
            md_scale = max_disp
            if md_scale is not None:
                md_scale = int(md_scale)
        cost_factory = (
            functools.partial(_make_cost_sharded, mesh=mesh)
            if mesh is not None
            else functools.partial(
                _make_cost, max_disp=md_scale,
                center_shift=gshift if max_disp == "shift" else (0, 0),
            )
        )

        def _preshift(img):
            if max_disp != "shift" or gshift == (0, 0) or mesh is not None:
                return img
            ii = np.clip(np.arange(m) - gshift[0], 0, m - 1)
            jj = np.clip(np.arange(n) - gshift[1], 0, n - 1)
            return img[ii][:, jj]

        if mesh is None:
            # all consecutive pairs share the flow: stack them into ONE
            # multi-channel cost (one warp pass per Adam step)
            templates = jnp.asarray(
                np.stack([_preshift(_imgs[a]) for a in range(_imgs.shape[0] - 1)]),
                jnp.float32,
            )
            targets = jnp.asarray(_imgs[1:], jnp.float32)
            pairs_cost = [
                cost_factory(
                    templates, targets, jnp.asarray(_mask), smooth_gain,
                    (int(si), int(sj)), interp_arrays,
                )
            ]
        else:
            pairs_cost = []
            for a, b in zip(
                range(_imgs.shape[0] - 1), range(1, _imgs.shape[0])
            ):
                pairs_cost.append(
                    cost_factory(
                        jnp.asarray(_preshift(_imgs[a]), jnp.float32),
                        jnp.asarray(_imgs[b], jnp.float32),
                        jnp.asarray(_mask),
                        smooth_gain,
                        (int(si), int(sj)),
                        interp_arrays,
                    )
                )

        # on-device Adam minimization of the jitted cost (the reference uses
        # scipy CG on the Cython cost+gradient; float32 device math breaks
        # scipy's Wolfe line searches, and a fixed-step first-order loop
        # stays entirely on the accelerator)
        # per-scale budget: every Adam step costs the same (the warp
        # dominates, independent of sector count), but the coarse scales
        # optimize 8-32 parameters that converge well before 150 steps —
        # their job is only to seed the finer scales (r5 profile: each
        # scale's fixed 150 steps was ~1.0 s of a 4.2 s solve)
        n_scale_steps = (
            max(maxiter, 150)
            if max(int(si), int(sj)) > 4
            else max(maxiter, 80)
        )
        x, final_cost = _minimize_adam(
            pairs_cost, jnp.asarray(guess.ravel(), jnp.float32),
            n_steps=n_scale_steps,
        )
        guess = np.asarray(x, np.float64).reshape(guess.shape)
        if verbose:
            print(f"VET scale {si}x{sj}: cost={final_cost:.4g}")
        scaling_guesses.append(guess[::-1] if indexing == "yx" else guess)
        prev = (si, sj)

    # upsample sector displacement to the full grid
    m, n = imgs.shape[1:]
    # account for the final scale's sector padding when zooming up
    pad_i = get_padding(m, prev[0])
    pad_j = get_padding(n, prev[1])
    mi = m + pad_i[0] + pad_i[1]
    nj = n + pad_j[0] + pad_j[1]
    dense = zoom(
        guess, (1, mi / prev[0], nj / prev[1]), order=1, mode="nearest"
    )
    dense = dense[:, pad_i[0] : mi - pad_i[1], pad_j[0] : nj - pad_j[1]]
    if indexing == "yx":
        dense = dense[::-1]
    if padding > 0:
        dense = dense[:, padding:-padding, padding:-padding]
    if intermediate_steps:
        return dense, scaling_guesses
    return dense
