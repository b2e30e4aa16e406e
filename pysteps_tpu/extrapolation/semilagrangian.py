"""
Semi-Lagrangian backward advection (reference:
pysteps/extrapolation/semilagrangian.py:21-266, scheme of Germann &
Zawadzki 2002).

TPU-native: the per-step displacement integration (midpoint rule) and the
field warp are fused jitted gathers; the lead-time loop is a ``lax.scan``.
``semilag_step`` is the incremental one-step core used inside model scan
loops (the reference achieves the same with ``displacement_prev`` caching,
nowcasts/utils.py:441-471).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pysteps_tpu.ops.warp import (
    bilinear_warp,
    sample_velocity_shifted,
    warp,
    warp_shifted,
    warp_shifted_multi,
)


def _sample_velocity(velocity, displacement):
    """Sample the (2, m, n) velocity field at positions displaced by
    ``displacement`` (edge-clamped, bilinear)."""
    m, n = velocity.shape[1:]
    yy, xx = jnp.meshgrid(
        jnp.arange(m, dtype=velocity.dtype),
        jnp.arange(n, dtype=velocity.dtype),
        indexing="ij",
    )
    cy = yy + displacement[1]
    cx = xx + displacement[0]
    vx = bilinear_warp(velocity[0], cy, cx, mode="nearest")
    vy = bilinear_warp(velocity[1], cy, cx, mode="nearest")
    return jnp.stack([vx, vy])


def integrate_displacement(
    velocity, displacement, td, n_iter=1, vel_timestep=1.0, max_disp=None
):
    """Advance the accumulated backward displacement by one interval ``td``
    using the midpoint rule with ``n_iter`` inner iterations
    (reference: semilagrangian.py:209-219).

    With ``max_disp`` set (static int bound on |displacement|), velocity
    sampling uses the shift-decomposition fast path instead of the scalar
    XLA gather.
    """
    if max_disp is not None:
        sample = lambda v, d: sample_velocity_shifted(v, d, max_disp)  # noqa: E731
    else:
        sample = _sample_velocity
    scale = td / vel_timestep
    if n_iter > 0:
        vel_inc = sample(velocity, displacement) * scale / n_iter
        for _ in range(n_iter):
            vel_inc = (
                sample(velocity, displacement - vel_inc / 2.0) * scale / n_iter
            )
            displacement = displacement - vel_inc
            vel_inc = sample(velocity, displacement) * scale / n_iter
    else:
        vel_inc = sample(velocity, displacement) * scale
        displacement = displacement - vel_inc
    return displacement


def coarsen_velocity(velocity, coarse=4):
    """Block-average a (2, m, n) velocity field for coarse-grid
    integration (values stay in full-resolution pixel units)."""
    if coarse <= 1:
        return velocity
    m, n = velocity.shape[1:]
    mc, nc = m // coarse, n // coarse
    return jnp.mean(velocity.reshape(2, mc, coarse, nc, coarse), axis=(2, 4))


def integrate_displacement_coarse(
    vel_c, disp_c, td, n_iter=1, vel_timestep=1.0, max_disp=None, coarse=4
):
    """Midpoint displacement integration entirely on the coarse grid.

    The semi-Lagrangian displacement is the time integral of a smooth
    (IDW/sector-interpolated) flow, so integrating it at 1/coarse
    resolution and bilinearly upsampling once per step for the field warp
    costs O(coarse^2) less HBM traffic per member-step with O(coarse^2 *
    d2v) error.  ``disp_c`` is (2, mc, nc) in full-resolution pixel units
    at coarse grid positions; the velocity field must be pre-averaged with
    :func:`coarsen_velocity`.
    """
    if coarse <= 1:
        return integrate_displacement(
            vel_c, disp_c, td, n_iter=n_iter, vel_timestep=vel_timestep,
            max_disp=max_disp,
        )
    Dc = max(int(-(-(max_disp or coarse) // coarse)), 1)

    def sample(d):
        return warp_shifted_multi(vel_c, d / coarse, Dc, mode="nearest")

    scale = td / vel_timestep
    if n_iter > 0:
        vel_inc = sample(disp_c) * scale / n_iter
        for _ in range(n_iter):
            vel_inc = sample(disp_c - vel_inc / 2.0) * scale / n_iter
            disp_c = disp_c - vel_inc
    else:
        disp_c = disp_c - sample(disp_c) * scale
    return disp_c


_upsample_mats = {}


def _bilinear_upsample_matrix(n_out, n_in):
    """2-banded interpolation matrix reproducing jax.image.resize's
    "bilinear" upscale (triangle kernel, half-pixel centres, edge clamp)."""
    scale = n_out / n_in
    i = np.arange(n_out)
    src = (i + 0.5) / scale - 0.5
    lo = np.floor(src).astype(int)
    w = (src - lo).astype(np.float32)
    U = np.zeros((n_out, n_in), np.float32)
    np.add.at(U, (i, np.clip(lo, 0, n_in - 1)), 1.0 - w)
    np.add.at(U, (i, np.clip(lo + 1, 0, n_in - 1)), w)
    return U


def upsample_displacement(disp_c, shape, coarse=4):
    """Bilinearly upsample a coarse displacement field to (2, m, n).

    Implemented as two small dense matmuls (MXU work) rather than
    jax.image.resize's gather path; the interpolation matrices are host
    numpy constants (axon: eager device constants embedded in jit closures
    trigger D2H readbacks, see CLAUDE.md)."""
    if coarse <= 1:
        return disp_c
    m, n = shape
    mc, nc = disp_c.shape[1:]
    key = (m, mc, n, nc)
    if key not in _upsample_mats:
        _upsample_mats[key] = (
            _bilinear_upsample_matrix(m, mc),
            _bilinear_upsample_matrix(n, nc),
        )
    Uy, Ux = _upsample_mats[key]
    return jnp.einsum("ya,cab,xb->cyx", Uy, disp_c, Ux)


def upsample_planes(disp_c, shape, coarse):
    """Bilinear-upsample a coarse displacement into the three planes the
    fused Pallas warp kernels consume: ``dy`` at (m, n) and the (2, n, m)
    transposed (dx, dy) pair — two small matmuls, no index/fraction
    planes in HBM."""
    m, n = shape
    if coarse <= 1:
        return disp_c[1], jnp.swapaxes(disp_c, 1, 2)
    mc, nc = disp_c.shape[1:]
    key = (m, mc, n, nc)
    if key not in _upsample_mats:
        _upsample_mats[key] = (
            _bilinear_upsample_matrix(m, mc),
            _bilinear_upsample_matrix(n, nc),
        )
    Uy, Ux = _upsample_mats[key]
    dy = jnp.einsum("ya,ab,xb->yx", Uy, disp_c[1], Ux)
    disp_t = jnp.einsum("ya,cab,xb->cxy", Uy, disp_c, Ux)
    return dy, disp_t


def model_warp(field, displacement, max_disp=None, interp_order=1, cval=jnp.nan):
    """Warp used inside the model scan loops: shift-decomposition fast path
    when a static displacement bound is available, exact gather otherwise."""
    if max_disp is not None and interp_order == 1:
        return warp_shifted(field, displacement, max_disp, cval=cval)
    return warp(field, displacement, order=interp_order, cval=cval)


def model_warp_coarse(
    field, disp_c, shape, coarse, max_disp=None, interp_order=1, cval=jnp.nan
):
    """Upsample a coarse displacement and warp in one fused TPU path.

    On TPU the bilinear upsample runs as the same two small matmuls as
    :func:`upsample_displacement` but emits only the three displacement
    planes the fused Pallas warp consumes (dy at (m, n); dx, dy at the
    transposed (n, m) layout), and the warp itself
    (ops/pallas_warp.py::warp_fused_pallas) computes sampling coordinates
    in-kernel — no index/fraction planes ever reach HBM.  Elsewhere (or
    for non-bilinear orders) falls back to upsample + model_warp."""
    from pysteps_tpu.ops.warp import _use_pallas

    m, n = shape
    if (
        max_disp is not None
        and interp_order == 1
        and coarse > 1
        and m % 8 == 0
        and n % 8 == 0
        and _use_pallas()
    ):
        try:
            from pysteps_tpu.ops.pallas_warp import warp_fused_pallas

            dy, disp_t = upsample_planes(disp_c, shape, coarse)
            return warp_fused_pallas(field, dy, disp_t, int(max_disp), cval)
        except Exception:  # noqa: BLE001 — Mosaic unavailable: XLA fallback
            pass
    return model_warp(
        field,
        upsample_displacement(disp_c, shape, coarse),
        max_disp=max_disp,
        interp_order=interp_order,
        cval=cval,
    )


def semilag_step(
    field,
    velocity,
    displacement,
    td=1.0,
    n_iter=1,
    vel_timestep=1.0,
    interp_order=1,
    outval=jnp.nan,
):
    """One incremental semi-Lagrangian step: integrate displacement over
    ``td`` and warp ``field`` along it.  Returns (warped, displacement)."""
    displacement = integrate_displacement(
        velocity, displacement, td, n_iter=n_iter, vel_timestep=vel_timestep
    )
    warped = warp(field, displacement, order=interp_order, cval=outval)
    return warped, displacement


@functools.partial(
    jax.jit, static_argnames=("n_iter", "interp_order", "max_disp")
)
def _extrapolate_core(
    field, velocity, timestep_diffs, n_iter, interp_order, outval,
    displacement_init, vel_timestep, max_disp=None,
):
    def body(displacement, td):
        disp = integrate_displacement(
            velocity, displacement, td, n_iter=n_iter,
            vel_timestep=vel_timestep, max_disp=max_disp,
        )
        warped = model_warp(
            field, disp, max_disp=max_disp, interp_order=interp_order,
            cval=outval,
        )
        return disp, warped

    displacement, fields = jax.lax.scan(body, displacement_init, timestep_diffs)
    return fields, displacement


def extrapolate(
    precip,
    velocity,
    timesteps,
    outval=np.nan,
    xy_coords=None,
    allow_nonfinite_values=False,
    vel_timestep=1,
    **kwargs,
):
    """Semi-Lagrangian extrapolation with the reference's public signature
    (reference: semilagrangian.py:21).

    timesteps: int (number of unit steps) or ascending list of float lead
    times.  Other kwargs: displacement_prev, n_iter, return_displacement,
    interp_order (0 or 1).
    """
    del xy_coords  # grid coordinates are implicit (pixel units)
    displacement_prev = kwargs.get("displacement_prev", None)
    n_iter = kwargs.get("n_iter", 1)
    return_displacement = kwargs.get("return_displacement", False)
    interp_order = kwargs.get("interp_order", 1)

    if interp_order not in (0, 1, 3):
        raise NotImplementedError("interp_order must be 0, 1 or 3")

    velocity = jnp.asarray(velocity, jnp.float32)
    if precip is None and not return_displacement:
        raise ValueError("precip is None but return_displacement is False")

    if isinstance(timesteps, int):
        timestep_list = np.arange(1, timesteps + 1, dtype=np.float64)
        vel_timestep = 1.0
    else:
        timestep_list = np.asarray(timesteps, dtype=np.float64)
        if np.any(np.diff(timestep_list) <= 0.0):
            raise ValueError("the timestep sequence is not monotonically increasing")
    timestep_diffs = jnp.asarray(
        np.hstack([[timestep_list[0]], np.diff(timestep_list)]), jnp.float32
    )

    if precip is not None:
        precip = jnp.asarray(precip, jnp.float32)
        if outval == "min":
            outval = float(jnp.nanmin(precip))

    if displacement_prev is not None:
        displacement_init = jnp.asarray(displacement_prev, jnp.float32)
    else:
        displacement_init = jnp.zeros_like(velocity)

    field = precip if precip is not None else jnp.zeros(velocity.shape[1:])
    # data-independent displacement cap on accelerators (the XLA gather
    # warp is scalar on TPU, ~1 s for 12 steps at 512^2): same 48-px rule
    # as the STEPS wrapper — the Pallas resample bounds its chunk loops by
    # the rows actually touched, so the oversized static bound is ~free
    m_, n_ = velocity.shape[1:]
    max_disp = (
        48
        if (
            jax.default_backend() != "cpu"
            and int(interp_order) == 1
            and min(m_, n_) >= 3 * 48
        )
        else None
    )
    fields, displacement = _extrapolate_core(
        field,
        velocity,
        timestep_diffs,
        int(n_iter),
        int(interp_order),
        jnp.float32(outval) if precip is not None else jnp.float32(np.nan),
        displacement_init,
        jnp.float32(vel_timestep),
        max_disp,
    )

    if precip is None:
        return None, displacement
    if return_displacement:
        return fields, displacement
    return fields
