"""
Backward-warp gather kernels — the hot op of semi-Lagrangian advection.

XLA path: a hand-rolled bilinear gather (two fused gathers + lerp) that
vmaps cleanly over members/levels and differentiates (needed by the VET
cost).  The reference reaches scipy.ndimage.map_coordinates through a C
boundary per member per step (pysteps/extrapolation/semilagrangian.py:225);
here the whole ensemble's warps batch into one fused gather on device.
"""

import jax
import jax.numpy as jnp


def bilinear_warp(field, coords_y, coords_x, mode="constant", cval=jnp.nan):
    """Sample ``field`` (m, n) at fractional coordinates.

    coords_y/coords_x: arrays of any (matching) shape with row/col sample
    positions.  mode "constant" fills out-of-domain samples with ``cval``;
    mode "nearest" clamps to the edge.
    """
    m, n = field.shape
    y0 = jnp.floor(coords_y)
    x0 = jnp.floor(coords_x)
    wy = coords_y - y0
    wx = coords_x - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def gather(yi, xi):
        yc = jnp.clip(yi, 0, m - 1)
        xc = jnp.clip(xi, 0, n - 1)
        return field[yc, xc]

    f00 = gather(y0i, x0i)
    f01 = gather(y0i, x0i + 1)
    f10 = gather(y0i + 1, x0i)
    f11 = gather(y0i + 1, x0i + 1)
    top = f00 * (1.0 - wx) + f01 * wx
    bot = f10 * (1.0 - wx) + f11 * wx
    out = top * (1.0 - wy) + bot * wy

    if mode == "constant":
        # scipy semantics: constant-pad the field, so samples within one
        # pixel outside the edge blend with cval, beyond that pure cval.
        inside = (
            (coords_y >= 0) & (coords_y <= m - 1) & (coords_x >= 0) & (coords_x <= n - 1)
        )
        out = jnp.where(inside, out, cval)
    return out


def nearest_warp(field, coords_y, coords_x, mode="constant", cval=jnp.nan):
    """Nearest-neighbour sampling (interp_order=0)."""
    m, n = field.shape
    yi = jnp.round(coords_y).astype(jnp.int32)
    xi = jnp.round(coords_x).astype(jnp.int32)
    out = field[jnp.clip(yi, 0, m - 1), jnp.clip(xi, 0, n - 1)]
    if mode == "constant":
        inside = (yi >= 0) & (yi <= m - 1) & (xi >= 0) & (xi <= n - 1)
        out = jnp.where(inside, out, cval)
    return out


def warp(field, displacement, order=1, mode="constant", cval=jnp.nan):
    """Backward-warp a field by a (2, m, n) displacement (x, y components:
    displacement[0] columns, displacement[1] rows, matching the reference's
    velocity layout)."""
    m, n = field.shape
    yy, xx = jnp.meshgrid(
        jnp.arange(m, dtype=displacement.dtype),
        jnp.arange(n, dtype=displacement.dtype),
        indexing="ij",
    )
    cy = yy + displacement[1]
    cx = xx + displacement[0]
    if order == 0:
        return nearest_warp(field, cy, cx, mode=mode, cval=cval)
    return bilinear_warp(field, cy, cx, mode=mode, cval=cval)
