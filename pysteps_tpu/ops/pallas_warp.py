"""
Pallas TPU kernel for the bounded-displacement axis resample — the hot
primitive of semi-Lagrangian advection.

The source field stays resident in VMEM; each (8, n) output tile loops
over the ~(2D+8)/8 source-row chunks it can touch and uses Mosaic's
single-vreg ``take_along_axis`` gather (the only gather shape the TPU
vectorizes) plus range masks.  Compared with the XLA shift-decomposition
(ops/warp.py::_axis_resample) this re-reads ~(2D+8)/8 rows per tile from
VMEM instead of streaming 2D+2 full-field copies from HBM.

Grids whose full field exceeds the ~16 MB scoped-VMEM stack (2048^2 f32
is 16.78 MB) are split into LANE strips: axis-0 resampling is columnwise
independent, so a (m, n_strip) field block with the strip index as the
OUTER grid dimension (Mosaic hoists the unchanged field copy across the
inner row-tile loop) gives identical results with bounded VMEM.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 8  # f32 sublane count — also the max vreg-gather span
INTERPRET = False  # tests run the kernels via the Pallas interpreter
# field-block byte budget: Mosaic DOUBLE-BUFFERS blocks whose index map
# changes across the grid, so the strip path holds 2x this next to the
# small (8, strip) tiles — 6 MB keeps the stack well under the 16 MB
# scoped-VMEM limit (measured: an 8 MB budget overflowed by 192 KB)
from pysteps_tpu.tuning import WARP_FIELD_VMEM_BUDGET as _FIELD_VMEM_BUDGET


def _lane_strip(m, n):
    """Widest lane strip (multiple of 128, divisor of n) whose (m, strip)
    f32 field block fits the VMEM budget; n itself when the whole field
    fits.  Raises ValueError when even a 128-lane strip is too tall —
    callers catch and take the XLA shift path."""
    if m * n * 4 <= _FIELD_VMEM_BUDGET:
        return n
    max_strip = _FIELD_VMEM_BUDGET // (m * 4)
    for strip in range(max_strip - max_strip % 128, 0, -128):
        if n % strip == 0:
            return strip
    raise ValueError(f"no lane strip fits VMEM for shape {(m, n)}")


def _resample0_kernel(D, m, n, field_ref, idx_ref, frac_ref, out_ref):
    del D
    # edge-clamp the absolute row indices (same semantics as the padded
    # XLA shift path); the clamped values always fall inside some chunk
    idx0 = jnp.clip(idx_ref[:], 0, m - 1)
    idx1 = jnp.clip(idx_ref[:] + 1, 0, m - 1)
    frac = frac_ref[:]

    # dynamic chunk bounds: the displacement field is smooth, so the rows a
    # tile actually touches span ~1-3 chunks — far fewer than the static
    # worst case (2D+8)/8.  A data-dependent fori_loop visits only those.
    c_lo = jnp.min(idx0) // _TILE
    c_hi = jnp.max(idx1) // _TILE
    acc0 = jnp.zeros((_TILE, n), jnp.float32)
    acc1 = jnp.zeros((_TILE, n), jnp.float32)

    def body(c, carry):
        acc0, acc1 = carry
        start_c = pl.multiple_of(c * _TILE, _TILE)
        chunk = field_ref[pl.ds(start_c, _TILE), :]  # (TILE, n)
        rel0 = idx0 - start_c
        g0 = jnp.take_along_axis(chunk, jnp.clip(rel0, 0, _TILE - 1), axis=0)
        acc0 = jnp.where((rel0 >= 0) & (rel0 < _TILE), g0, acc0)
        rel1 = idx1 - start_c
        g1 = jnp.take_along_axis(chunk, jnp.clip(rel1, 0, _TILE - 1), axis=0)
        acc1 = jnp.where((rel1 >= 0) & (rel1 < _TILE), g1, acc1)
        return acc0, acc1

    acc0, acc1 = jax.lax.fori_loop(c_lo, c_hi + 1, body, (acc0, acc1))
    out_ref[:] = acc0 * (1.0 - frac) + acc1 * frac


@functools.partial(jax.jit, static_argnames=("D",))
def pallas_resample0(field, idx0, frac, D):
    """Axis-0 linear resample: out(i,j) = lerp(field[idx0(i,j), j],
    field[idx0+1, j]).  idx0 must already be clipped to [i-D, i+D]."""
    m, n = field.shape
    assert m % _TILE == 0, "rows must be a multiple of 8"
    D = int(-(-D // _TILE) * _TILE)  # round up so chunk starts stay aligned
    strip = _lane_strip(m, n)
    kernel = functools.partial(_resample0_kernel, D, m, strip)
    if strip == n:
        grid = (m // _TILE,)
        f_spec = pl.BlockSpec((m, n), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
        t_spec = pl.BlockSpec((_TILE, n), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    else:
        # strip index OUTER so the (m, strip) field block is copied once
        # per strip, not once per row tile
        grid = (n // strip, m // _TILE)
        f_spec = pl.BlockSpec((m, strip), lambda j, i: (0, j),
                              memory_space=pltpu.VMEM)
        t_spec = pl.BlockSpec((_TILE, strip), lambda j, i: (i, j),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[f_spec, t_spec, t_spec],
        out_specs=t_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        interpret=INTERPRET,
    )(field.astype(jnp.float32), idx0.astype(jnp.int32), frac.astype(jnp.float32))


def axis_resample_pallas(field, idx0, frac, D, axis):
    """Pallas-backed equivalent of ops.warp._axis_resample."""
    if axis == 1:
        return axis_resample_pallas(field.T, idx0.T, frac.T, D, 0).T
    i_grid = jax.lax.broadcasted_iota(jnp.int32, field.shape, 0)
    idx0c = jnp.clip(idx0, i_grid - D, i_grid + D)
    return pallas_resample0(field, idx0c, frac, D)


def _chunk_lerp(field_ref, idx0, idx1, frac, n):
    """Shared accumulation loop: gather rows idx0/idx1 from the VMEM field
    by visiting only the row chunks the tile actually touches."""
    c_lo = jnp.min(idx0) // _TILE
    c_hi = jnp.max(idx1) // _TILE

    def body(c, carry):
        acc0, acc1 = carry
        start_c = pl.multiple_of(c * _TILE, _TILE)
        chunk = field_ref[pl.ds(start_c, _TILE), :]
        rel0 = idx0 - start_c
        g0 = jnp.take_along_axis(chunk, jnp.clip(rel0, 0, _TILE - 1), axis=0)
        acc0 = jnp.where((rel0 >= 0) & (rel0 < _TILE), g0, acc0)
        rel1 = idx1 - start_c
        g1 = jnp.take_along_axis(chunk, jnp.clip(rel1, 0, _TILE - 1), axis=0)
        acc1 = jnp.where((rel1 >= 0) & (rel1 < _TILE), g1, acc1)
        return acc0, acc1

    acc0 = jnp.zeros((_TILE, n), jnp.float32)
    acc1 = jnp.zeros((_TILE, n), jnp.float32)
    acc0, acc1 = jax.lax.fori_loop(c_lo, c_hi + 1, body, (acc0, acc1))
    return acc0 * (1.0 - frac) + acc1 * frac


def _warp_v_kernel(D, m, n, pid_axis, field_ref, dy_ref, out_ref):
    """Vertical resample with in-kernel coordinates: out(i,j) =
    lerp(field[floor(i+dy), j], field[floor(i+dy)+1, j])."""
    i0 = pl.program_id(pid_axis) * _TILE
    row = i0 + jax.lax.broadcasted_iota(jnp.int32, (_TILE, n), 0)
    cy = row.astype(jnp.float32) + dy_ref[:]
    y0 = jnp.floor(cy)
    frac = cy - y0
    y0i = jnp.clip(y0.astype(jnp.int32), row - D, row + D)
    idx0 = jnp.clip(y0i, 0, m - 1)
    idx1 = jnp.clip(y0i + 1, 0, m - 1)
    out_ref[:] = _chunk_lerp(field_ref, idx0, idx1, frac, n)


def _warp_h_kernel(D, m, n, masked, pid_axis, strip, ct_ref, dxt_ref, dyt_ref,
                   cval_ref, out_ref):
    """Horizontal resample on the TRANSPOSED intermediate (n, m): sublane
    index = original column j, lanes = original row i.  When ``masked``,
    applies the constant-mode out-of-domain fill using both displacement
    components (the mask is evaluated at the original (i, j) position,
    matching ops.warp.warp_shifted)."""
    j0 = pl.program_id(pid_axis) * _TILE
    # lane axis = original row index; global offset of this lane strip
    lane0 = pl.program_id(0) * strip if pid_axis else 0
    colj = j0 + jax.lax.broadcasted_iota(jnp.int32, (_TILE, strip), 0)
    cx = colj.astype(jnp.float32) + dxt_ref[:]
    x0 = jnp.floor(cx)
    frac = cx - x0
    x0i = jnp.clip(x0.astype(jnp.int32), colj - D, colj + D)
    idx0 = jnp.clip(x0i, 0, n - 1)
    idx1 = jnp.clip(x0i + 1, 0, n - 1)
    out = _chunk_lerp(ct_ref, idx0, idx1, frac, strip)
    if masked:
        rowi = (
            lane0
            + jax.lax.broadcasted_iota(jnp.int32, (_TILE, strip), 1)
        ).astype(jnp.float32)
        cy = rowi + dyt_ref[:]
        inside = (cy >= 0) & (cy <= m - 1) & (cx >= 0) & (cx <= n - 1)
        out = jnp.where(inside, out, cval_ref[0, 0])
    out_ref[:] = out


def _strip_specs(rows, lanes, strip):
    """(grid, field_spec, tile_spec, scalar_spec, row_pid_axis) for a
    rows x lanes array resampled along sublanes, lane axis split into
    ``strip``-wide blocks (strip == lanes: original 1-D grid)."""
    if strip == lanes:
        return (
            (rows // _TILE,),
            pl.BlockSpec((rows, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            0,
        )
    return (
        (lanes // strip, rows // _TILE),
        pl.BlockSpec((rows, strip), lambda j, i: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((_TILE, strip), lambda j, i: (i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
        1,
    )


@functools.partial(jax.jit, static_argnames=("D", "masked"))
def warp_fused_pallas(field, dy, disp_t, D, cval, masked=True):
    """Bilinear shift-decomposition warp with in-kernel coordinate math.

    ``dy`` is the (m, n) vertical displacement component; ``disp_t`` the
    (2, n, m) transposed displacement (models that carry coarse
    displacement produce both for free from the matmul upsample).
    Equivalent to ops.warp.warp_shifted (mode="constant" when masked,
    "nearest" otherwise) but without materializing index/fraction planes
    in HBM."""
    m, n = field.shape
    assert m % _TILE == 0 and n % _TILE == 0
    D = int(-(-D // _TILE) * _TILE)
    strip_v = _lane_strip(m, n)
    grid, f_spec, t_spec, _, pid_axis = _strip_specs(m, n, strip_v)
    C = pl.pallas_call(
        functools.partial(_warp_v_kernel, D, m, strip_v, pid_axis),
        grid=grid,
        in_specs=[f_spec, t_spec],
        out_specs=t_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        interpret=INTERPRET,
    )(field.astype(jnp.float32), dy.astype(jnp.float32))
    strip_h = _lane_strip(n, m)
    grid, f_spec, t_spec, s_spec, pid_axis = _strip_specs(n, m, strip_h)
    out_t = pl.pallas_call(
        functools.partial(
            _warp_h_kernel, D, m, n, bool(masked), pid_axis, strip_h
        ),
        grid=grid,
        in_specs=[f_spec, t_spec, t_spec, s_spec],
        out_specs=t_spec,
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        interpret=INTERPRET,
    )(
        C.T,
        disp_t[0].astype(jnp.float32),
        disp_t[1].astype(jnp.float32),
        jnp.asarray(cval, jnp.float32).reshape(1, 1),
    )
    return out_t.T
