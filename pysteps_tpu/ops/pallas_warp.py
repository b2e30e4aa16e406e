"""
Pallas TPU kernel for the bounded-displacement axis resample — the hot
primitive of semi-Lagrangian advection.

The source field stays resident in VMEM; each (8, n) output tile loops
over the ~(2D+8)/8 source-row chunks it can touch and uses Mosaic's
single-vreg ``take_along_axis`` gather (the only gather shape the TPU
vectorizes) plus range masks.  Compared with the XLA shift-decomposition
(ops/warp.py::_axis_resample) this re-reads ~(2D+8)/8 rows per tile from
VMEM instead of streaming 2D+2 full-field copies from HBM.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 8  # f32 sublane count — also the max vreg-gather span


def _resample0_kernel(D, m, n, field_ref, idx_ref, frac_ref, out_ref):
    i0 = pl.program_id(0) * _TILE
    # edge-clamp the absolute row indices (same semantics as the padded
    # XLA shift path); the clamped values always fall inside some chunk
    idx0 = jnp.clip(idx_ref[:], 0, m - 1)
    idx1 = jnp.clip(idx_ref[:] + 1, 0, m - 1)
    frac = frac_ref[:]
    acc0 = jnp.zeros((_TILE, n), jnp.float32)
    acc1 = jnp.zeros((_TILE, n), jnp.float32)

    n_chunks = (2 * D + _TILE) // _TILE + 2
    for c in range(n_chunks):
        start = i0 - D + c * _TILE
        start_c = pl.multiple_of(jnp.clip(start, 0, m - _TILE), _TILE)
        chunk = field_ref[pl.ds(start_c, _TILE), :]  # (TILE, n)
        rel0 = idx0 - start_c
        g0 = jnp.take_along_axis(chunk, jnp.clip(rel0, 0, _TILE - 1), axis=0)
        acc0 = jnp.where((rel0 >= 0) & (rel0 < _TILE), g0, acc0)
        rel1 = idx1 - start_c
        g1 = jnp.take_along_axis(chunk, jnp.clip(rel1, 0, _TILE - 1), axis=0)
        acc1 = jnp.where((rel1 >= 0) & (rel1 < _TILE), g1, acc1)

    out_ref[:] = acc0 * (1.0 - frac) + acc1 * frac


@functools.partial(jax.jit, static_argnames=("D",))
def pallas_resample0(field, idx0, frac, D):
    """Axis-0 linear resample: out(i,j) = lerp(field[idx0(i,j), j],
    field[idx0+1, j]).  idx0 must already be clipped to [i-D, i+D]."""
    m, n = field.shape
    assert m % _TILE == 0, "rows must be a multiple of 8"
    D = int(-(-D // _TILE) * _TILE)  # round up so chunk starts stay aligned
    kernel = functools.partial(_resample0_kernel, D, m, n)
    return pl.pallas_call(
        kernel,
        grid=(m // _TILE,),
        in_specs=[
            pl.BlockSpec((m, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_TILE, n), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
    )(field.astype(jnp.float32), idx0.astype(jnp.int32), frac.astype(jnp.float32))


def axis_resample_pallas(field, idx0, frac, D, axis):
    """Pallas-backed equivalent of ops.warp._axis_resample."""
    if axis == 1:
        return axis_resample_pallas(field.T, idx0.T, frac.T, D, 0).T
    i_grid = jax.lax.broadcasted_iota(jnp.int32, field.shape, 0)
    idx0c = jnp.clip(idx0, i_grid - D, i_grid + D)
    return pallas_resample0(field, idx0c, frac, D)
