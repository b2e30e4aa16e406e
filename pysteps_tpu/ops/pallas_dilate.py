"""
Pallas TPU kernel for the incremental-mask grayscale rim.

``compute_dilated_mask`` (reference: nowcasts/utils.py:69) builds
``sum_i 1[d1(x) <= kr+i] / (r+1)`` — kr binary dilations followed by r
accumulating dilations.  The XLA path runs ~2*(kr+r) reduce_window passes
through HBM per member-step; here the equivalent bounded L1 distance
transform runs entirely in VMEM:

    rim(x) = clip((kr + r + 1 - d1(x)) / (r + 1), 0, 1)

with d1 iterated as a 5-point min-plus stencil (kr + r iterations) on a
halo-padded row band per grid tile.  One HBM read + one write per tile.
The input is zero-padded by the halo on the row axis host-side so every
tile reads a statically-offset (tile_m + 2*halo, n) band.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# set True (tests) to run the kernels in the Pallas interpreter on CPU
INTERPRET = False

_BIG = 1e9


def _rim_kernel(kr, r, halo, n, tile_m, bands_ref, out_ref):
    """Each grid step sees its own pre-stacked overlapping row band
    (1, tile_m + 2*halo, n): overlapping bands cannot be expressed as
    BlockSpec tiles of the flat field, a whole-field VMEM block overflows
    the 16 MB scoped stack at 2048^2 (measured 36.5 MB with the out
    tiles), and the ANY-memory-space + in-kernel DMA alternative does not
    compose with the member vmap the STEPS scan wraps around this call."""
    R = kr + r
    band = tile_m + 2 * halo
    buf = bands_ref[0]

    d = jnp.where(buf > 0, 0.0, _BIG)
    row = jax.lax.broadcasted_iota(jnp.int32, (band, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (band, n), 1)
    for _ in range(R):
        # pltpu.roll requires non-negative shifts: -1 == size-1; masked at
        # the buffer edges so the wraparound rows/cols never contribute
        up = jnp.where(row == band - 1, _BIG, pltpu.roll(d, band - 1, 0))
        down = jnp.where(row == 0, _BIG, pltpu.roll(d, 1, 0))
        left = jnp.where(col == n - 1, _BIG, pltpu.roll(d, n - 1, 1))
        right = jnp.where(col == 0, _BIG, pltpu.roll(d, 1, 1))
        nearest = jnp.minimum(
            jnp.minimum(up, down), jnp.minimum(left, right)
        )
        d = jnp.minimum(d, nearest + 1.0)

    rim = jnp.clip((kr + r + 1.0 - d) / (r + 1.0), 0.0, 1.0)
    out_ref[:] = rim[halo : halo + tile_m]


def _rim_kernel_whole(kr, r, thr_ref, field_ref, out_ref):
    """Single-tile variant: the whole field sits in VMEM, the mask is
    thresholded in-kernel (field >= thr), and no halo padding is needed
    because the shifts are edge-masked.

    The bounded L1 distance transform is separable (min-plus over x, then
    over y), and each 1-D pass uses power-of-2 jump doubling: any offset
    |d| <= 2^(k+1)-1 decomposes into distinct powers of two with exact
    total cost, so ~log2(R) rounds of 2 shifts replace R rounds of 4."""
    R = kr + r
    m, n = field_ref.shape
    d = jnp.where(field_ref[...] >= thr_ref[0, 0], 0.0, _BIG)
    row = jax.lax.broadcasted_iota(jnp.int32, (m, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1)
    for axis, size, idx in ((0, m, row), (1, n, col)):
        s = 1
        while s <= R:
            fwd = jnp.where(idx >= size - s, _BIG, pltpu.roll(d, size - s, axis))
            bwd = jnp.where(idx < s, _BIG, pltpu.roll(d, s, axis))
            d = jnp.minimum(d, jnp.minimum(fwd, bwd) + float(s))
            s *= 2
    out_ref[...] = jnp.clip((kr + r + 1.0 - d) / (r + 1.0), 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("kr", "r"))
def dilated_rim_from_field_pallas(field, thr, kr, r):
    """Fused threshold + grayscale rim for fields small enough to fit one
    VMEM tile (saves the separate threshold pass and the halo pad copy of
    the tiled path)."""
    m, n = field.shape
    kernel = functools.partial(_rim_kernel_whole, int(kr), int(r))
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        interpret=INTERPRET,
    )(jnp.asarray(thr, jnp.float32).reshape(1, 1), field.astype(jnp.float32))


def whole_field_ok(shape):
    """The single-tile kernel needs ~3 field-sized f32 buffers in VMEM.
    Keep a safety margin below the 16 MB scoped-vmem limit: at exactly
    1024^2 the old 12 MB bound passed while the real allocation overflowed
    the 16 MB stack limit by 512 B (Mosaic adds its own scratch)."""
    from pysteps_tpu.tuning import DILATE_WHOLE_FIELD_VMEM

    return shape[0] * shape[1] * 4 * 3 <= DILATE_WHOLE_FIELD_VMEM


@functools.partial(jax.jit, static_argnames=("kr", "r"))
def dilated_rim_pallas(mask, kr, r):
    """Grayscale rim mask (equivalent to nowcasts.utils.compute_dilated_mask)
    for a (m, n) boolean/float mask; kr/r static ints."""
    m, n = mask.shape
    kr, r = int(kr), int(r)
    halo = -(-(kr + r) // 8) * 8  # round the L1 radius up to sublane chunks
    # VMEM: double-buffered band + out blocks plus ~3 live (band, n)
    # stencil temporaries must stay under the 16 MB scoped stack (tile 256
    # at 2048 cols measured 18.52 MB); pick the largest tile fitting the
    # 5*band + 2*tile estimate in ~10 MB
    tile_m = None
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if m % cand == 0 and (
            5 * (cand + 2 * halo) + 2 * cand
        ) * n * 4 <= 10 * 1024 * 1024:
            tile_m = cand
            break
    if tile_m is None and (3 * m + 2 * halo) * n * 4 <= 10 * 1024 * 1024:
        tile_m = m  # no power-of-2 tile divides m, but one band fits
    if tile_m is None:
        raise ValueError(f"rim bands too wide for VMEM at shape {(m, n)}")
    band = tile_m + 2 * halo
    padded = jnp.pad(mask.astype(jnp.float32), ((halo, halo), (0, 0)))
    # pre-stack the overlapping bands: (G, band, n); one extra ~1.1x
    # field-sized HBM pass, ~free next to the R-iteration stencil
    n_tiles = m // tile_m
    bands = jnp.stack(
        [
            jax.lax.dynamic_slice(padded, (i * tile_m, 0), (band, n))
            for i in range(n_tiles)
        ]
    )
    kernel = functools.partial(_rim_kernel, kr, r, halo, n, tile_m)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, band, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (tile_m, n), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        interpret=INTERPRET,
    )(bands)
