"""
Fused Pallas kernel for the STEPS spatial chain:
PWL CDF match -> dilated rim mask -> semi-Lagrangian warp.

Per member-step the scan runs three field-sized stages between the
inverse and forward spectral hops (reference semantics:
postprocessing/probmatching.py:55, nowcasts/utils.py:69/steps.py:1192,
extrapolation/semilagrangian).  As separate kernels they cost ~17 field
passes of HBM traffic plus a VPU-bound 128-edge comparison cube per
pixel (measured r5: match 52 us + rim 7 us + warp 49 us per member at
512^2 while a field pass costs ~3 us).  Fused, the matched field lives
in VMEM scratch and is consumed in place by both the rim
distance-transform and the vertical resample, and the PWL map is
evaluated hierarchically with the sublane-gather formulation
(ops/pallas_histmatch.py::_pwl_gather_kernel):

* 8 coarse compares pick the 16-edge block;
* span-8 sublane ``take_along_axis`` gathers select the block's 15
  fine edges, deltas and prefix sums from an f32 (8, 48) table —
  exact, no MXU contraction (the one-hot-matmul variant this replaced
  was bound by its padded MXU contraction, ~6% utilization);
* 15 fine compares finish the segment sum.

The kernel pair
(vertical stage + rim, then horizontal stage on the transposed
intermediate) keeps every intermediate except one XLA transpose out of
HBM: ~10 field passes total.

Layout contract: fields are (m, n) f32 with m, n multiples of 8; the
hierarchy needs K = 128 edges split as 16 x 8.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 128
G = 16   # coarse blocks
L = 8    # edges per block
_TILE = 8
_BIG = 1e9
INTERPRET = False
# whole-field kernels: ~5 persistent + ~4 transient field buffers must
# sit under the 16 MB scoped-vmem stack
from pysteps_tpu.tuning import CHAIN_MAX_FIELD_BYTES as _MAX_FIELD_BYTES


def supported(shape):
    m, n = shape
    return (
        m % 128 == 0 and n % 128 == 0
        and m * n * 4 <= _MAX_FIELD_BYTES
    )


def _bf16_mask(v):
    """Top-16-bit truncation via bit masking (an f32->bf16->f32 round
    trip would be elided by XLA's simplifier)."""
    bits = jax.lax.bitcast_convert_type(v, jnp.uint32)
    return jax.lax.bitcast_convert_type(
        bits & jnp.uint32(0xFFFF0000), jnp.float32
    )


def pack_hier_lut(edges, d0, d1):
    """Repack the flat K-edge PWL coefficients into the hierarchical
    form the fused kernel evaluates.

    Returns ``(e16, M3)``: the 16 block-start edges (G, 1) and the
    (72, 16) stationary selection matrix — bf16-exact triples of
    [7 fine edges | 7 d0 | 7 d1 | prefix0 | prefix1 | pad] per block,
    where prefix includes the block's first delta (its edge is the
    block start, active whenever the block is selected).
    """
    e_blk = edges.reshape(G, L)
    b0 = d0.reshape(G, L)
    b1 = d1.reshape(G, L)
    pb0 = jnp.concatenate(
        [jnp.zeros(1, d0.dtype), jnp.cumsum(jnp.sum(b0, 1))]
    )[:G] + b0[:, 0]
    pb1 = jnp.concatenate(
        [jnp.zeros(1, d1.dtype), jnp.cumsum(jnp.sum(b1, 1))]
    )[:G] + b1[:, 0]
    M = jnp.concatenate(
        [
            e_blk[:, 1:].T, b0[:, 1:].T, b1[:, 1:].T,
            pb0[None], pb1[None], jnp.zeros((1, G), jnp.float32),
        ],
        axis=0,
    )  # (24, G)
    a = _bf16_mask(M)
    r1 = M - a
    b = _bf16_mask(r1)
    M3 = jnp.concatenate([a, b, r1 - b], axis=0)  # (72, G)
    return e_blk[:, 0].reshape(G, 1), M3


def _pwl_hier(x, e16, Mv):
    """Evaluate the hierarchical PWL map on a (RC, n) chunk.

    ``e16``: (G, 1) block-start edges; ``Mv``: (RC, 72, G) broadcast
    selection matrix (bf16).  Exact: the one-hot H is 0/1, each bf16
    pass selects its split exactly, and the three splits sum to f32.
    """
    S = (x[:, None, :] >= e16[None, :, :]).astype(jnp.bfloat16)
    H = S - jnp.concatenate([S[:, 1:], jnp.zeros_like(S[:, :1])], axis=1)
    t = jax.lax.dot_general(
        Mv, H, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    sel = t[:, :24] + t[:, 24:48] + t[:, 48:72]
    ef = sel[:, 0:7]
    d0s = sel[:, 7:14]
    d1s = sel[:, 14:21]
    pb0 = sel[:, 21]
    pb1 = sel[:, 22]
    sf = (x[:, None, :] >= ef).astype(jnp.float32)
    return pb0 + jnp.sum(d0s * sf, axis=1) + x * (
        pb1 + jnp.sum(d1s * sf, axis=1)
    )


def _chunk_lerp(src, idx0, idx1, frac, lanes):
    """Gather rows idx0/idx1 from a VMEM ref by visiting only the row
    chunks the tile touches (see ops/pallas_warp.py)."""
    c_lo = jnp.min(idx0) // _TILE
    c_hi = jnp.max(idx1) // _TILE

    def body(c, carry):
        acc0, acc1 = carry
        start_c = pl.multiple_of(c * _TILE, _TILE)
        chunk = src[pl.ds(start_c, _TILE), :]
        rel0 = idx0 - start_c
        g0 = jnp.take_along_axis(chunk, jnp.clip(rel0, 0, _TILE - 1), axis=0)
        acc0 = jnp.where((rel0 >= 0) & (rel0 < _TILE), g0, acc0)
        rel1 = idx1 - start_c
        g1 = jnp.take_along_axis(chunk, jnp.clip(rel1, 0, _TILE - 1), axis=0)
        acc1 = jnp.where((rel1 >= 0) & (rel1 < _TILE), g1, acc1)
        return acc0, acc1

    acc0 = jnp.zeros((_TILE, lanes), jnp.float32)
    acc1 = jnp.zeros((_TILE, lanes), jnp.float32)
    acc0, acc1 = jax.lax.fori_loop(c_lo, c_hi + 1, body, (acc0, acc1))
    return acc0 * (1.0 - frac) + acc1 * frac


def _k1_kernel(m, n, D, kr, r, rc, do_rim,
               x_ref, e8_ref, T_ref, scal_ref, dy_ref,
               c_ref, mask_ref, matched_s):
    """Stage 1: PWL match into VMEM scratch, then vertical resample and
    (optionally) the bounded-L1 rim mask, both reading the scratch.

    The match stage is the r5 sublane-gather formulation (see
    ops/pallas_histmatch.py::_pwl_gather_kernel): the one-hot matmul it
    replaces was bound by a padded MXU contraction, not the compare
    cube — the gather apply measured 2.5x faster standalone."""
    q0 = scal_ref[0, 0]
    thr = scal_ref[0, 1]
    zval = scal_ref[0, 2]
    ztrg = scal_ref[0, 3]
    e8 = e8_ref[...]  # (8, 1)
    T = T_ref[...]  # (8, 48)
    cols = [
        jnp.broadcast_to(T[:, c : c + 1], (8, n)) for c in range(47)
    ]

    def pwl_chunk(i, _):
        for u in range(rc // 8):
            r0 = pl.multiple_of(i * rc + u * 8, 8)
            x = x_ref[pl.ds(r0, 8), :]
            idx = jnp.zeros((8, n), jnp.int32)
            for g in range(1, 8):
                idx += (x >= e8[g, 0]).astype(jnp.int32)

            def col(c):
                return jnp.take_along_axis(cols[c], idx, axis=0)

            acc0 = col(45)
            acc1 = col(46)
            for j in range(15):
                sf = (x >= col(j)).astype(jnp.float32)
                acc0 += col(15 + j) * sf
                acc1 += col(30 + j) * sf
            out = q0 + acc0 + x * acc1
            # dry-pixel override (probmatching.py:110 semantics)
            matched_s[pl.ds(r0, 8), :] = jnp.where(x == zval, ztrg, out)
        return 0

    jax.lax.fori_loop(0, m // rc, pwl_chunk, 0)

    def v_tile(ti, _):
        i0 = pl.multiple_of(ti * _TILE, _TILE)
        rowv = i0 + jax.lax.broadcasted_iota(jnp.int32, (_TILE, n), 0)
        cy = rowv.astype(jnp.float32) + dy_ref[pl.ds(i0, _TILE), :]
        y0 = jnp.floor(cy)
        frac = cy - y0
        y0i = jnp.clip(y0.astype(jnp.int32), rowv - D, rowv + D)
        idx0 = jnp.clip(y0i, 0, m - 1)
        idx1 = jnp.clip(y0i + 1, 0, m - 1)
        c_ref[pl.ds(i0, _TILE), :] = _chunk_lerp(
            matched_s, idx0, idx1, frac, n
        )
        return 0

    jax.lax.fori_loop(0, m // _TILE, v_tile, 0)

    if do_rim:
        R = kr + r
        d = jnp.where(matched_s[...] >= thr, 0.0, _BIG)
        row = jax.lax.broadcasted_iota(jnp.int32, (m, n), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1)
        for axis, size, idx in ((0, m, row), (1, n, col)):
            s = 1
            while s <= R:
                fwd = jnp.where(
                    idx >= size - s, _BIG, pltpu.roll(d, size - s, axis)
                )
                bwd = jnp.where(idx < s, _BIG, pltpu.roll(d, s, axis))
                d = jnp.minimum(d, jnp.minimum(fwd, bwd) + float(s))
                s *= 2
        mask_ref[...] = jnp.clip((kr + r + 1.0 - d) / (r + 1.0), 0.0, 1.0)
    else:
        mask_ref[...] = jnp.zeros((m, n), jnp.float32)


def _k2_kernel(m, n, D, ct_ref, dxt_ref, dyt_ref, scal_ref, out_ref, outt_s):
    """Stage 2: horizontal resample on the transposed intermediate, with
    the constant-mode out-of-domain fill, transposed back on the way out."""
    cval = scal_ref[0, 0]

    def h_tile(tj, _):
        j0 = pl.multiple_of(tj * _TILE, _TILE)
        colj = j0 + jax.lax.broadcasted_iota(jnp.int32, (_TILE, m), 0)
        cx = colj.astype(jnp.float32) + dxt_ref[pl.ds(j0, _TILE), :]
        x0 = jnp.floor(cx)
        frac = cx - x0
        x0i = jnp.clip(x0.astype(jnp.int32), colj - D, colj + D)
        idx0 = jnp.clip(x0i, 0, n - 1)
        idx1 = jnp.clip(x0i + 1, 0, n - 1)
        out = _chunk_lerp(ct_ref, idx0, idx1, frac, m)
        rowi = jax.lax.broadcasted_iota(
            jnp.int32, (_TILE, m), 1
        ).astype(jnp.float32)
        cy = rowi + dyt_ref[pl.ds(j0, _TILE), :]
        inside = (cy >= 0) & (cy <= m - 1) & (cx >= 0) & (cx <= n - 1)
        outt_s[pl.ds(j0, _TILE), :] = jnp.where(inside, out, cval)
        return 0

    jax.lax.fori_loop(0, n // _TILE, h_tile, 0)
    out_ref[...] = outt_s[...].T


@functools.partial(
    jax.jit, static_argnames=("D", "kr", "r", "do_rim")
)
def match_warp_rim(field, e8, T, q0, zval, ztrg, thr, dy, disp_t, cval,
                   D, kr, r, do_rim=True):
    """Fused PWL CDF match + dilated rim mask + bilinear warp.

    ``field``: (m, n) masked forecast; ``e8``/``T``: gather LUT from
    :func:`pysteps_tpu.ops.pallas_histmatch.pack_gather_lut`; ``dy``:
    (m, n) vertical displacement; ``disp_t``: (2, n, m) transposed
    displacement planes; ``D``: static displacement bound.  Returns
    ``(warped, rim_mask)`` — equivalent to ``match_cdf_pwl`` +
    ``compute_dilated_mask_from_field`` + ``warp_fused_pallas`` at a
    third of the HBM passes.
    """
    m, n = field.shape
    D = int(-(-D // _TILE) * _TILE)
    rc = 32
    scal1 = jnp.stack(
        [q0, thr, zval, ztrg]
    ).astype(jnp.float32).reshape(1, 4)
    C, mask = pl.pallas_call(
        functools.partial(_k1_kernel, m, n, D, int(kr), int(r), rc,
                          bool(do_rim)),
        in_specs=[
            pl.BlockSpec((m, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 48), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, n), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((m, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, n), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, n), jnp.float32),
            jax.ShapeDtypeStruct((m, n), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((m, n), jnp.float32)],
        interpret=INTERPRET,
    )(
        field.astype(jnp.float32), e8, T, scal1, dy.astype(jnp.float32)
    )
    scal2 = jnp.asarray(cval, jnp.float32).reshape(1, 1)
    out = pl.pallas_call(
        functools.partial(_k2_kernel, m, n, D),
        in_specs=[
            pl.BlockSpec((n, m), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, m), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, m), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n, m), jnp.float32)],
        interpret=INTERPRET,
    )(
        C.T, disp_t[0].astype(jnp.float32), disp_t[1].astype(jnp.float32),
        scal2,
    )
    return out, mask
