"""
Pallas TPU kernels for piecewise-linear empirical-CDF matching.

``nonparam_match_empirical_cdf`` (reference: postprocessing/probmatching.py:55)
runs once per (member, lead time) in every stochastic nowcast.  The
sort-based formulation costs two O(n log^2 n) comparator-network sorts per
call.  Here the match is a monotone piecewise-linear quantile map evaluated
with comparison matrices and one small stationary matmul — no sorts, no
gathers (XLA gathers are scalar on TPU):

1. The forecast CDF at 128 value edges, measured on a sorted 4096-element
   systematic subsample (rank error <= stride, ~2.4e-4 of the mass) with
   the extreme-tail edges counted exactly (``cdf_counts`` remains the
   exact-count kernel for full-field counting needs).
2. A tiny LUT build in plain XLA: the target quantile at each edge's rank
   comes from merging the edge ranks into the pre-binned target CDF (one
   16.5k-element ``sort_key_val`` pair); the target value is affine in the
   target-bin index, so no gather is needed.  The reference's wet-area-
   ratio adjustment (probmatching.py:106-112) is applied to the quantile
   knots, and dry pixels are overridden exactly as in the sort path.
3. ``pwl_apply``: every pixel goes through the 128-segment linear map as
   out = q0 + cum @ d0 + x * (cum @ d1), where cum[j] = 1[x >= e_j] and
   (d0, d1) are double-bfloat16 delta rows of a stationary (128, 128)
   weight tile — one MXU matmul per row chunk, f32-accurate.

Value knots sit on the forecast quantiles at the 128 edges (up to the
subsample rank resolution; exact in the upper tail), so the matched output
tracks the exact sort-based match at those quantiles; in between, the map
is linear (the same approximation the reference's PMM interpolator makes,
probmatching.py:144-192).  The exact sort path remains the public
matcher's default.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# set True (tests) to run the kernels in the Pallas interpreter on CPU
INTERPRET = False

K = 128  # PWL edges / CDF measurement points
B_T = 16384  # target CDF bins (value resolution: range / B_T)
_TILE = 2048  # sublane rows of the (rows, 128) field view per grid step
from pysteps_tpu.tuning import HISTMATCH_ROWS_PER_CHUNK as _RC


def _chunk_rows(nrows):
    """In-kernel chunk: the tuned _RC when it divides the tile, else the
    whole (small) tile."""
    return _RC if nrows % _RC == 0 else nrows


def _cdf_kernel(nrows, x_ref, e_ref, out_ref):
    e = e_ref[...]  # (K, 1) f32
    rc = _chunk_rows(nrows)

    def chunk(i, acc):
        x = x_ref[pl.ds(i * rc, rc), :]
        cum = (x[:, None, :] >= e[None, :, :]).astype(jnp.float32)
        return acc + jnp.sum(cum, axis=(0, 2)).reshape(K, 1)

    out_ref[0] = jax.lax.fori_loop(
        0, nrows // rc, chunk, jnp.zeros((K, 1), jnp.float32)
    )


def _pwl_kernel(nrows, x_ref, e_ref, w_ref, q0_ref, out_ref):
    e = e_ref[...]  # (K, 1)
    rc = _chunk_rows(nrows)
    # only the 6 delta rows (bf16x3 splits of d0 and d1) are nonzero, so
    # the weight block is (8, K), not (K, K): 16x fewer MXU flops than a
    # square stationary matrix
    w = jnp.broadcast_to(w_ref[...].astype(jnp.bfloat16)[None], (rc, 8, K))
    q0 = q0_ref[0, 0]

    def chunk(i, _):
        x = x_ref[pl.ds(i * rc, rc), :]
        cum = (x[:, None, :] >= e[None, :, :]).astype(jnp.bfloat16)
        # (r, 8, Ke) @ (r, Ke, p) -> (r, 8, p): stationary weights on MXU
        t = jax.lax.dot_general(
            w, cum, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        out_ref[pl.ds(i * rc, rc), :] = (
            q0
            + (t[:, 0] + t[:, 1] + t[:, 2])
            + x * (t[:, 3] + t[:, 4] + t[:, 5])
        )
        return 0

    jax.lax.fori_loop(0, nrows // rc, chunk, 0)


def _pwl_hier_kernel(nrows, x_ref, e16_ref, M3_ref, scal_ref, out_ref):
    """Hierarchical 2-level PWL apply (see ops/pallas_chain.py): 16
    coarse compares -> exact one-hot -> one stationary (72, 16) MXU
    matmul -> 7 fine compares, ~5x less VPU compare work than the flat
    128-edge cube.  Grid-tiled, so it serves the large grids the
    whole-field fused chain cannot (>512^2); the dry-pixel override is
    folded in (one fewer XLA field pass)."""
    from pysteps_tpu.ops.pallas_chain import G, _pwl_hier

    e16 = e16_ref[...]  # (G, 1)
    rc = _chunk_rows(nrows)
    Mv = jnp.broadcast_to(
        M3_ref[...].astype(jnp.bfloat16)[None], (rc, 72, G)
    )
    q0 = scal_ref[0, 0]
    zval = scal_ref[0, 1]
    ztrg = scal_ref[0, 2]

    def chunk(i, _):
        x = x_ref[pl.ds(i * rc, rc), :]
        out = q0 + _pwl_hier(x, e16, Mv)
        out_ref[pl.ds(i * rc, rc), :] = jnp.where(x == zval, ztrg, out)
        return 0

    jax.lax.fori_loop(0, nrows // rc, chunk, 0)


def pack_gather_lut(edges, d0, d1):
    """Repack the flat K-edge PWL coefficients for the sublane-gather
    apply kernel: 8 coarse blocks x 16 fine edges.

    Returns ``(e8, T)``: the 8 block-start edges (8, 1) and the (8, 48)
    f32 table [15 fine edges | 15 d0 | 15 d1 | prefix0 | prefix1 |
    pad], where prefix includes the block's first delta (its edge is
    the block start, active whenever the block is selected).  Raw f32 —
    the per-pixel sublane gather is exact, so no bf16 split triples."""
    eb = edges.reshape(8, 16)
    b0 = d0.reshape(8, 16)
    b1 = d1.reshape(8, 16)
    pb0 = jnp.concatenate(
        [jnp.zeros(1, d0.dtype), jnp.cumsum(jnp.sum(b0, 1))]
    )[:8] + b0[:, 0]
    pb1 = jnp.concatenate(
        [jnp.zeros(1, d1.dtype), jnp.cumsum(jnp.sum(b1, 1))]
    )[:8] + b1[:, 0]
    T = jnp.concatenate(
        [
            eb[:, 1:], b0[:, 1:], b1[:, 1:],
            pb0[:, None], pb1[:, None], jnp.zeros((8, 1), jnp.float32),
        ],
        axis=1,
    )  # (8, 48)
    return eb[:, 0].reshape(8, 1), T


def _pwl_gather_kernel(nrows, x_ref, e8_ref, T_ref, scal_ref, out_ref):
    """Matmul-free hierarchical PWL apply.  Both the flat 128-compare
    kernel and the one-hot matmul kernel are bound by a padded MXU
    contraction (~700 us/member at 2048^2 regardless of formulation:
    the systolic array pads M and K to 128, so useful utilization is
    ~6-7% either way).  Here the per-pixel block index (8 coarse
    compares) drives span-8 sublane ``take_along_axis`` gathers of the
    block's 15 fine edges / deltas / prefix sums from an f32 table —
    ~100 VPU ops per pixel-vreg, no MXU, exact f32."""
    q0 = scal_ref[0, 0]
    zval = scal_ref[0, 1]
    ztrg = scal_ref[0, 2]
    e8 = e8_ref[...]  # (8, 1)
    T = T_ref[...]  # (8, 48)
    # pixel-independent: broadcast each table column to one (8, 128)
    # vreg once, outside the pixel loop
    cols = [
        jnp.broadcast_to(T[:, c : c + 1], (8, 128)) for c in range(47)
    ]

    def chunk(i, _):
        # 4 unrolled 8-row groups per iteration (the gather span is one
        # vreg = 8 sublanes for f32)
        for u in range(4):
            r0 = pl.multiple_of(i * 32 + u * 8, 8)
            x = x_ref[pl.ds(r0, 8), :]
            idx = jnp.zeros((8, 128), jnp.int32)
            for g in range(1, 8):
                idx += (x >= e8[g, 0]).astype(jnp.int32)

            def col(c):
                return jnp.take_along_axis(cols[c], idx, axis=0)

            acc0 = col(45)  # prefix0
            acc1 = col(46)  # prefix1
            for j in range(15):
                sf = (x >= col(j)).astype(jnp.float32)
                acc0 += col(15 + j) * sf
                acc1 += col(30 + j) * sf
            out = q0 + acc0 + x * acc1
            out_ref[pl.ds(r0, 8), :] = jnp.where(x == zval, ztrg, out)
        return 0

    jax.lax.fori_loop(0, nrows // 32, chunk, 0)


@jax.jit
def pwl_apply_gather(field, e8, T, q0, zval, ztrg):
    """Sublane-gather PWL apply with the dry override fused in;
    ``e8``/``T`` from :func:`pack_gather_lut`."""
    rows = field.size // 128
    x = field.reshape(rows, 128)
    tr = _tile_rows(rows)
    scal = jnp.stack(
        [q0, zval, ztrg, jnp.float32(0.0)]
    ).astype(jnp.float32).reshape(1, 4)
    out = pl.pallas_call(
        functools.partial(_pwl_gather_kernel, tr),
        grid=(rows // tr,),
        in_specs=[
            pl.BlockSpec((tr, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 48), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tr, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        interpret=INTERPRET,
    )(x, e8, T, scal)
    return out.reshape(field.shape)


def _tile_rows(rows):
    if rows % _TILE == 0:
        return _TILE
    for tr in (_RC, 16, 8):
        if rows % tr == 0:
            return tr
    return rows


@jax.jit
def cdf_counts(field, edges):
    """#(x >= e_j) for K edges; exact integer counts as f32 (< 2^24)."""
    rows = field.size // 128
    x = field.reshape(rows, 128)
    tr = _tile_rows(rows)
    parts = pl.pallas_call(
        functools.partial(_cdf_kernel, tr),
        grid=(rows // tr,),
        in_specs=[
            pl.BlockSpec((tr, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, K, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows // tr, K, 1), jnp.float32),
        interpret=INTERPRET,
    )(x, edges.reshape(K, 1))
    return jnp.sum(parts, axis=0).reshape(K)


@jax.jit
def pwl_apply(field, edges, w, q0):
    """Evaluate the K-segment monotone piecewise-linear map
    out = q0 + cum@w[0:3] + x*(cum@w[3:6]) with cum_j = 1[x >= e_j];
    ``w`` is the (8, K) delta-row block (rows 6-7 zero padding)."""
    rows = field.size // 128
    x = field.reshape(rows, 128)
    tr = _tile_rows(rows)
    out = pl.pallas_call(
        functools.partial(_pwl_kernel, tr),
        grid=(rows // tr,),
        in_specs=[
            pl.BlockSpec((tr, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tr, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        interpret=INTERPRET,
    )(x, edges.reshape(K, 1), w, q0.reshape(1, 1))
    return out.reshape(field.shape)


@jax.jit
def pwl_apply_hier(field, e16, M3, q0, zval, ztrg):
    """Hierarchical PWL apply with the dry override fused in:
    out = q0 + PWL(x) except out = ztrg where x == zval.  ``e16``/``M3``
    come from :func:`pysteps_tpu.ops.pallas_chain.pack_hier_lut`."""
    from pysteps_tpu.ops.pallas_chain import G

    rows = field.size // 128
    x = field.reshape(rows, 128)
    tr = _tile_rows(rows)
    scal = jnp.stack(
        [q0, zval, ztrg, jnp.float32(0.0)]
    ).astype(jnp.float32).reshape(1, 4)
    out = pl.pallas_call(
        functools.partial(_pwl_hier_kernel, tr),
        grid=(rows // tr,),
        in_specs=[
            pl.BlockSpec((tr, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((72, G), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tr, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        interpret=INTERPRET,
    )(x, e16, M3, scal)
    return out.reshape(field.shape)


def supported(shape):
    """Fast path requires the flattened field to tile into (8, 128)
    sublane-lane blocks (the kernel picks the largest dividing chunk)."""
    size = 1
    for s in shape:
        size *= int(s)
    return size % (128 * 8) == 0 and size >= 128 * _RC


def prepare_target(ranked, zvalue_trg):
    """Bin the pre-sorted match target once per forecast.

    Returns the pytree consumed by :func:`match_cdf_pwl`:
    (ranked, zvalue_trg, C_t inclusive-cumulative counts (B_T,), tlo,
    tscale, n_wet_trg).
    """
    tlo = ranked[0]
    thi = ranked[-1]
    tscale = (B_T - 1.0) / jnp.maximum(thi - tlo, 1e-12)
    tbins = jnp.clip(
        jnp.round((ranked - tlo) * tscale).astype(jnp.int32), 0, B_T - 1
    )
    # ranked is sorted, so counts per bin = segment boundaries; a one-hot
    # matmul-free histogram: C_t[v] = #(tbins <= v) via searchsorted-by-
    # merge of the (already sorted) bins against 0..B_T-1
    iota = jnp.arange(B_T, dtype=jnp.int32)
    keys = jnp.concatenate([tbins * 2, iota * 2 + 1])
    payload = jnp.concatenate(
        [jnp.full(ranked.shape, B_T, jnp.int32), iota]
    )
    _, p1 = jax.lax.sort_key_val(keys, payload)
    is_x = (p1 == B_T).astype(jnp.int32)
    xb = jnp.cumsum(is_x) - is_x  # #(tbins <= v) at each query position
    _, c_t = jax.lax.sort_key_val(p1, xb)
    c_t = c_t[:B_T]
    n_wet_trg = jnp.sum(ranked > zvalue_trg)
    return ranked, zvalue_trg, c_t, tlo, tscale, n_wet_trg


def build_pwl_coeffs(initial, tstate):
    """LUT build for the PWL match: knot placement, exact-rank
    measurement, target quantiles, wet-area adjustment, delta rows.

    Returns ``(edges, d0, d1, q0, zvalue, zvalue_trg)`` — everything the
    apply kernels (flat or hierarchical) need.  Traceable; runs once per
    (member, lead) inside the scan."""
    ranked, zvalue_trg, c_t, tlo, tscale, n_wet_trg = tstate
    size = initial.size
    init = initial.reshape(-1)

    lo = jnp.min(init)
    hi = jnp.max(init)
    span = jnp.maximum(hi - lo, 1e-12)

    # knot placement — three families, so that between adjacent knots both
    # the input mass and the output span stay small:
    #   * uniform in forecast value (range coverage),
    #   * equiprobable in forecast rank (strided slice of a sorted
    #     subsample: dense where the forecast CDF is steep),
    #   * uniform in TARGET value, mapped back through the forecast
    #     inverse CDF (dense where the transfer map is steep).
    # Exactness does not depend on placement: ranks at the knots are
    # measured exactly below.
    n_uni, n_quant, n_tail, n_cliff = 24, 48, 8, 2
    n_out = K - n_uni - n_quant - n_tail - n_cliff
    uniform = lo + span * (jnp.arange(n_uni, dtype=jnp.float32) / (n_uni - 1.0))
    n_sub = min(4096, size)
    stride = size // n_sub
    sub = jnp.sort(init[: n_sub * stride : stride])
    quant = sub[:: n_sub // n_quant][:n_quant]
    # log-spaced top-rank knots: the target quantile function is steepest
    # in its extreme upper tail
    tail = sub[n_sub - (1 << jnp.arange(n_tail))]
    # target levels uniform in value -> target ranks (strided from C_t) ->
    # forecast values at those ranks via the subsample
    rank_u = c_t[:: B_T // n_out][:n_out]
    pos = jnp.clip(rank_u // stride, 0, n_sub - 1)
    outk = sub[pos]
    # knots tightly bracketing the target's dry/wet rank: a near-zero-width
    # segment makes the PWL map reproduce the CDF jump sharply there
    n_dry_trg = size - n_wet_trg
    # the bracket is narrower than the slope threshold below, so the cliff
    # segment gets slope 0 and the map steps discontinuously at e_c —
    # keeping every coefficient bounded by the target range (a steep
    # linear ramp would need |c0| ~ jump/width and break f32/bf16)
    e_c = sub[jnp.clip(n_dry_trg // stride, 0, n_sub - 1)]
    cliff = jnp.stack([e_c - span * 1e-8, e_c])
    edges = jnp.sort(jnp.concatenate([uniform, quant, tail, outk, cliff]))

    # forecast CDF at the edges: r_j = #(x < e_j).  Ranks come from the
    # already-sorted subsample (systematic sample: error <= stride ranks,
    # ~2.4e-4 of the field mass at 512^2), which removes one of the two
    # 128-comparison sweeps over the full field (the former cdf_counts
    # pass).  The extreme upper tail is the exception — there a few ranks
    # of error is many dB of value — so the top edges are counted exactly
    # with one fused (size, n_tail_exact) compare-reduce.
    n_tail_exact = 16
    r_sub = stride * jnp.sum(
        (sub[None, :] < edges[:, None]).astype(jnp.float32), axis=1
    )
    e_tail = edges[K - n_tail_exact :]
    r_tail = size - jnp.sum(
        (init[:, None] >= e_tail[None, :]).astype(jnp.float32), axis=0
    )
    r = jnp.concatenate(
        [r_sub[: K - n_tail_exact], r_tail]
    ).astype(jnp.int32)

    # target quantile at each edge rank: q_j = value of first target bin v
    # with C_t(v) > r_j, i.e. v_j = #(C_t <= r_j).  A broadcast-compare
    # count (K x B_T bools, fused into the reduction by XLA) — cheaper
    # than merging by sort, which would re-sort the constant C_t every
    # member-step
    v = jnp.sum((c_t[None, :] <= r[:, None]).astype(jnp.int32), axis=1)
    q = tlo + (v.astype(jnp.float32) + 0.5) / tscale
    q = jnp.minimum(q, ranked[-1])

    # wet-area-ratio adjustment (reference: probmatching.py:106-112)
    zvalue = lo
    n_wet_init = jnp.sum(init > zvalue)
    war = n_wet_init / size
    p_idx = jnp.clip(
        jnp.round((1.0 - war) * (size - 1)).astype(jnp.int32), 0, size - 1
    )
    p = ranked[p_idx]
    q = jnp.where((n_wet_trg > n_wet_init) & (q < p), zvalue_trg, q)
    # quantile knots must stay monotone after the adjustment
    q = jax.lax.associative_scan(jnp.maximum, q)

    # PWL coefficients: segment j covers [e_j, e_{j+1}); flat above e_{K-1};
    # duplicate knots make empty segments (slope 0, deltas telescope)
    de = edges[1:] - edges[:-1]
    tiny = span * 1e-7
    slope = jnp.concatenate(
        [jnp.where(de > tiny, (q[1:] - q[:-1]) / jnp.maximum(de, tiny), 0.0),
         jnp.zeros((1,))]
    )
    c0 = jnp.concatenate([q[:-1] - slope[:-1] * edges[:-1], q[-1:]])
    d0 = jnp.diff(c0, prepend=q[:1])
    d1 = jnp.diff(slope, prepend=jnp.zeros((1,)))
    return edges, d0, d1, q[0], zvalue, zvalue_trg


@jax.jit
def match_cdf_pwl(initial, tstate):
    """Piecewise-linear equivalent of ``_match_cdf_presorted``
    (reference: postprocessing/probmatching.py:55 semantics: rank-conserving
    value transfer, wet-area-ratio adjustment, zero-pixel override).
    Applies via the sublane-gather hierarchical kernel (r5: the flat
    128-compare and one-hot-matmul kernels are both bound by a padded
    MXU contraction at ~640 us/member at 2048^2; the gather kernel
    measured 2.5x faster apply, ~380 us less per member-step full).
    Falls back to the matmul-hierarchical kernel when the field does
    not tile into the gather kernel's 32-row chunks."""
    from pysteps_tpu.ops.pallas_chain import pack_hier_lut

    shape = initial.shape
    init = initial.reshape(-1)
    edges, d0, d1, q0, zvalue, zvalue_trg = build_pwl_coeffs(init, tstate)
    if _tile_rows(init.size // 128) % 32 == 0:
        e8, T = pack_gather_lut(edges, d0, d1)
        out = pwl_apply_gather(init, e8, T, q0, zvalue, zvalue_trg)
    else:
        e16, M3 = pack_hier_lut(edges, d0, d1)
        out = pwl_apply_hier(init, e16, M3, q0, zvalue, zvalue_trg)
    return out.reshape(shape)


@jax.jit
def match_cdf_pwl_flat(initial, tstate):
    """Flat 128-edge-compare variant of :func:`match_cdf_pwl` (the r3-r4
    kernel) — kept as the comparison/fallback path."""
    shape = initial.shape
    init = initial.reshape(-1)
    edges, d0, d1, q0, zvalue, zvalue_trg = build_pwl_coeffs(init, tstate)
    # triple-bfloat16 split of the delta rows: the MXU consumes bf16, and
    # three rows reconstruct f32-accurate sums even for steep segments.
    # The split masks mantissa bits (bf16 == the top 16 bits of an f32)
    # rather than round-tripping f32->bf16->f32, which XLA's algebraic
    # simplifier may elide under jit, silently zeroing the residual rows.
    def bf16_trunc(vals):
        bits = jax.lax.bitcast_convert_type(vals, jnp.uint32)
        return jax.lax.bitcast_convert_type(
            bits & jnp.uint32(0xFFFF0000), jnp.float32
        )

    def split3(vals):
        a = bf16_trunc(vals)
        r1 = vals - a
        b = bf16_trunc(r1)
        return a, b, r1 - b

    w = jnp.zeros((8, K), jnp.float32)
    for i, row in enumerate(split3(d0) + split3(d1)):
        w = w.at[i].set(row)

    out = pwl_apply(init, edges, w, q0)
    out = jnp.where(init == zvalue, zvalue_trg, out)
    return out.reshape(shape)
