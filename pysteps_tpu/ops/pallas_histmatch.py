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
    value transfer, wet-area-ratio adjustment, zero-pixel override)."""
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
