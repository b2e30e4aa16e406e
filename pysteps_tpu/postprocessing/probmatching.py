"""
Probability matching (reference: pysteps/postprocessing/probmatching.py).

``nonparam_match_empirical_cdf`` — the op applied after every STEPS
recompose — is implemented as a pure jittable double-sort (XLA sort is the
TPU-native rank machine): sort the target, rank the forecast via
argsort-of-argsort, gather.  vmaps over ensemble members.
"""

import functools

import jax
import jax.numpy as jnp

# packed-sort quantization: value bits for sort 1 keys and sort 2 payloads.
# The matched output is quantized to 2^_VALUE_BITS levels over the target
# range (4096 levels over a typical 75 dB radar range = 0.018 dB steps).
_VALUE_BITS_MIN = 12


@functools.partial(jax.jit, static_argnames=("exact",))
def _match_cdf_presorted(initial, ranked, zvalue_trg, exact=False):
    """CDF matching against a pre-sorted target (the sorted observation is
    constant across members and lead times, so the scans sort it once).

    TPU-native rank plumbing (XLA gathers/scatters are scalar on TPU, sort
    is the native rank machine).  Two strategies:

    - exact: two ``sort_key_val`` passes — sort 1 pairs the forecast
      values with pixel ids, sort 2 routes the ranked target values back
      to pixel order.  Output values are exactly a permutation of the
      target's.
    - packed (default when the field is large enough): each pass becomes a
      *single-operand* uint32 sort with (quantized value | pixel id)
      packed into one word — ~25% faster on the v5e (sorts are
      compare-bound, but one stream instead of two).  Ranks are resolved
      at 32-len(id) bits of value precision with ties broken by pixel id,
      and the output is the dequantized target (sub-0.02 dB steps for
      radar fields); zero pixels stay exact.
    """
    shape = initial.shape
    init = initial.ravel()
    size = init.size

    zvalue = jnp.nanmin(init)
    idxzeros = init == zvalue

    # wet-area-ratio adjustment (reference: probmatching.py:106-112)
    n_wet_init = jnp.sum(init > zvalue)
    n_wet_trg = jnp.sum(ranked > zvalue_trg)
    war = n_wet_init / size
    p_idx = jnp.clip(
        jnp.round((1.0 - war) * (size - 1)).astype(jnp.int32), 0, size - 1
    )
    p = ranked[p_idx]
    ranked = jnp.where(
        (n_wet_trg > n_wet_init) & (ranked < p), zvalue_trg, ranked
    )

    index_bits = max(int(size - 1).bit_length(), 1)
    value_bits = 32 - index_bits
    if exact or value_bits < _VALUE_BITS_MIN:
        iota = jnp.arange(size, dtype=jnp.int32)
        _, orderin = jax.lax.sort_key_val(init, iota)
        _, out = jax.lax.sort_key_val(orderin, ranked)
    else:
        levels = jnp.uint32(2**value_bits - 1)
        iota = jnp.arange(size, dtype=jnp.uint32)
        # sort 1: rank the forecast by quantized value, tie-break by pixel
        lo, hi = jnp.min(init), jnp.max(init)
        scale = levels.astype(jnp.float32) / jnp.maximum(hi - lo, 1e-12)
        q = jnp.round((init - lo) * scale).astype(jnp.uint32)
        orderin = jnp.sort((q << index_bits) | iota) & jnp.uint32(
            2**index_bits - 1
        )
        # sort 2: route quantized target values back to pixel order
        tlo, thi = ranked[0], ranked[-1]
        tscale = levels.astype(jnp.float32) / jnp.maximum(thi - tlo, 1e-12)
        tq = jnp.round((ranked - tlo) * tscale).astype(jnp.uint32)
        s2 = jnp.sort((orderin << value_bits) | tq)
        out = (s2 & levels).astype(jnp.float32) / tscale + tlo
    out = jnp.where(idxzeros, zvalue_trg, out)
    return out.reshape(shape)


def _prepare_cdf_target(target):
    """Sort + NaN-fill the matching target once; returns (ranked, zvalue)."""
    targ = target.ravel()
    zvalue_trg = jnp.nanmin(targ)
    targ = jnp.where(jnp.isnan(targ), zvalue_trg, targ)
    return jnp.sort(targ), zvalue_trg


def prepare_cdf_matcher(target):
    """Build the per-forecast CDF-matching closure used by the nowcast hot
    loops: ``match_fn(field, state) -> matched field``.

    On TPU the match runs as a piecewise-linear quantile map evaluated with
    Pallas comparison/matmul kernels (``ops/pallas_histmatch.py``) — no
    per-step O(n log^2 n) sorts; elsewhere it falls back to the packed
    sort-based matcher.  The state is a pytree safe to close over a scan.
    """
    from pysteps_tpu.ops.warp import _use_pallas

    ranked, zvalue = _prepare_cdf_target(target)
    if _use_pallas():
        from pysteps_tpu.ops import pallas_histmatch

        if pallas_histmatch.supported(target.shape):
            state = pallas_histmatch.prepare_target(ranked, zvalue)
            return pallas_histmatch.match_cdf_pwl, state
    return (lambda f, s: _match_cdf_presorted(f, s[0], s[1])), (ranked, zvalue)


@jax.jit
def _match_cdf_core(initial, target):
    # the public matcher keeps the reference's exact semantics: output
    # values are a permutation of the target's
    ranked, zvalue_trg = _prepare_cdf_target(target)
    return _match_cdf_presorted(initial, ranked, zvalue_trg, exact=True)


def nonparam_match_empirical_cdf(initial_array, target_array, ignore_indices=None):
    """Match the empirical CDF of ``initial_array`` to ``target_array``,
    conserving ranks and zero pixels (reference: probmatching.py:55)."""
    initial = jnp.asarray(initial_array, jnp.float32)
    target = jnp.asarray(target_array, jnp.float32)
    if initial.size != target.size:
        raise ValueError(
            "dimension mismatch between initial_array and target_array"
        )
    if ignore_indices is not None:
        ignore = jnp.asarray(ignore_indices)
        if ignore.dtype != jnp.bool_:
            mask = jnp.zeros(initial.shape, bool).ravel().at[ignore].set(True)
            mask = mask.reshape(initial.shape)
        else:
            mask = ignore
        filled = jnp.where(mask, jnp.nanmin(initial), initial)
        out = _match_cdf_core(filled, target)
        return jnp.where(mask, initial, out)
    return _match_cdf_core(initial, target)


def compute_empirical_cdf(bin_edges, hist):
    """Empirical CDF from a histogram (reference: probmatching.py:24)."""
    bin_edges = jnp.asarray(bin_edges)
    hist = jnp.asarray(hist)
    widths = bin_edges[1:] - bin_edges[:-1]
    cdf = jnp.concatenate([jnp.zeros(1), jnp.cumsum(widths * hist)])
    return cdf / cdf[-1]


def pmm_init(bin_edges_1, cdf_1, bin_edges_2, cdf_2):
    """Initialize a probability-matching-method interpolator
    (reference: probmatching.py:144)."""
    return {
        "bin_edges_1": jnp.asarray(bin_edges_1),
        "cdf_1": jnp.asarray(cdf_1),
        "bin_edges_2": jnp.asarray(bin_edges_2),
        "cdf_2": jnp.asarray(cdf_2),
    }


def pmm_compute(pmm, x):
    """Map values through CDF_1 then inverse CDF_2
    (reference: probmatching.py:171)."""
    x = jnp.asarray(x)
    p = jnp.interp(x, pmm["bin_edges_1"], pmm["cdf_1"])
    mask = p > 0.9999999
    out = jnp.interp(p, pmm["cdf_2"], pmm["bin_edges_2"])
    return jnp.where(mask, jnp.nan, out)


def shift_scale(R, f, rain_fraction_trg, second_moment_trg, **kwargs):
    """Two-moment matching: find (shift, scale) so that the transformed
    field matches a target rain fraction and second moment
    (reference: probmatching.py:193, which solves with scipy root finding).

    Here: the shift is fixed directly by the target rain-fraction quantile
    (exact), and the scale is found by bisection on the second moment —
    both device-friendly.
    """
    R = jnp.asarray(R)
    rr = jnp.sort(R.ravel())
    # shift so that the target fraction of pixels exceeds zero
    shift = jnp.quantile(rr, 1.0 - rain_fraction_trg)

    def second_moment(scale):
        x = (R - shift) * scale
        vals = jnp.where(x > 0, 10.0 ** (x / 10.0) if f == "dB" else x, 0.0)
        return jnp.mean(vals**2)

    lo, hi = 1e-3, 1e3
    for _ in range(60):
        mid = jnp.sqrt(lo * hi)
        lo, hi = jax.lax.cond(
            second_moment(mid) < second_moment_trg,
            lambda: (mid, hi),
            lambda: (lo, mid),
        )
    scale = jnp.sqrt(lo * hi)
    return float(shift), float(scale), (R - shift) * scale


def resample_distributions(first_array, second_array, probability_first_array, randgen=None, key=None):
    """Binomially mix the sorted samples of two distributions — used by
    STEPS blending to resample radar vs NWP intensity distributions
    (reference: probmatching.py:277)."""
    if first_array.shape != second_array.shape:
        raise ValueError("first_array and second_array must have the same shape")
    a = jnp.asarray(first_array).ravel()
    b = jnp.asarray(second_array).ravel()
    # NaN handling: fill from the other array, then min
    a = jnp.where(jnp.isnan(a), jnp.nanmin(jnp.stack([a, b])), a)
    b = jnp.where(jnp.isnan(b), jnp.nanmin(jnp.stack([a, b])), b)
    asort = jnp.sort(a)[::-1]
    bsort = jnp.sort(b)[::-1]
    if key is None:
        key = jax.random.PRNGKey(0)
    pick = jax.random.bernoulli(key, probability_first_array, asort.shape)
    return jnp.where(pick, asort, bsort)
