"""
STEPS with the radar grid partitioned over the mesh — the full member
update runs with rows sharded over ("y") and members over ("ens").

This is the BASELINE north-star decomposition ("radar-domain tiles
partitioned over the mesh, with halo-exchange for advection at tile
borders"); the reference has no analog (its loop is a single-node dask
thread pool, pysteps/nowcasts/utils.py:464-512).  Design:

- **Spectral AR state, column-sharded.**  The cascade/noise state lives in
  rfft2 half-planes with the spectral COLUMNS sharded over "y" (the
  layout :mod:`pysteps_tpu.parallel.dist_fft` produces).  The AR update,
  bandpass weighting and noise filtering are pointwise there; per-level
  statistics are Parseval partial sums + one ``psum``.
- **Direct sharded white draw.** ``_spectral_white`` is drawn per member
  key on every shard (cheap, deterministic) and column-sliced, so noise
  needs NO forward FFT and NO communication — identical in value to the
  unsharded draw.
- **One distributed inverse FFT per member-step** (pencil transpose via
  ``all_to_all``, dist_fft.irfft2_local) brings the recomposed field back
  to row-sharded spatial space for masking/matching/advection.
- **Halo-exchange advection**: displacement integration samples a
  halo-extended velocity block; the warp exchanges ``halo`` boundary rows
  by ``ppermute`` and resamples locally (parallel/halo.py pattern).
- **Sort-free CDF matching by psum histogram**: exact global ranks of the
  forecast at K value edges (one psum), then the same piecewise-linear
  quantile LUT as ops/pallas_histmatch.match_cdf_pwl — no global sort,
  no gather.

The same program on a 1-device mesh reproduces the multi-device result
(collectives become no-ops), which is what the equality test pins.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from pysteps_tpu import cascade
from pysteps_tpu.noise.fftgenerators import _spectral_white
from pysteps_tpu.nowcasts import utils as nowcast_utils
from pysteps_tpu.nowcasts.steps import _estimate_params, _lagrangian_alignment
from pysteps_tpu.ops.warp import bilinear_warp, warp_shifted
from pysteps_tpu.parallel.dist_fft import _ceil_to, irfft2_local
from pysteps_tpu.postprocessing.probmatching import _prepare_cdf_target

_K = 128  # PWL edges
_B_T = 16384  # target CDF bins


def _exchange_rows(f, halo, axis_name):
    """Halo exchange along axis 0 (rows); edge shards replicate their own
    boundary rows (parallel/halo.py:_exchange_halos).

    When the halo exceeds the local block (tiny shards), the single
    ppermute round cannot reach beyond nearest neighbours — fall back to
    an all_gather + local slice."""
    idx = jax.lax.axis_index(axis_name)
    size = jax.lax.axis_size(axis_name)
    m_loc = f.shape[0]
    if halo >= m_loc:
        full = jax.lax.all_gather(f, axis_name, axis=0, tiled=True)
        padded = jnp.concatenate(
            [jnp.repeat(full[:1], halo, axis=0), full,
             jnp.repeat(full[-1:], halo, axis=0)], axis=0
        )
        return jax.lax.dynamic_slice(
            padded, (idx * m_loc,) + (0,) * (f.ndim - 1),
            (m_loc + 2 * halo,) + f.shape[1:],
        )
    from_prev = jax.lax.ppermute(
        f[-halo:], axis_name, [(i, (i + 1) % size) for i in range(size)]
    )
    from_next = jax.lax.ppermute(
        f[:halo], axis_name, [(i, (i - 1) % size) for i in range(size)]
    )
    top_edge = jnp.repeat(f[:1], halo, axis=0)
    bottom_edge = jnp.repeat(f[-1:], halo, axis=0)
    top = jnp.where(idx == 0, top_edge, from_prev)
    bottom = jnp.where(idx == size - 1, bottom_edge, from_next)
    return jnp.concatenate([top, f, bottom], axis=0)


def _prepare_pwl_target(precip_last):
    """Replicated PWL matching target: sorted values + binned cumulative
    counts (the ops/pallas_histmatch.prepare_target layout, rebuilt here
    in plain jnp so the sharded matcher shares its math)."""
    ranked, zvalue = _prepare_cdf_target(jnp.asarray(precip_last))
    tlo, thi = ranked[0], ranked[-1]
    tscale = (_B_T - 1.0) / jnp.maximum(thi - tlo, 1e-12)
    tbins = jnp.clip(
        jnp.round((ranked - tlo) * tscale).astype(jnp.int32), 0, _B_T - 1
    )
    iota = jnp.arange(_B_T, dtype=jnp.int32)
    keys = jnp.concatenate([tbins * 2, iota * 2 + 1])
    payload = jnp.concatenate([jnp.full(ranked.shape, _B_T, jnp.int32), iota])
    _, p1 = jax.lax.sort_key_val(keys, payload)
    is_x = (p1 == _B_T).astype(jnp.int32)
    xb = jnp.cumsum(is_x) - is_x
    _, c_t = jax.lax.sort_key_val(p1, xb)
    c_t = c_t[:_B_T]
    n_wet_trg = jnp.sum(ranked > zvalue)
    return ranked, zvalue, c_t, tlo, tscale, n_wet_trg


def _match_cdf_psum(field_rows, tstate, size, axis_name):
    """Distributed CDF match of the row-sharded forecast against the
    replicated target: exact edge ranks by psum of local counts, then the
    PWL quantile map applied locally (the match_cdf_pwl LUT math)."""
    ranked, zvalue_trg, c_t, tlo, tscale, n_wet_trg = tstate
    x = field_rows.ravel()
    lo = jax.lax.pmin(jnp.min(x), axis_name)
    hi = jax.lax.pmax(jnp.max(x), axis_name)
    span = jnp.maximum(hi - lo, 1e-12)
    edges = lo + span * (jnp.arange(_K, dtype=jnp.float32) / (_K - 1.0))

    # exact global forecast ranks at the edges: r_j = #(x < e_j)
    local_counts = jnp.sum(
        (x[:, None] < edges[None, :]).astype(jnp.float32), axis=0
    )
    r = jax.lax.psum(local_counts, axis_name).astype(jnp.int32)
    # target quantile at each edge rank
    v = jnp.sum((c_t[None, :] <= r[:, None]).astype(jnp.int32), axis=1)
    q = tlo + (v.astype(jnp.float32) + 0.5) / tscale
    q = jnp.minimum(q, ranked[-1])

    # wet-area-ratio adjustment (reference: probmatching.py:106-112)
    zvalue = lo
    n_wet_init = jax.lax.psum(jnp.sum(x > zvalue), axis_name)
    war = n_wet_init / size
    p_idx = jnp.clip(
        jnp.round((1.0 - war) * (size - 1.0)).astype(jnp.int32),
        0, int(size) - 1,
    )
    p = ranked[p_idx]
    q = jnp.where((n_wet_trg > n_wet_init) & (q < p), zvalue_trg, q)
    q = jax.lax.associative_scan(jnp.maximum, q)

    # piecewise-linear apply on the local rows
    de = edges[1:] - edges[:-1]
    tiny = span * 1e-7
    slope = jnp.concatenate(
        [jnp.where(de > tiny, (q[1:] - q[:-1]) / jnp.maximum(de, tiny), 0.0),
         jnp.zeros((1,))]
    )
    c0 = jnp.concatenate([q[:-1] - slope[:-1] * edges[:-1], q[-1:]])
    d0 = jnp.diff(c0, prepend=q[:1])
    d1 = jnp.diff(slope, prepend=jnp.zeros((1,)))
    cum = (x[:, None] >= edges[None, :]).astype(jnp.float32)
    out = q[0] + cum @ d0 + x * (cum @ d1)
    out = jnp.where(x == zvalue, zvalue_trg, out)
    return out.reshape(field_rows.shape)


def _match_cdf_psum_binned(field_rows, zvalue_trg, c_t, tlo, tscale,
                           n_wet_trg, trg_max, size, axis_name):
    """_match_cdf_psum with a purely binned target state: no sorted target
    array is needed — the max cap and the WAR quantile are inverted from
    the binned CDF ``c_t`` (counts with bin <= b on the (tlo, tscale)
    grid).  Used by the resampled-distribution branch of sharded blending,
    where the target changes every member-step and a full in-scan sort
    would otherwise be required (ADVICE r2)."""
    x = field_rows.ravel()
    lo = jax.lax.pmin(jnp.min(x), axis_name)
    hi = jax.lax.pmax(jnp.max(x), axis_name)
    span = jnp.maximum(hi - lo, 1e-12)
    edges = lo + span * (jnp.arange(_K, dtype=jnp.float32) / (_K - 1.0))

    local_counts = jnp.sum(
        (x[:, None] < edges[None, :]).astype(jnp.float32), axis=0
    )
    r = jax.lax.psum(local_counts, axis_name).astype(jnp.int32)
    v = jnp.sum((c_t[None, :] <= r[:, None]).astype(jnp.int32), axis=1)
    q = tlo + (v.astype(jnp.float32) + 0.5) / tscale
    q = jnp.minimum(q, trg_max)

    zvalue = lo
    n_wet_init = jax.lax.psum(jnp.sum(x > zvalue), axis_name)
    war = n_wet_init / size
    p_idx = jnp.clip(
        jnp.round((1.0 - war) * (size - 1.0)).astype(jnp.int32),
        0, int(size) - 1,
    )
    vp = jnp.sum((c_t <= p_idx).astype(jnp.int32))
    p = jnp.minimum(tlo + (vp.astype(jnp.float32) + 0.5) / tscale, trg_max)
    q = jnp.where((n_wet_trg > n_wet_init) & (q < p), zvalue_trg, q)
    q = jax.lax.associative_scan(jnp.maximum, q)

    de = edges[1:] - edges[:-1]
    tiny = span * 1e-7
    slope = jnp.concatenate(
        [jnp.where(de > tiny, (q[1:] - q[:-1]) / jnp.maximum(de, tiny), 0.0),
         jnp.zeros((1,))]
    )
    c0 = jnp.concatenate([q[:-1] - slope[:-1] * edges[:-1], q[-1:]])
    d0 = jnp.diff(c0, prepend=q[:1])
    d1 = jnp.diff(slope, prepend=jnp.zeros((1,)))
    cum = (x[:, None] >= edges[None, :]).astype(jnp.float32)
    out = q[0] + cum @ d0 + x * (cum @ d1)
    out = jnp.where(x == zvalue, zvalue_trg, out)
    return out.reshape(field_rows.shape)


def _dilated_mask_from_ext(ext, halo, thr, kr, r, axis_name):
    """Incremental-mask update from an already halo-extended block
    (halo >= kr + r): run the serial rim build, slice, renormalize
    globally.  Sharing the warp's wider exchange saves one collective
    round per member-step (the mask's own exchange was ~9% of the
    per-step ICI volume plus a full ppermute latency)."""
    mask_d = nowcast_utils.binary_dilation(ext >= thr, kr)
    mask = mask_d.astype(jnp.float32)
    for _ in range(int(r)):
        mask_d = nowcast_utils._cross_dilate(mask_d.astype(jnp.float32)) > 0
        mask = mask + mask_d
    mask = mask[halo:-halo]
    gmax = jax.lax.pmax(jnp.max(mask), axis_name)
    return mask / jnp.maximum(gmax, 1.0)


def _dilated_mask_halo(field_rows, thr, kr, r, axis_name):
    """Incremental-mask update on row shards with its own halo exchange
    (standalone path; the scan shares the warp's exchange instead)."""
    halo = int(kr + r)
    ext = _exchange_rows(field_rows, halo, axis_name)
    return _dilated_mask_from_ext(ext, halo, thr, kr, r, axis_name)


def _sample_velocity_ext(vel_ext, disp, halo):
    """Bilinear velocity sample on a halo-extended (2, m_loc+2h, n) block;
    |displacement| <= halo keeps the sample in the block."""
    m_loc, n = disp.shape[1:]
    yy, xx = jnp.meshgrid(
        jnp.arange(m_loc, dtype=disp.dtype),
        jnp.arange(n, dtype=disp.dtype),
        indexing="ij",
    )
    cy = yy + disp[1] + halo
    cx = xx + disp[0]
    vx = bilinear_warp(vel_ext[0], cy, cx, mode="nearest")
    vy = bilinear_warp(vel_ext[1], cy, cx, mode="nearest")
    return jnp.stack([vx, vy])


def _warp_halo(field_rows, disp, halo, precip_min, axis_name):
    """Halo-exchange backward warp of row-sharded rows
    (parallel/halo.py:sharded_warp, inlined for the scan)."""
    ext = _exchange_rows(field_rows, halo, axis_name)
    return _warp_from_ext(ext, field_rows.shape, disp, halo, precip_min,
                          axis_name)


def _warp_from_ext(ext, local_shape, disp, halo, precip_min, axis_name):
    """Backward warp from an already halo-extended block."""
    field_rows_shape = local_shape
    d_ext = jnp.concatenate(
        [
            jnp.repeat(disp[:, :1], halo, axis=1),
            disp,
            jnp.repeat(disp[:, -1:], halo, axis=1),
        ],
        axis=1,
    )
    out = warp_shifted(ext, d_ext, halo, mode="nearest")[halo:-halo]
    m_loc, n = field_rows_shape
    idx = jax.lax.axis_index(axis_name)
    size = jax.lax.axis_size(axis_name)
    m_glob = size * m_loc
    gy = idx * m_loc + jax.lax.broadcasted_iota(jnp.int32, (m_loc, n), 0)
    gx = jax.lax.broadcasted_iota(jnp.int32, (m_loc, n), 1)
    cy = gy.astype(disp.dtype) + disp[1]
    cx = gx.astype(disp.dtype) + disp[0]
    inside = (cy >= 0) & (cy <= m_glob - 1) & (cx >= 0) & (cx <= n - 1)
    return jnp.where(inside, out, precip_min)


def forecast(
    precip,
    velocity,
    timesteps,
    mesh,
    n_ens_members=8,
    n_cascade_levels=6,
    precip_thr=None,
    kmperpixel=None,
    timestep=None,
    mask_kwargs=None,
    seed=None,
    vel_pert_method=None,
    vel_pert_kwargs=None,
):
    """Spatially-sharded STEPS ensemble forecast.

    Members shard over the mesh "ens" axis and grid rows over "y"; the
    scan runs entirely inside one ``shard_map``.  Fixed configuration
    (the STEPS defaults): nonparametric noise, AR(2), incremental mask,
    CDF matching; optional BPS velocity perturbations
    (``vel_pert_method="bps"``).  Returns (E, T, m, n).
    """
    precip = np.asarray(precip, np.float32)[-3:]
    m, n = precip.shape[1:]
    ens_shards = mesh.shape["ens"]
    y_shards = mesh.shape["y"]
    if m % y_shards:
        raise ValueError(f"rows {m} not divisible by y shards {y_shards}")
    if n_ens_members % ens_shards:
        raise ValueError(
            f"members {n_ens_members} not divisible by ens shards {ens_shards}"
        )
    if precip_thr is None:
        raise ValueError("precip_thr required")
    int_steps = int(timesteps)
    mask_kwargs = dict(mask_kwargs or {})

    precip_min = float(np.nanmin(precip))
    precip = np.where(np.isfinite(precip), precip, precip_min)
    velocity_j = jnp.asarray(velocity, jnp.float32)
    precip_j = jnp.asarray(precip)

    # ---- replicated init (small): alignment, AR fit, noise filter ----
    precip_aligned = _lagrangian_alignment(precip_j, velocity_j)
    bp_filter = cascade.get_method("gaussian")((m, n), n_cascade_levels)
    weights_2d = bp_filter["weights_2d"].astype(jnp.float32)
    mask_thr = jnp.ones((m, n), dtype=bool)
    cascades_full, means, stds, gamma, phi = _estimate_params(
        precip_aligned, weights_2d, mask_thr, 2, False
    )
    from pysteps_tpu.noise.fftgenerators import nonparam_filter_core
    from pysteps_tpu.utils import tapering

    taper = jnp.asarray(
        tapering.compute_window_function(m, n, "tukey"), jnp.float32
    )
    noise_filt = nonparam_filter_core(precip_aligned, taper).astype(jnp.float32)

    window = cascades_full[:, -2:]  # (k, 2, m, n) normalized
    window_fft = jnp.fft.rfft2(window)  # (k, 2, m, c)

    # mask / matching init
    mask_rim = int(mask_kwargs.get("mask_rim", 10))
    struct_radius = 1
    if timestep is not None and kmperpixel:
        struct_radius = max(
            int((mask_kwargs.get("mask_f", 1.0) * timestep / kmperpixel - 1) / 2.0),
            1,
        )
    mask0 = nowcast_utils.compute_dilated_mask(
        jnp.asarray(precip[-1] >= precip_thr), struct_radius, mask_rim
    ).astype(jnp.float32)
    tstate = _prepare_pwl_target(precip[-1])

    member_keys = jax.vmap(
        lambda i: jax.random.fold_in(
            jax.random.PRNGKey(seed if seed is not None else 42), i
        )
    )(jnp.arange(n_ens_members))

    # ---- column padding for even sharding of the spectral axis ----
    c = n // 2 + 1
    c_pad = _ceil_to(c, y_shards)

    def padc(a):
        cfg = [(0, 0)] * (a.ndim - 1) + [(0, c_pad - c)]
        return jnp.pad(a, cfg)

    w2d_p = padc(weights_2d)               # (k, m, c_pad)
    filt_p = padc(noise_filt)              # (m, c_pad)
    winf_p = padc(window_fft)              # (k, 2, m, c_pad)
    herm = jnp.where(
        (jnp.arange(c_pad) == 0)
        | ((n % 2 == 0) & (jnp.arange(c_pad) == c - 1)),
        1.0, 2.0,
    ) * (jnp.arange(c_pad) < c)

    # BPS velocity perturbations (reference: noise/motion.py; the same
    # static-flow formulation as nowcasts/steps.py — per-member Laplace
    # draws scale time-growing parallel/perpendicular unit fields)
    vel_pert = vel_pert_method is not None
    timestep_min = float(timestep) if timestep else 1.0
    if vel_pert:
        from pysteps_tpu.noise.motion import (
            _laplace,
            get_default_params_bps_par,
            get_default_params_bps_perp,
        )

        vpk = dict(vel_pert_kwargs or {})
        p_par = tuple(
            float(v) for v in vpk.get("p_par", get_default_params_bps_par())
        )
        p_perp = tuple(
            float(v) for v in vpk.get("p_perp", get_default_params_bps_perp())
        )
        vsf = (
            60.0 / (timestep * (1.0 / kmperpixel))
            if (timestep and kmperpixel)
            else 1.0
        )
        vkeys = jax.random.split(
            jax.random.PRNGKey((seed if seed is not None else 42) + 7),
            2 * n_ens_members,
        )
        eps_par = jax.vmap(_laplace)(vkeys[:n_ens_members]).astype(jnp.float32)
        eps_perp = jax.vmap(_laplace)(vkeys[n_ens_members:]).astype(jnp.float32)
        nv = jnp.linalg.norm(velocity_j, axis=0)
        V_n = jnp.where(
            nv[None] > 1e-12, velocity_j / jnp.maximum(nv[None], 1e-12), 0.0
        ).astype(jnp.float32)
        V_perp = jnp.stack([-V_n[1], V_n[0]])
        t_last = int_steps * timestep_min
        g_par_l = abs(p_par[0] * t_last ** p_par[1] + p_par[2])
        g_perp_l = abs(p_perp[0] * t_last ** p_perp[1] + p_perp[2])
        pert_margin = 4.0 * max(g_par_l, g_perp_l) / max(vsf, 1e-6)
    else:
        p_par = p_perp = (0.0, 0.0, 0.0)
        vsf = 1.0
        eps_par = jnp.zeros(n_ens_members, jnp.float32)
        eps_perp = jnp.zeros(n_ens_members, jnp.float32)
        V_n = jnp.zeros_like(velocity_j)
        V_perp = jnp.zeros_like(velocity_j)
        pert_margin = 0.0

    vmax = float(np.max(np.abs(velocity))) if np.asarray(velocity).size else 0.0
    halo = max(
        int(np.ceil(int_steps * (vmax + pert_margin + 0.5))) + 2,
        struct_radius + mask_rim,
        2,
    )
    # keep the TRUE halo even when it exceeds the per-shard row count
    # (_exchange_rows falls back to all_gather for halo >= m_loc); with
    # BPS velocity perturbations the 4-sigma margin routinely exceeds
    # m_loc on fine meshes, and clamping would silently diverge from the
    # unsharded path.  Beyond the full grid height edge-clamping makes
    # any further reach a no-op, so cap there.
    halo = min(halo, m)
    size_f = float(m * n)

    means_l, stds_l = means[-1], stds[-1]
    halo_ = halo
    e_loc = n_ens_members // ens_shards

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(None, None, None, "y"),   # window_fft columns
            P("y", None),               # mask0 rows
            P("ens",),                  # member keys
            P(None, "y", None),         # velocity rows
            P(None, None, "y"),         # weights_2d columns
            P(None, "y"),               # noise filt columns
            P("y",),                    # herm weights columns
            P(None), P(), P(None), P(), P(), P(),  # tstate
            P(None, None),              # phi
            P(None), P(None),           # means_l, stds_l
            P(None, "y", None),         # V_n rows
            P(None, "y", None),         # V_perp rows
            P("ens",), P("ens",),       # eps_par / eps_perp
        ),
        out_specs=P(None, "ens", "y", None),
        check_vma=False,
    )
    def run(
        winf_l, mask0_l, keys_l, vel_l, w2d_l, filt_l, herm_l,
        ranked, zvalue_trg, c_t, tlo, tscale, n_wet_trg,
        phi_, mlast, slast, vn_l, vperp_l, epar_l, eperp_l,
    ):
        tstate_l = (ranked, zvalue_trg, c_t, tlo, tscale, n_wet_trg)
        c_loc = winf_l.shape[-1]
        col0 = jax.lax.axis_index("y") * c_loc
        m_loc = mask0_l.shape[0]

        vel_ext = jnp.stack(
            [_exchange_rows(vel_l[0], halo_, "y"),
             _exchange_rows(vel_l[1], halo_, "y")]
        )
        if vel_pert:
            vn_ext = jnp.stack(
                [_exchange_rows(vn_l[0], halo_, "y"),
                 _exchange_rows(vn_l[1], halo_, "y")]
            )
            vperp_ext = jnp.stack(
                [_exchange_rows(vperp_l[0], halo_, "y"),
                 _exchange_rows(vperp_l[1], halo_, "y")]
            )

        lags0 = tuple(
            jnp.broadcast_to(winf_l[:, i], (e_loc,) + winf_l[:, i].shape)
            for i in range(2)
        )
        mask_prec0 = jnp.broadcast_to(mask0_l, (e_loc, m_loc, n))
        disp0 = jnp.zeros((e_loc, 2, m_loc, n), jnp.float32)

        def step(carry, t):
            lags, mask_prec, keys, disp = carry
            t_total = (t + 1.0) * timestep_min

            def member(key, lag_j, mask_j, disp_j, epar_j, eperp_j):
                key, k_noise = jax.random.split(key)
                # deterministic sharded white draw: full half-plane from
                # the key, local column slice
                white = _spectral_white(k_noise, (m, n))
                white = jnp.pad(white, ((0, 0), (0, c_pad - c)))
                white_l = jax.lax.dynamic_slice(
                    white, (0, col0), (m, c_loc)
                )
                lv = white_l[None] * filt_l[None] * w2d_l  # (k, m, c_loc)
                # per-level spectral moments via psum Parseval
                pw = jnp.real(lv) ** 2 + jnp.imag(lv) ** 2
                s2 = jax.lax.psum(
                    jnp.sum(pw * herm_l[None, None, :], axis=(1, 2)), "y"
                )
                dc = jnp.where(
                    col0 == 0, jnp.real(lv[:, 0, 0]), jnp.zeros(lv.shape[0])
                )
                mu = jax.lax.psum(dc, "y") / size_f
                sd = jnp.sqrt(
                    jnp.maximum(s2 / size_f**2 - mu**2, 1e-24)
                )
                # normalize: subtract DC, unit spectral std
                dc_fix = jnp.zeros_like(lv)
                dc_fix = jnp.where(
                    (col0 == 0)
                    & (jax.lax.broadcasted_iota(jnp.int32, lv.shape, 1) == 0)
                    & (jax.lax.broadcasted_iota(jnp.int32, lv.shape, 2) == 0),
                    (mu * size_f)[:, None, None].astype(lv.dtype),
                    dc_fix,
                )
                eps = (lv - dc_fix) / sd[:, None, None]
                # AR(2) step (nowcasts/steps.py:_ar_step_lags)
                x_new = (
                    lag_j[1] * phi_[:, 0, None, None]
                    + lag_j[0] * phi_[:, 1, None, None]
                    + phi_[:, 2, None, None] * eps
                )
                lag_j = (lag_j[1], x_new)
                # spectral recompose + distributed inverse FFT
                out_fft = jnp.sum(x_new * slast[:, None, None], axis=0)
                out_fft = jnp.where(
                    (col0 == 0)
                    & (jax.lax.broadcasted_iota(jnp.int32, out_fft.shape, 0) == 0)
                    & (jax.lax.broadcasted_iota(jnp.int32, out_fft.shape, 1) == 0),
                    out_fft + jnp.sum(mlast) * size_f,
                    out_fft,
                )
                field = irfft2_local(out_fft, (m, n), "y")  # (m_loc, n)

                fmin = jax.lax.pmin(jnp.min(field), "y")
                field = fmin + (field - fmin) * mask_j
                field = _match_cdf_psum(field, tstate_l, size_f, "y")
                # ONE halo exchange of the matched field serves both the
                # rim-mask update and the output warp (halo_ >= kr + r)
                if struct_radius + mask_rim <= halo_:
                    ext_j = _exchange_rows(field, halo_, "y")
                    mask_j = _dilated_mask_from_ext(
                        ext_j, halo_, precip_thr, struct_radius, mask_rim,
                        "y",
                    )
                else:
                    ext_j = None
                    mask_j = _dilated_mask_halo(
                        field, precip_thr, struct_radius, mask_rim, "y"
                    )
                # advect: integrate displacement on the halo-extended
                # velocity (optionally BPS-perturbed per member), warp
                # with halo exchange
                if vel_pert:
                    a1, b1, c1 = p_par
                    a2, b2, c2 = p_perp
                    g_par = a1 * t_total**b1 + c1
                    g_perp = a2 * t_total**b2 + c2
                    vel_ext_j = vel_ext + (
                        epar_j * g_par * vn_ext + eperp_j * g_perp * vperp_ext
                    ) / vsf
                else:
                    vel_ext_j = vel_ext
                vel_inc = _sample_velocity_ext(vel_ext_j, disp_j, halo_)
                vel_inc = _sample_velocity_ext(
                    vel_ext_j, disp_j - vel_inc / 2.0, halo_
                )
                disp_j = disp_j - vel_inc
                if ext_j is not None:
                    out = _warp_from_ext(
                        ext_j, field.shape, disp_j, halo_, precip_min, "y"
                    )
                else:
                    out = _warp_halo(field, disp_j, halo_, precip_min, "y")
                return key, lag_j, mask_j, disp_j, out

            keys, lags, mask_prec, disp, outs = jax.vmap(member)(
                keys, lags, mask_prec, disp, epar_l, eperp_l
            )
            return (lags, mask_prec, keys, disp), outs

        carry0 = (lags0, mask_prec0, keys_l, disp0)
        _, outputs = jax.lax.scan(
            step, carry0, jnp.arange(int_steps, dtype=jnp.float32)
        )
        return outputs  # (T, e_loc, m_loc, n)

    out = run(
        winf_p, mask0, member_keys, velocity_j, w2d_p, filt_p, herm,
        *tstate, phi.astype(jnp.float32), means_l.astype(jnp.float32),
        stds_l.astype(jnp.float32), V_n, V_perp, eps_par, eps_perp,
    )
    return jnp.swapaxes(out, 0, 1)  # (E, T, m, n)
