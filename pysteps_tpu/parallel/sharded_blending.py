"""
STEPS x NWP blending with the radar grid partitioned over the mesh.

The full blended member update runs with grid rows sharded over "y" and
members over "ens" — the BASELINE config-5 decomposition ("96-member
STEPS + seamless NWP blending sharded over a multi-host mesh").  The
reference's loop is a single-node dask thread pool
(pysteps/blending/steps.py:364-449); this module has no reference analog.

Design (the :mod:`pysteps_tpu.parallel.sharded_steps` machinery, applied
to the blending member update of blending/steps.py::_blending_scan):

- **Spatial cascades, row-sharded.**  Unlike sharded STEPS (whose AR
  state lives in the spectral domain), blending keeps both Lagrangian
  cascades (extrapolation + noise) in the SPATIAL domain: every level is
  advected each step and blended pointwise with the row-sharded NWP
  cascades, so spatial row shards are the natural layout.
- **Sharded noise path**: the white spectrum is drawn per member key on
  every shard (deterministic, value-identical to the unsharded draw) and
  column-sliced; the nonparametric filter and bandpass weights apply
  pointwise in the spectral domain; per-level normalization uses psum
  Parseval moments (exactly decompose_core's spatial moments, by
  linearity); k distributed inverse FFTs (all_to_all pencil transpose)
  return the innovation levels to row-sharded space.
- **Halo-exchange advection** of all 2k cascade levels sharing one
  displacement; the velocity field (time-varying, per NWP model) is
  halo-extended by ppermute inside the scan.  On CPU the halo warp uses
  the exact bilinear gather (matching the unsharded CPU path bit-close);
  on TPU the shift-decomposition warp (XLA dynamic gather is scalar).
- **psum CDF matching** against the replicated radar target (the
  sort-free PWL matcher of sharded_steps._match_cdf_psum).

Supported configuration subset: internal nowcast (no external ensemble),
``probmatching_method`` in {"cdf", "mean", None} including resampled
target distributions (the radar/NWP intensity sorts are precomputed
replicated; the binomial mix + PWL target state build in-scan),
``mask_method`` in {"incremental", "obs", None}, optional BPS velocity
perturbations, any number of NWP models.  The same program on a 1-device
mesh reproduces the multi-device result (collectives become no-ops),
which the equality test pins (tests/test_parallel.py).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from pysteps_tpu.noise.fftgenerators import _spectral_white
from pysteps_tpu.ops.warp import bilinear_warp, warp_shifted_multi
from pysteps_tpu.parallel.dist_fft import _ceil_to, irfft2_local
from pysteps_tpu.parallel.sharded_steps import (
    _B_T,
    _dilated_mask_halo,
    _exchange_rows,
    _match_cdf_psum,
    _match_cdf_psum_binned,
    _prepare_pwl_target,
    _sample_velocity_ext,
)
from pysteps_tpu.timeseries import autoregression


def _blend_means_sigmas(means, sigmas, weights):
    from pysteps_tpu.blending.steps import blend_means_sigmas

    return blend_means_sigmas(means, sigmas, weights)


def _warp_halo_multi(fields, disp, halo, cval, axis_name, exact):
    """Backward-warp C row-sharded fields (C, m_loc, n) sharing one
    displacement, with GLOBAL "constant" semantics: the halo exchange
    replicates boundary rows (= the unsharded gather's edge clamp) and a
    hard inside test at the global bounds fills ``cval`` — exactly
    ops/warp.py::warp(order=1, mode="constant") for |dy| <= halo - 1."""
    C, m_loc, n = fields.shape
    idx = jax.lax.axis_index(axis_name)
    size = jax.lax.axis_size(axis_name)
    ext = jax.vmap(lambda f: _exchange_rows(f, halo, axis_name))(fields)

    m_glob = size * m_loc
    gy = idx * m_loc + jax.lax.broadcasted_iota(jnp.int32, (m_loc, n), 0)
    gx = jax.lax.broadcasted_iota(jnp.int32, (m_loc, n), 1)
    cy = gy.astype(disp.dtype) + disp[1]
    cx = gx.astype(disp.dtype) + disp[0]
    inside = (cy >= 0) & (cy <= m_glob - 1) & (cx >= 0) & (cx <= n - 1)

    if exact:
        # exact bilinear gather on the extended block (CPU path)
        cy_ext = cy - (idx * m_loc).astype(disp.dtype) + halo
        out = jax.vmap(
            lambda f: bilinear_warp(f, cy_ext, cx, mode="nearest")
        )(ext)
    else:
        # shift-decomposition warp (TPU path — XLA dynamic gather is
        # scalar on TPU; matches warp_shifted's clamped resample)
        d_ext = jnp.concatenate(
            [
                jnp.repeat(disp[:, :1], halo, axis=1),
                disp,
                jnp.repeat(disp[:, -1:], halo, axis=1),
            ],
            axis=1,
        )
        out = warp_shifted_multi(ext, d_ext, halo, mode="nearest")[
            :, halo:-halo
        ]
    return jnp.where(inside[None], out, cval)


def blending_scan_sharded(
    window, noise_window, mask_prec_init, member_keys, velocity_blend,
    nwp_cascades, nwp_means, nwp_sigmas, nwp_fields, member_model,
    weights_t, weights_mv_t, phi, noise_filt, weights_2d, noise_std_coeffs,
    radar_means, radar_sigmas, precip_last, precip_min, precip_thr,
    domain_mask, smooth_mask, int_steps, mesh, mask_method, probmatching,
    resample_distribution, mask_rim, struct_radius, E, noise_filt_shape,
    external=False, ext_cascades=None, ext_means=None, ext_sigmas=None,
    max_disp=None, vel_pert=False, p_par=None, p_perp=None,
    eps_par=None, eps_perp=None, vsf=1.0, timestep_min=1.0,
    use_noise=True, t_offset=0, carry_init=None, vmax_bound=None,
):
    """Spatially-sharded blended forecast loop: the _blending_scan
    contract (same positional layout) on an ("ens", "y") mesh.

    Returns (None, outputs) with time-major outputs (T, E, m, n) like
    ``_blending_scan``; the carry is not exposed (no chunked mode).
    """
    if external:
        raise ValueError("sharded blending: external nowcast not supported")
    if carry_init is not None or t_offset:
        raise ValueError("sharded blending: chunked scan not supported")

    k_levels, p, m, n = window.shape
    ens_shards = mesh.shape["ens"]
    y_shards = mesh.shape["y"]
    if m % y_shards:
        raise ValueError(f"rows {m} not divisible by y shards {y_shards}")
    if E % ens_shards:
        raise ValueError(f"members {E} not divisible by ens shards {ens_shards}")
    n_models = nwp_cascades.shape[1]
    int_steps = int(int_steps)
    e_loc = E // ens_shards
    m_loc = m // y_shards
    size_f = float(m * n)
    c = n // 2 + 1
    c_pad = _ceil_to(c, y_shards)
    precip_min = float(precip_min)
    precip_thr = float(precip_thr)
    vsf = float(vsf)
    timestep_min = float(timestep_min)
    exact_gather = jax.default_backend() == "cpu"

    # max |displacement| bound -> halo size; also covers the dilation reach
    if vmax_bound is None:
        vmax_bound = float(jnp.max(jnp.abs(velocity_blend)))
    halo = max(
        int(np.ceil(int_steps * (vmax_bound + 0.5))) + 2,
        struct_radius + mask_rim,
        2,
    )
    # keep the TRUE halo even when it exceeds m_loc (_exchange_rows
    # all_gathers for halo >= m_loc); clamping to m_loc would silently
    # cut large displacements off.  Cap at the grid height, where
    # edge-clamp semantics make further reach a no-op.
    halo = min(halo, m)

    def padc(a):
        cfg = [(0, 0)] * (a.ndim - 1) + [(0, c_pad - c)]
        return jnp.pad(a, cfg)

    w2d_p = padc(jnp.asarray(weights_2d))
    filt = jnp.asarray(noise_filt)
    if filt.shape[-1] == n:  # full-fft Hermitian amplitude filter
        filt = filt[..., :c]
    filt_p = padc(filt)
    herm = jnp.where(
        (jnp.arange(c_pad) == 0)
        | ((n % 2 == 0) & (jnp.arange(c_pad) == c - 1)),
        1.0, 2.0,
    ) * (jnp.arange(c_pad) < c)

    tstate = _prepare_pwl_target(np.asarray(precip_last))
    # resampled-distribution matching (reference:
    # probmatching.resample_distributions): the radar and NWP intensity
    # sorts are precomputed replicated (descending); the binomial mix and
    # the PWL target state are built in-scan per member-step
    resample = bool(resample_distribution) and probmatching == "cdf"
    T_n = nwp_fields.shape[0]
    N_mn = m * n
    if resample:
        # Sort-free in-scan matching (ADVICE r2): the mixed target's
        # binned CDF is assembled from a cumsum of the bernoulli picks
        # plus STATIC per-(t, model) index arrays precomputed here on
        # host.  For each bin b of a fixed combined-range grid,
        # idx_r[t,mod,b] = first rank (descending) whose radar value
        # falls at-or-below bin b's edge, so the number of PICKED radar
        # values with bin <= b is a suffix-sum lookup; same for NWP with
        # the complementary picks.  Reference semantics
        # (probmatching.resample_distributions: rank-aligned elementwise
        # mix of the two descending sorts, then re-sort) are reproduced
        # exactly up to the shared 16k-bin quantization.
        pl = np.asarray(precip_last, np.float32).ravel()
        pl = np.where(np.isnan(pl), np.nanmin(pl), pl)
        rsort_np = np.sort(pl)[::-1]
        nf = np.asarray(nwp_fields, np.float32).reshape(T_n, n_models, N_mn)
        nf = np.where(np.isnan(nf), precip_min, nf)
        nsort_np = -np.sort(-nf, axis=-1)
        B = _B_T
        tlo_tm = np.minimum(rsort_np[-1], nsort_np[:, :, -1])
        thi_tm = np.maximum(rsort_np[0], nsort_np[:, :, 0])
        tscale_tm = (B - 1.0) / np.maximum(thi_tm - tlo_tm, 1e-12)
        idx_r = np.empty((T_n, n_models, B), np.int32)
        idx_n = np.empty((T_n, n_models, B), np.int32)
        bgrid = np.arange(B)
        for t_i in range(T_n):
            for mod in range(n_models):
                sc, lo_ = tscale_tm[t_i, mod], tlo_tm[t_i, mod]
                tr = np.clip(np.round((rsort_np - lo_) * sc), 0, B - 1)
                tn = np.clip(
                    np.round((nsort_np[t_i, mod] - lo_) * sc), 0, B - 1
                )
                idx_r[t_i, mod] = N_mn - np.searchsorted(
                    tr[::-1], bgrid, side="right"
                )
                idx_n[t_i, mod] = N_mn - np.searchsorted(
                    tn[::-1], bgrid, side="right"
                )
        rsort_d = jnp.asarray(rsort_np)
        nwp_sorted = jnp.asarray(nsort_np)
        idx_r = jnp.asarray(idx_r)
        idx_n = jnp.asarray(idx_n)
        tlo_tm = jnp.asarray(tlo_tm, jnp.float32)
        tscale_tm = jnp.asarray(tscale_tm, jnp.float32)
    else:
        rsort_d = jnp.zeros((1,), jnp.float32)
        nwp_sorted = jnp.zeros((T_n, n_models, 1), jnp.float32)
        idx_r = jnp.zeros((T_n, n_models, 1), jnp.int32)
        idx_n = jnp.zeros((T_n, n_models, 1), jnp.int32)
        tlo_tm = jnp.zeros((T_n, n_models), jnp.float32)
        tscale_tm = jnp.ones((T_n, n_models), jnp.float32)
    if eps_par is None:
        eps_par = jnp.zeros(E, jnp.float32)
        eps_perp = jnp.zeros(E, jnp.float32)
    if p_par is None:
        p_par = (0.0, 0.0, 0.0)
        p_perp = (0.0, 0.0, 0.0)
    p_par = tuple(float(v) for v in p_par)
    p_perp = tuple(float(v) for v in p_perp)

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(None, None, "y", None),        # window (k, p, m, n)
            P(None, None, "y", None),        # noise_window
            P("y", None),                    # mask_prec_init
            P("ens",),                       # member_keys
            P(None, None, None, "y", None),  # velocity_blend (T, nm, 2, m, n)
            P(None, None, None, "y", None),  # nwp_cascades (T, nm, k, m, n)
            P(None, None, None),             # nwp_means (T, nm, k)
            P(None, None, None),             # nwp_sigmas
            P(None, None, "y", None),        # nwp_fields (T, nm, m, n)
            P("ens",),                       # member_model
            P(None, None, None, None),       # weights_t (T, nm, 3, k)
            P(None, None),                   # phi (k, p+1)
            P(None, "y"),                    # noise filt columns
            P(None, None, "y"),              # weights_2d columns
            P("y",),                         # herm columns
            P(None),                         # noise_std_coeffs (k,)
            P(None), P(None),                # radar means / sigmas (k,)
            P("y", None),                    # precip_last rows (mean matching)
            P("y", None),                    # domain_mask
            P("y", None),                    # smooth_mask
            P(None), P(), P(None), P(), P(), P(),  # tstate
            P("ens",), P("ens",),            # eps_par / eps_perp
            P(None),                         # rsort_d (replicated)
            P(None, None, None),             # nwp_sorted (T, nm, mn)
            P(None, None, None),             # idx_r (T, nm, B)
            P(None, None, None),             # idx_n (T, nm, B)
            P(None, None),                   # tlo_tm (T, nm)
            P(None, None),                   # tscale_tm (T, nm)
        ),
        out_specs=P(None, "ens", "y", None),
        check_vma=False,
    )
    def run(
        window_l, noise0_l, mask0_l, keys_l, vel_l, nwpc_l, nwpm, nwps,
        nwpf_l, model_l, w_t, phi_, filt_l, w2d_l, herm_l, nsc,
        r_means, r_sigmas, plast_l, dmask_l, smask_l,
        ranked, zvalue_trg, c_t, tlo, tscale, n_wet_trg,
        epar_l, eperp_l, rsort_l, nsorted_l,
        idx_r_l, idx_n_l, tlo_tm_l, tscale_tm_l,
    ):
        tstate_l = (ranked, zvalue_trg, c_t, tlo, tscale, n_wet_trg)
        c_loc = filt_l.shape[-1]
        col0 = jax.lax.axis_index("y") * c_loc

        # replicated observation moments for "mean" matching (plast is
        # row-sharded; one psum pair at trace time inside the scan is
        # cheaper than carrying the full replicated field)
        obs_wet = plast_l >= precip_thr
        mu_obs_num = jax.lax.psum(
            jnp.sum(jnp.where(obs_wet, plast_l, 0.0)), "y"
        )
        mu_obs_den = jax.lax.psum(jnp.sum(obs_wet), "y")
        mu_obs = mu_obs_num / jnp.maximum(mu_obs_den, 1)

        cascades0 = jnp.broadcast_to(window_l, (e_loc,) + window_l.shape)
        noise0 = jnp.broadcast_to(noise0_l, (e_loc,) + noise0_l.shape)
        mask0 = jnp.broadcast_to(mask0_l, (e_loc,) + mask0_l.shape)
        disp0 = jnp.zeros((e_loc, 2, m_loc, n), jnp.float32)

        def step(carry, t):
            cascades, noise_casc, mask_prec, keys, disp = carry
            t_total = (t + 1.0) * timestep_min
            # halo-extend this step's blended velocity (per model)
            vel_t = vel_l[t]  # (nm, 2, m_loc, n)
            vel_ext_t = jax.vmap(
                jax.vmap(lambda f: _exchange_rows(f, halo, "y"))
            )(vel_t)  # (nm, 2, m_loc + 2h, n)

            def member(key, casc_j, noise_j, mask_j, disp_j, model_j,
                       epar_j, eperp_j):
                key, k_noise = jax.random.split(key)
                casc_j = autoregression.iterate_ar_model(casc_j, phi_, eps=None)
                if use_noise:
                    # sharded noise: white half-plane from the key (value-
                    # identical to the unsharded draw), local column slice
                    white = _spectral_white(k_noise, (m, n))
                    white = jnp.pad(white, ((0, 0), (0, c_pad - c)))
                    white_l = jax.lax.dynamic_slice(
                        white, (0, col0), (m, c_loc)
                    )
                    lv = white_l[None] * filt_l[None] * w2d_l  # (k, m, c_loc)
                    # decompose_core spatial moments via psum Parseval
                    pw = jnp.real(lv) ** 2 + jnp.imag(lv) ** 2
                    s2 = jax.lax.psum(
                        jnp.sum(pw * herm_l[None, None, :], axis=(1, 2)), "y"
                    )
                    dc = jnp.where(
                        col0 == 0, jnp.real(lv[:, 0, 0]),
                        jnp.zeros(lv.shape[0]),
                    )
                    mu = jax.lax.psum(dc, "y") / size_f
                    sd = jnp.sqrt(jnp.maximum(s2 / size_f**2 - mu**2, 0.0))
                    dc_fix = jnp.zeros_like(lv)
                    dc_fix = jnp.where(
                        (col0 == 0)
                        & (jax.lax.broadcasted_iota(jnp.int32, lv.shape, 1) == 0)
                        & (jax.lax.broadcasted_iota(jnp.int32, lv.shape, 2) == 0),
                        (mu * size_f)[:, None, None].astype(lv.dtype),
                        dc_fix,
                    )
                    scale = nsc / jnp.maximum(sd, 1e-12)
                    lv = (lv - dc_fix) * scale[:, None, None]
                    eps_levels = jax.vmap(
                        lambda f: irfft2_local(f, (m, n), "y")
                    )(lv)  # (k, m_loc, n)
                    noise_j = autoregression.iterate_ar_model(
                        noise_j, phi_, eps=eps_levels
                    )

                # velocity (optionally BPS-perturbed, pointwise on the
                # halo-extended block) -> midpoint displacement update
                vel_ext_j = jnp.take(vel_ext_t, model_j, axis=0)
                if vel_pert:
                    a1, b1, c1 = p_par
                    a2, b2, c2 = p_perp
                    g_par = a1 * t_total**b1 + c1
                    g_perp = a2 * t_total**b2 + c2
                    nv = jnp.linalg.norm(vel_ext_j, axis=0)
                    v_n = jnp.where(
                        nv[None] > 1e-12,
                        vel_ext_j / jnp.maximum(nv[None], 1e-12), 0.0,
                    )
                    v_perp = jnp.stack([-v_n[1], v_n[0]])
                    vel_ext_j = vel_ext_j + (
                        epar_j * g_par * v_n + eperp_j * g_perp * v_perp
                    ) / vsf
                vel_inc = _sample_velocity_ext(vel_ext_j, disp_j, halo)
                vel_inc = _sample_velocity_ext(
                    vel_ext_j, disp_j - vel_inc / 2.0, halo
                )
                disp_j = disp_j - vel_inc

                # blend weights + recomposition coefficients FIRST: the
                # per-level blend weights are scalars, the halo warp is
                # linear, and the warped levels feed only the recomposed
                # output — so 2k per-level halo warps collapse into ONE
                # pre-weighted composite warp (mirror of the unsharded
                # blending/steps.py r4 rewrite; halves the halo-exchange
                # ICI bytes too, since only one field is halo-extended)
                w = jnp.take(w_t[t], model_j, axis=0)  # (3, k)
                nwp_lvls = jnp.take(nwpc_l[t], model_j, axis=0)
                wsum = jnp.maximum(jnp.sum(w, axis=0), 1e-12)
                means = jnp.stack([r_means, jnp.take(nwpm[t], model_j, axis=0)])
                sigmas = jnp.stack([r_sigmas, jnp.take(nwps[t], model_j, axis=0)])
                c_means, c_sigmas = _blend_means_sigmas(
                    means, sigmas, jnp.stack([w[0], w[1], w[2]])
                )
                a_ext = (w[0] * c_sigmas / wsum)[:, None, None]
                a_nwp = (w[1] * c_sigmas / wsum)[:, None, None]
                a_noi = (w[2] * c_sigmas / wsum)[:, None, None]
                comp = jnp.sum(casc_j[:, -1] * a_ext, axis=0)
                if use_noise:
                    comp = comp + jnp.sum(noise_j[:, -1] * a_noi, axis=0)
                comp = _warp_halo_multi(
                    comp[None], disp_j, halo, 0.0, "y", exact_gather
                )[0]
                field = (
                    comp
                    + jnp.sum(nwp_lvls * a_nwp, axis=0)
                    + jnp.sum(c_means)
                )

                # radar-domain compositing with the NWP field
                nwp_field = jnp.take(nwpf_l[t], model_j, axis=0)
                field = jnp.where(dmask_l, nwp_field, field)
                field = smask_l * field + (1.0 - smask_l) * nwp_field

                fmin = jnp.minimum(
                    jax.lax.pmin(jnp.min(field), "y"), precip_min
                )
                if mask_method == "incremental":
                    field = fmin + (field - fmin) * mask_j
                    field = jnp.where(field > fmin, field, fmin)
                elif mask_method == "obs":
                    field = jnp.where(mask_j > 0, field, fmin)

                if probmatching == "cdf":
                    if resample:
                        p_radar = jnp.sum(w[0]) / jnp.maximum(
                            jnp.sum(w[0]) + jnp.sum(w[1]), 1e-12
                        )
                        nsort = jnp.take(nsorted_l[t], model_j, axis=0)
                        pick = jax.random.bernoulli(
                            jax.random.fold_in(key, t), p_radar,
                            rsort_l.shape,
                        )
                        # sort-free binned target CDF: suffix-sums of the
                        # picks looked up at the static per-bin rank
                        # indices (see the setup comment above)
                        mixed = jnp.where(pick, rsort_l, nsort)
                        zv = jnp.min(mixed)
                        trg_max = jnp.max(mixed)
                        n_wet = jnp.sum(mixed > zv)
                        pickf = pick.astype(jnp.float32)
                        cum = jnp.cumsum(pickf)
                        total = cum[-1]
                        zero1 = jnp.zeros((1,), jnp.float32)
                        s_r = total - jnp.concatenate([zero1, cum])
                        notcum = (
                            jnp.arange(1, N_mn + 1, dtype=jnp.float32) - cum
                        )
                        s_n = (N_mn - total) - jnp.concatenate(
                            [zero1, notcum]
                        )
                        idxr_t = jnp.take(idx_r_l[t], model_j, axis=0)
                        idxn_t = jnp.take(idx_n_l[t], model_j, axis=0)
                        c_mix = jnp.round(
                            s_r[idxr_t] + s_n[idxn_t]
                        ).astype(jnp.int32)
                        field = _match_cdf_psum_binned(
                            field, zv, c_mix,
                            jnp.take(tlo_tm_l[t], model_j),
                            jnp.take(tscale_tm_l[t], model_j),
                            n_wet, trg_max, size_f, "y",
                        )
                    else:
                        field = _match_cdf_psum(field, tstate_l, size_f, "y")
                elif probmatching == "mean":
                    wet = field >= precip_thr
                    mu_fct = jax.lax.psum(
                        jnp.sum(jnp.where(wet, field, 0.0)), "y"
                    ) / jnp.maximum(jax.lax.psum(jnp.sum(wet), "y"), 1)
                    field = jnp.where(wet, field - mu_fct + mu_obs, field)

                if mask_method == "incremental":
                    mask_j = _dilated_mask_halo(
                        field, precip_thr, struct_radius, mask_rim, "y"
                    )
                return key, casc_j, noise_j, mask_j, disp_j, field

            keys, cascades, noise_casc, mask_prec, disp, outs = jax.vmap(
                member
            )(keys, cascades, noise_casc, mask_prec, disp, model_l,
              epar_l, eperp_l)
            return (cascades, noise_casc, mask_prec, keys, disp), outs

        carry0 = (cascades0, noise0, mask0, keys_l, disp0)
        _, outputs = jax.lax.scan(
            step, carry0, jnp.arange(int_steps, dtype=jnp.int32)
        )
        return outputs  # (T, e_loc, m_loc, n)

    out = run(
        window.astype(jnp.float32), noise_window.astype(jnp.float32),
        mask_prec_init.astype(jnp.float32), member_keys,
        velocity_blend.astype(jnp.float32),
        nwp_cascades.astype(jnp.float32), nwp_means.astype(jnp.float32),
        nwp_sigmas.astype(jnp.float32), nwp_fields.astype(jnp.float32),
        jnp.asarray(member_model, jnp.int32), weights_t.astype(jnp.float32),
        phi.astype(jnp.float32), filt_p, w2d_p.astype(jnp.float32),
        herm.astype(jnp.float32), noise_std_coeffs.astype(jnp.float32),
        radar_means.astype(jnp.float32), radar_sigmas.astype(jnp.float32),
        jnp.asarray(precip_last, jnp.float32),
        jnp.asarray(domain_mask, bool), smooth_mask.astype(jnp.float32),
        *tstate,
        eps_par.astype(jnp.float32), eps_perp.astype(jnp.float32),
        rsort_d, nwp_sorted, idx_r, idx_n, tlo_tm, tscale_tm,
    )
    return None, out
