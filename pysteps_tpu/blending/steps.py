"""
STEPS blending: seamless radar-nowcast x NWP combination
(reference: pysteps/blending/steps.py, 4.2k LoC; Imhoff et al. 2023 —
call stack in SURVEY.md §3.4).

TPU-native redesign:

- **Weights are precomputed.**  The per-lead-time NWP skill (regression
  towards climatology, skill_scores.py) and extrapolation skill (AR decay)
  do not depend on ensemble state, so the (T, components+1, k) weight
  tensors — and the per-step blended advection fields — are computed once
  up front and fed to the scan as per-step inputs, instead of being
  recomputed inside the per-member dask workers (reference:
  blending/steps.py:2116-2153 runs them per member per step).
- The forecast loop is one ``lax.scan`` with a vmapped member axis: AR
  evolution of the extrapolation and noise cascades (reference: :2259),
  advection in Lagrangian frame, cascade/means/sigmas blending
  (:2768, :4093), recomposition (:3038), and post-processing (radar-mask
  smoothing, NWP NaN-fill, incremental mask, distribution resampling +
  CDF matching, :3071).
- NWP inputs are raw (n_models, T+1, m, n) rainfall fields, decomposed
  up front with one batched FFT program (the reference supports an
  offline NetCDF cascade store; see blending.utils.decompose_NWP).
"""

import dataclasses
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from pysteps_tpu import cascade, noise
from pysteps_tpu.blending import skill_scores
from pysteps_tpu.blending.utils import compute_smooth_dilated_mask
from pysteps_tpu.cascade.decomposition import decompose_core
from pysteps_tpu.extrapolation.semilagrangian import (
    integrate_displacement,
    integrate_displacement_coarse,
    upsample_displacement,
)
from pysteps_tpu.noise.fftgenerators import (
    _generate_fft_noise,
    nonparam_filter_core,
)
from pysteps_tpu.noise.motion import (
    get_default_params_bps_par,
    get_default_params_bps_perp,
)
from pysteps_tpu.nowcasts import utils as nowcast_utils
from pysteps_tpu.nowcasts.steps import _estimate_params, _lagrangian_alignment
from pysteps_tpu.ops.warp import warp, warp_shifted
from pysteps_tpu.postprocessing.probmatching import _match_cdf_core
from pysteps_tpu.timeseries import autoregression
from pysteps_tpu.utils import tapering
from pysteps_tpu.utils.check_norain import check_norain
from pysteps_tpu.utils.devconst import cached_constant


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("cascades", "noise_cascades", "precip_mask", "member_keys",
                 "displacement"),
    meta_fields=(),
)
@dataclasses.dataclass
class StepsBlendingState:
    """Evolving per-member state of the blended forecast loop — the
    ``lax.scan`` carry (reference: blending/steps.py:364-449 mutates the
    corresponding fields in per-member dask workers)."""

    cascades: jnp.ndarray        # (E, k, p, m, n) extrapolation cascades
    noise_cascades: jnp.ndarray  # (E, k, p, m, n) noise cascades
    precip_mask: jnp.ndarray     # (E, m, n) rain mask
    member_keys: jnp.ndarray     # (E,) PRNG keys
    displacement: jnp.ndarray    # (E, 2, m, n) accumulated displacement


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("phi", "weights", "weights_model_only", "nwp_cascades",
                 "nwp_means", "nwp_sigmas", "radar_means", "radar_sigmas",
                 "noise_filter", "noise_std_coeffs", "velocity_blend"),
    meta_fields=(),
)
@dataclasses.dataclass
class StepsBlendingParams:
    """Quantities precomputed before the loop and constant inside it
    (reference: blending/steps.py:327-362; here the per-step skill/weight
    tensors are also precomputed — see the module docstring)."""

    phi: jnp.ndarray                # (k, p+1) radar AR parameters
    weights: jnp.ndarray            # (T, n_models, 3, k) extrap/NWP/noise
    weights_model_only: jnp.ndarray  # (T, n_models, 2, k) means/sigmas blend
    nwp_cascades: jnp.ndarray       # (T, n_models, k, m, n) normalized
    nwp_means: jnp.ndarray          # (T, n_models, k)
    nwp_sigmas: jnp.ndarray         # (T, n_models, k)
    radar_means: jnp.ndarray        # (k,)
    radar_sigmas: jnp.ndarray       # (k,)
    noise_filter: jnp.ndarray       # (m, n//2+1)
    noise_std_coeffs: jnp.ndarray   # (k,)
    velocity_blend: jnp.ndarray     # (T, n_models, 2, m, n)


@dataclasses.dataclass(frozen=True)
class StepsBlendingConfig:
    """Frozen configuration for STEPS blending
    (reference: blending/steps.py:75-325).  Field names follow the
    reference; `StepsBlendingNowcaster` maps them onto
    :func:`forecast`'s keyword arguments."""

    precip_threshold: float | None = None
    norain_threshold: float = 0.0
    kmperpixel: float | None = None
    timestep: float | None = None
    n_ens_members: int = 24
    n_cascade_levels: int = 6
    blend_nwp_members: bool = False
    extrapolation_method: str = "semilagrangian"
    decomposition_method: str = "fft"
    bandpass_filter_method: str = "gaussian"
    noise_method: str | None = "nonparametric"
    noise_stddev_adj: str | None = None
    ar_order: int = 2
    velocity_perturbation_method: str | None = None
    weights_method: str = "bps"
    conditional: bool = False
    probmatching_method: str | None = "cdf"
    mask_method: str | None = "incremental"
    resample_distribution: bool = True
    smooth_radar_mask_range: int = 0
    seed: int | None = None
    num_workers: int = 1
    fft_method: str = "numpy"
    domain: str = "spatial"
    outdir_path_skill: str | None = None
    extrapolation_kwargs: dict = dataclasses.field(default_factory=dict)
    filter_kwargs: dict = dataclasses.field(default_factory=dict)
    noise_kwargs: dict = dataclasses.field(default_factory=dict)
    velocity_perturbation_kwargs: dict = dataclasses.field(default_factory=dict)
    climatology_kwargs: dict = dataclasses.field(default_factory=dict)
    mask_kwargs: dict = dataclasses.field(default_factory=dict)
    measure_time: bool = False
    callback: object = None
    return_output: bool = True
    mesh: object = None


class StepsBlendingNowcaster:
    """Class front-end over the functional blending core
    (reference: blending/steps.py:451-492)."""

    def __init__(self, precip, precip_models, velocity, velocity_models,
                 time_steps, issue_time=None, steps_blending_config=None):
        self.precip = precip
        self.precip_models = precip_models
        self.velocity = velocity
        self.velocity_models = velocity_models
        self.time_steps = time_steps
        self.issue_time = issue_time
        self.config = steps_blending_config or StepsBlendingConfig()

    def compute_forecast(self):
        cfg = self.config
        return forecast(
            self.precip, self.precip_models, self.velocity,
            self.velocity_models, self.time_steps, cfg.timestep,
            issuetime=self.issue_time,
            n_ens_members=cfg.n_ens_members,
            n_cascade_levels=cfg.n_cascade_levels,
            blend_nwp_members=cfg.blend_nwp_members,
            precip_thr=cfg.precip_threshold,
            norain_thr=cfg.norain_threshold,
            kmperpixel=cfg.kmperpixel,
            extrap_method=cfg.extrapolation_method,
            decomp_method=cfg.decomposition_method,
            bandpass_filter_method=cfg.bandpass_filter_method,
            noise_method=cfg.noise_method,
            noise_stddev_adj=cfg.noise_stddev_adj,
            ar_order=cfg.ar_order,
            vel_pert_method=cfg.velocity_perturbation_method,
            weights_method=cfg.weights_method,
            conditional=cfg.conditional,
            probmatching_method=cfg.probmatching_method,
            mask_method=cfg.mask_method,
            resample_distribution=cfg.resample_distribution,
            smooth_radar_mask_range=cfg.smooth_radar_mask_range,
            callback=cfg.callback,
            return_output=cfg.return_output,
            seed=cfg.seed,
            num_workers=cfg.num_workers,
            fft_method=cfg.fft_method,
            domain=cfg.domain,
            outdir_path_skill=cfg.outdir_path_skill,
            extrap_kwargs=cfg.extrapolation_kwargs,
            filter_kwargs=cfg.filter_kwargs,
            noise_kwargs=cfg.noise_kwargs,
            vel_pert_kwargs=cfg.velocity_perturbation_kwargs,
            clim_kwargs=cfg.climatology_kwargs,
            mask_kwargs=cfg.mask_kwargs,
            measure_time=cfg.measure_time,
            mesh=cfg.mesh,
        )


def calculate_ratios(correlations):
    """Explained-variance ratios (reference: blending/steps.py:3819)."""
    sq = np.square(correlations)
    return sq / (1 - sq)


def calculate_weights_bps(correlations):
    """BPS2006 blending weights (reference: blending/steps.py:3844).

    correlations: (components, k, ...) -> weights (components+1, k, ...)
    with a trailing noise component."""
    correlations = np.where(correlations < 10e-5, 10e-5, correlations)
    if correlations.shape[0] > 1:
        ratios = calculate_ratios(correlations)
        total = np.sum(ratios, axis=0)
        weights = correlations * np.sqrt(ratios / total)
        noise_weight = np.sqrt(
            np.maximum(1.0 - np.sum(np.square(weights), axis=0), 0.0)
        )
        return np.concatenate([weights, noise_weight[None]], axis=0)
    noise_weight = 1.0 - correlations
    return np.concatenate([correlations, noise_weight], axis=0)


def calculate_weights_spn(correlations, covariance):
    """SPN2013 covariance-inverse weights
    (reference: blending/steps.py:3905)."""
    correlations = np.where(correlations < 10e-5, 10e-5, np.asarray(correlations))
    if correlations.shape[0] > 1 and covariance is not None and np.ndim(covariance) == 2:
        covariance = np.where(covariance == 0.0, 10e-5, np.asarray(covariance, float))
        if np.linalg.det(covariance) == 0.0:
            covariance = covariance - 10e-5
        for i in range(len(covariance)):
            covariance[i][i] = 1.0
        cov_inv = np.linalg.inv(covariance)
        weights = cov_inv @ correlations
        weights = np.nan_to_num(weights, nan=10e-5, posinf=10e-5, neginf=10e-5)
        wdc = np.sum(weights * correlations)
        noise_weight = np.array([0.0]) if wdc > 1.0 else np.sqrt(1.0 - wdc)
        weights = np.concatenate(
            [np.asarray(weights).ravel(), np.atleast_1d(noise_weight).ravel()]
        )
        return np.nan_to_num(weights, nan=10e-5, posinf=10e-5, neginf=10e-5)
    noise_weight = 1.0 - correlations
    return np.concatenate([correlations, noise_weight], axis=0)


def calculate_end_weights(
    previous_weights, timestep, n_timesteps, start_full_nwp_weight, model_only=False
):
    """Linear transition to full-NWP weight near the forecast end
    (reference: blending/steps.py:3987)."""
    weights = np.array(previous_weights[:-1], copy=True)
    frac = (timestep - start_full_nwp_weight) / max(
        n_timesteps - start_full_nwp_weight, 1e-6
    )
    frac = np.clip(frac, 0.0, 1.0)
    # component 0 is the extrapolation; the rest are NWP models
    if not model_only:
        weights[0] = (1 - frac) * weights[0]
        weights[1:] = weights[1:] + frac * (1.0 - weights[1:]) / max(
            weights.shape[0] - 1, 1
        )
    noise_weight = np.sqrt(np.maximum(1.0 - np.sum(weights**2, axis=0), 0.0))
    return np.concatenate([weights, noise_weight[None]], axis=0)


def blend_means_sigmas(means, sigmas, weights):
    """Weighted blend of normalization statistics
    (reference: blending/steps.py:4093; BPS2004 eq. 32-33)."""
    means = jnp.asarray(means)
    sigmas = jnp.asarray(sigmas)
    weights = jnp.asarray(weights)[:-1]  # drop noise component
    while means.ndim < weights.ndim:
        means = means[..., None]
    while sigmas.ndim < weights.ndim:
        sigmas = sigmas[..., None]
    total = jnp.maximum(jnp.sum(weights, axis=0), 1e-12)
    combined_means = jnp.sum(weights / total * means, axis=0)
    combined_sigmas = jnp.sum(weights / total * sigmas, axis=0)
    return combined_means, combined_sigmas


@jax.jit
def _presort_targets(precip_last, nwp_fields, precip_min):
    """Descending-sorted radar + per-(t, model) NWP intensity
    distributions for the resampled CDF match.  The NWP sorts run
    sequentially (lax.map over lead times): the batched TPU sort's
    workspace for 12 x 4.2M rows at once OOMed the 2048^2 config."""
    rsort_desc = jnp.sort(precip_last.ravel())[::-1]
    flat = jnp.where(jnp.isnan(nwp_fields), precip_min, nwp_fields).reshape(
        nwp_fields.shape[0], nwp_fields.shape[1], -1
    )
    nsorts_desc = jax.lax.map(
        lambda row: jnp.sort(row, axis=-1)[..., ::-1], flat
    )
    return rsort_desc, nsorts_desc


@functools.partial(
    jax.jit,
    static_argnames=(
        "int_steps", "mask_method", "probmatching", "resample_distribution",
        "mask_rim", "struct_radius", "E", "noise_filt_shape", "external",
        "max_disp", "vel_pert", "p_par", "p_perp", "use_noise",
        "vel_coarse",
    ),
)
def _blending_scan(
    window, noise_window, mask_prec_init, member_keys, velocity_blend,
    nwp_cascades, nwp_means, nwp_sigmas, nwp_fields, member_model,
    weights_t, weights_mv_t, phi, noise_filt, weights_2d, noise_std_coeffs,
    radar_means, radar_sigmas, precip_last, precip_min, precip_thr,
    domain_mask, smooth_mask, int_steps, mask_method, probmatching,
    resample_distribution, mask_rim, struct_radius, E, noise_filt_shape,
    external=False, ext_cascades=None, ext_means=None, ext_sigmas=None,
    max_disp=None, vel_pert=False, p_par=None, p_perp=None,
    eps_par=None, eps_perp=None, vsf=1.0, timestep_min=1.0,
    use_noise=True, t_offset=0, carry_init=None, vel_coarse=False,
    sorts_pre=None,
):
    """The blended forecast loop.

    window/noise_window: (k, p, m, n) initial normalized cascades.
    nwp_cascades: (T, n_models, k, m, n) normalized NWP cascades per step.
    weights_t: (T, n_models, 3, k) per-step blending weights
    (extrap, nwp, noise) for the member's paired model.
    velocity_blend: (T, n_models, 2, m, n) blended advection per step.
    member_model: (E,) int32 NWP model index per ensemble member.
    """
    k_levels, p, m, n = window.shape

    cascades0 = jnp.broadcast_to(window, (E,) + window.shape)
    noise0 = jnp.broadcast_to(noise_window, (E,) + noise_window.shape)
    mask_prec0 = jnp.broadcast_to(mask_prec_init, (E, m, n))

    # displacement carried on a coarse grid with shift-decomposition warps
    # when a static displacement bound is known (see nowcasts/steps.py —
    # the same design; XLA's dynamic gather is scalar on TPU)
    coarse = 4 if (max_disp is not None and m % 4 == 0 and n % 4 == 0) else 1
    if max_disp is not None and coarse > 1:
        T_, nm_ = velocity_blend.shape[:2]
        mc, nc = m // coarse, n // coarse
        if vel_coarse:
            # caller already pooled (outer-chunk path: keeps the full-res
            # (T, n_models, 2, m, n) stack — 805 MB at 2048^2 — off HBM)
            vel_all = velocity_blend
        else:
            vel_all = velocity_blend.reshape(
                T_, nm_, 2, mc, coarse, nc, coarse
            ).mean(axis=(-3, -1))
        displacement0 = jnp.zeros((E, 2, mc, nc), jnp.float32)
    else:
        vel_all = velocity_blend
        displacement0 = jnp.zeros((E, 2, m, n), jnp.float32)
    if eps_par is None:
        eps_par = jnp.zeros(E, jnp.float32)
        eps_perp = jnp.zeros(E, jnp.float32)

    # hoisted sorted intensity distributions for resampled CDF matching:
    # the radar sort is call-constant and the NWP sorts depend only on
    # (t, model) — in-scan they cost 2 of the 4 per-step sorts the r4
    # trace found (~150 ms of a 1.0 s device scan at 96x256^2).  The
    # outer member-chunk path passes them pre-sorted (``sorts_pre``) so
    # they are computed once, not once per chunk.
    if probmatching == "cdf" and resample_distribution:
        if sorts_pre is not None:
            rsort_desc, nsorts_desc = sorts_pre
        else:
            rsort_desc, nsorts_desc = _presort_targets(
                precip_last, nwp_fields, precip_min
            )
    else:
        rsort_desc = nsorts_desc = None

    def step(carry, t):
        cascades = carry.cascades
        noise_casc = carry.noise_cascades
        mask_prec = carry.precip_mask
        keys = carry.member_keys
        displacement = carry.displacement
        t_total = (t + 1.0) * timestep_min

        def member(
            key, casc_j, noise_j, mask_j, disp_j, model_j, ext_j,
            eps_par_j, eps_perp_j,
        ):
            key, k_noise = jax.random.split(key)
            # --- noise generation + AR evolution (reference: :2259; with
            # noise disabled the noise cascades stay zero, reference
            # :2326-2340 guard) ---
            casc_j = autoregression.iterate_ar_model(casc_j, phi, eps=None)
            if use_noise:
                eps = _generate_fft_noise(
                    k_noise, noise_filt, noise_filt_shape, False,
                    standardize=False,
                )
                eps_levels, _, _ = decompose_core(
                    eps, weights_2d, normalize=True
                )
                eps_levels = eps_levels * noise_std_coeffs[:, None, None]
                noise_j = autoregression.iterate_ar_model(
                    noise_j, phi, eps=eps_levels
                )

            # --- velocity perturbation (reference: :2349, noise/motion.py;
            # direction fields come from the per-step blended flow, so they
            # are recomputed in-scan — on the coarse grid this is cheap) ---
            vel_j = vel_all[t, model_j]
            if vel_pert:
                a1, b1, c1 = p_par
                a2, b2, c2 = p_perp
                g_par = a1 * t_total**b1 + c1
                g_perp = a2 * t_total**b2 + c2
                nv = jnp.linalg.norm(vel_j, axis=0)
                v_n = jnp.where(
                    nv[None] > 1e-12, vel_j / jnp.maximum(nv[None], 1e-12), 0.0
                )
                v_perp = jnp.stack([-v_n[1], v_n[0]])
                vel_j = vel_j + (
                    eps_par_j * g_par * v_n + eps_perp_j * g_perp * v_perp
                ) / vsf

            # --- blend weights + recomposition coefficients first: the
            # per-level blend weights are SCALARS, warping is linear, and
            # the warped levels feed only the recomposed output (the AR
            # carry stays Eulerian) — so the k-level weighted sums
            # commute with the warp and 2k per-level warps collapse into
            # ONE composite-field warp per member-step (the r4 trace
            # showed the per-level warps were ~42% of the scan's device
            # time).  Exact: same sampling coordinates, and cval=0 scales
            # through the weighted sum. ---
            w = weights_t[t, model_j]  # (3, k): extrap, nwp, noise
            nwp_lvls = nwp_cascades[t, model_j]  # (k, m, n)
            wsum = jnp.maximum(jnp.sum(w, axis=0), 1e-12)  # (k,)
            if external:
                r_means = ext_means[t]
                r_sigmas = ext_sigmas[t]
            else:
                r_means = radar_means
                r_sigmas = radar_sigmas
            means = jnp.stack([r_means, nwp_means[t, model_j]])
            sigmas = jnp.stack([r_sigmas, nwp_sigmas[t, model_j]])
            w_ms = jnp.stack([w[0], w[1], w[2]])
            c_means, c_sigmas = blend_means_sigmas(means, sigmas, w_ms)
            a_ext = (w[0] * c_sigmas / wsum)[:, None, None]
            a_nwp = (w[1] * c_sigmas / wsum)[:, None, None]
            a_noi = (w[2] * c_sigmas / wsum)[:, None, None]

            # Lagrangian composite: everything that needs advecting,
            # already weighted for recomposition (reference advects each
            # cascade level separately, :2349)
            comp = jnp.zeros((m, n), jnp.float32)
            if not external:
                comp = jnp.sum(casc_j[:, -1] * a_ext, axis=0)
            if use_noise:
                comp = comp + jnp.sum(noise_j[:, -1] * a_noi, axis=0)

            need_warp = (not external) or use_noise
            if max_disp is not None:
                disp_j = integrate_displacement_coarse(
                    vel_j, disp_j, 1.0, max_disp=max_disp, coarse=coarse
                )
                if need_warp:
                    disp_full = upsample_displacement(disp_j, (m, n), coarse)
                    comp = warp_shifted(comp, disp_full, max_disp, cval=0.0)
            else:
                disp_j = integrate_displacement(vel_j, disp_j, 1.0)
                if need_warp:
                    comp = warp(comp, disp_j, order=1, cval=0.0)

            field = comp + jnp.sum(nwp_lvls * a_nwp, axis=0) + jnp.sum(c_means)
            if external:
                field = field + jnp.sum(ext_j * a_ext, axis=0)

            # --- post-processing (reference: :3071) ---
            nwp_field = nwp_fields[t, model_j]
            # outside the radar domain: take NWP, with smooth transition
            field = jnp.where(domain_mask, nwp_field, field)
            field = smooth_mask * field + (1.0 - smooth_mask) * nwp_field

            fmin = jnp.minimum(jnp.min(field), precip_min)
            if mask_method == "incremental":
                field = fmin + (field - fmin) * mask_j
                field = jnp.where(field > fmin, field, fmin)
            elif mask_method == "obs":
                field = jnp.where(mask_j > 0, field, fmin)

            if probmatching == "cdf":
                if resample_distribution:
                    # binomial mix of radar and NWP intensity distributions
                    # weighted by the current extrapolation skill
                    # (reference: probmatching.resample_distributions)
                    p_radar = jnp.sum(w[0]) / jnp.maximum(
                        jnp.sum(w[0]) + jnp.sum(w[1]), 1e-12
                    )
                    rsort = rsort_desc
                    nsort = nsorts_desc[t, model_j]
                    pick = jax.random.bernoulli(
                        jax.random.fold_in(key, t), p_radar, rsort.shape
                    )
                    target = jnp.where(pick, rsort, nsort)
                else:
                    target = precip_last
                field = _match_cdf_core(field, target.reshape(field.shape))
            elif probmatching == "mean":
                wet = field >= precip_thr
                mu_obs = jnp.sum(
                    jnp.where(precip_last >= precip_thr, precip_last, 0.0)
                ) / jnp.maximum(jnp.sum(precip_last >= precip_thr), 1)
                mu_fct = jnp.sum(jnp.where(wet, field, 0.0)) / jnp.maximum(
                    jnp.sum(wet), 1
                )
                field = jnp.where(wet, field - mu_fct + mu_obs, field)

            if mask_method == "incremental":
                mask_j = nowcast_utils.compute_dilated_mask(
                    field >= precip_thr, struct_radius, mask_rim
                )

            return key, casc_j, noise_j, mask_j, disp_j, field

        if external:
            ext_t = ext_cascades[t]  # (E, k, m, n)
        else:
            ext_t = jnp.zeros((E, 1, 1, 1))
        keys, cascades, noise_casc, mask_prec, displacement, outs = jax.vmap(
            member
        )(
            keys, cascades, noise_casc, mask_prec, displacement, member_model,
            ext_t, eps_par, eps_perp,
        )
        new_carry = StepsBlendingState(
            cascades=cascades, noise_cascades=noise_casc,
            precip_mask=mask_prec, member_keys=keys,
            displacement=displacement,
        )
        return new_carry, outs

    if carry_init is not None:
        carry0 = carry_init
    else:
        carry0 = StepsBlendingState(
            cascades=cascades0, noise_cascades=noise0, precip_mask=mask_prec0,
            member_keys=member_keys, displacement=displacement0,
        )
    carry_out, outputs = jax.lax.scan(
        step, carry0, jnp.arange(int_steps) + t_offset
    )
    return carry_out, outputs  # outputs time-major (T, E, m, n)


def forecast(
    precip,
    precip_models,
    velocity,
    velocity_models,
    timesteps,
    timestep,
    issuetime=None,
    n_ens_members=24,
    n_cascade_levels=6,
    blend_nwp_members=False,
    precip_thr=None,
    norain_thr=0.0,
    kmperpixel=None,
    extrap_method="semilagrangian",
    decomp_method="fft",
    bandpass_filter_method="gaussian",
    noise_method="nonparametric",
    noise_stddev_adj=None,
    ar_order=2,
    vel_pert_method=None,
    weights_method="bps",
    conditional=False,
    probmatching_method="cdf",
    mask_method="incremental",
    resample_distribution=True,
    smooth_radar_mask_range=0,
    callback=None,
    return_output=True,
    seed=None,
    num_workers=1,
    fft_method="numpy",
    domain="spatial",
    outdir_path_skill=None,
    extrap_kwargs=None,
    filter_kwargs=None,
    noise_kwargs=None,
    vel_pert_kwargs=None,
    clim_kwargs=None,
    mask_kwargs=None,
    measure_time=False,
    precip_nowcast=None,
    nowcasting_method="steps",
    timestep_start_full_nwp_weight=None,
    mesh=None,
    output_dtype="float32",
    member_chunk=None,
):
    """STEPS blending forecast (reference: blending/steps.py:3383).

    precip: (ar_order+1, m, n) radar fields (transformed units).
    precip_models: (n_models, T+1, m, n) raw NWP fields in the same units
    (decomposed internally), or (n_models, m, n) static fields repeated.
    velocity_models: (n_models, 2, m, n).
    precip_nowcast: optional externally computed nowcast ensemble
    (n_ens_members, T, m, n) used as the extrapolation component instead
    of the internal AR cascade (reference:
    nowcasting_method="external_nowcast", blending/steps.py:113-121);
    selecting nowcasting_method="external_nowcast" requires it.
    timestep_start_full_nwp_weight: lead-time index after which the weights
    transition linearly to full NWP weight
    (reference: blending/steps.py:143-150,3987 via calculate_end_weights).
    Returns (n_ens_members, T, m, n).
    """
    if nowcasting_method not in ("steps", "external_nowcast"):
        raise ValueError(
            f"unknown nowcasting_method {nowcasting_method}; "
            "must be 'steps' or 'external_nowcast'"
        )
    if nowcasting_method == "external_nowcast" and precip_nowcast is None:
        raise ValueError(
            "nowcasting_method='external_nowcast' requires precip_nowcast"
        )
    if timestep_start_full_nwp_weight is not None:
        if timestep_start_full_nwp_weight < 0:
            raise ValueError(
                "timestep_start_full_nwp_weight cannot be smaller than zero"
            )
    t0 = time.time()
    precip = np.asarray(precip, np.float32)
    precip_models = np.asarray(precip_models, np.float32)
    velocity = np.asarray(velocity, np.float32)
    velocity_models = np.asarray(velocity_models, np.float32)
    extrap_kwargs = dict(extrap_kwargs or {})
    mask_kwargs = dict(mask_kwargs or {})
    noise_kwargs = dict(noise_kwargs or {})
    clim_kwargs = dict(clim_kwargs or {})
    filter_kwargs = filter_kwargs or {}

    if precip_thr is None:
        raise ValueError("precip_thr required")
    if isinstance(timesteps, int):
        int_steps = timesteps
        subsel = None
    else:
        subsel = list(timesteps)
        int_steps = int(np.ceil(max(subsel)))
    if (
        timestep_start_full_nwp_weight is not None
        and timestep_start_full_nwp_weight >= int_steps
    ):
        raise ValueError(
            "timestep_start_full_nwp_weight cannot be the same or larger "
            "than the total number of timesteps in this forecast"
        )

    if precip_models.ndim == 3:
        precip_models = np.repeat(
            precip_models[:, None], int_steps + 1, axis=1
        )
    n_models = precip_models.shape[0]
    if velocity_models.ndim == 3:
        velocity_models = velocity_models[None]
    m, n = precip.shape[-2:]

    # norain gates for radar and NWP (reference: :598-604, :1290, :1346)
    zero_radar = check_norain(precip, precip_thr, norain_thr, None, printmsg=False)
    zero_nwp = check_norain(precip_models, precip_thr, norain_thr, None, printmsg=False)
    if zero_radar and zero_nwp:
        return nowcast_utils.zero_precipitation_forecast(
            n_ens_members, timesteps, precip, callback, return_output,
            measure_time, t0,
        )

    precip = precip[-(ar_order + 1) :]
    domain_mask = ~np.isfinite(precip[-1])
    precip_min = float(np.nanmin(precip))
    precip = np.where(np.isfinite(precip), precip, precip_min)
    precip_models = np.where(
        np.isfinite(precip_models), precip_models, precip_min
    )

    bp_filter = cascade.get_method(bandpass_filter_method)(
        (m, n), n_cascade_levels, **filter_kwargs
    )
    weights_2d = bp_filter["weights_2d"].astype(jnp.float32)

    velocity_j = jnp.asarray(velocity)
    precip_j = jnp.asarray(precip)

    # radar cascades + AR parameters (same machinery as the nowcast)
    mask_thr = (
        jnp.all(precip_j >= precip_thr, axis=0)
        if conditional
        else jnp.ones((m, n), dtype=bool)
    )
    precip_aligned = _lagrangian_alignment(precip_j, velocity_j)
    cascades_full, means, stds, gamma, phi = _estimate_params(
        precip_aligned, weights_2d, mask_thr, ar_order, conditional
    )
    radar_means, radar_sigmas = means[-1], stds[-1]
    window = cascades_full[:, -ar_order:]

    # decompose NWP fields for all models and steps in one batched program
    dec = jax.jit(
        jax.vmap(
            jax.vmap(lambda f: decompose_core(f, weights_2d, normalize=True))
        )
    )
    nwp_levels, nwp_means_all, nwp_sigmas_all = dec(
        jnp.asarray(precip_models[:, : int_steps + 1])
    )  # (n_models, T+1, ...)

    # NWP skill at t=0 vs the latest radar cascade (reference: :2058)
    rho_0 = np.stack(
        [
            skill_scores.spatial_correlation(
                cascades_full[:, -1], nwp_levels[im, 0], np.asarray(domain_mask)
            )
            for im in range(n_models)
        ]
    )  # (n_models, k)

    # precompute per-lead-time weights (reference computes these per member
    # per step; they are state-independent)
    from pysteps_tpu.config import rcparams

    outdir = outdir_path_skill or rcparams["outputs"]["path_workdir"]
    phi_np = np.asarray(phi)
    weights_t = np.zeros((int_steps, n_models, 3, n_cascade_levels), np.float32)
    rho_extrap_prev = None
    rho_extrap = None
    for t in range(int_steps):
        lt = (t + 1) * float(timestep)
        rho_extrap, rho_extrap_prev = skill_scores.lt_dependent_cor_extrapolation(
            phi_np[:, :ar_order + 1], rho_extrap, rho_extrap_prev, ar_order
        )
        for im in range(n_models):
            rho_nwp = skill_scores.lt_dependent_cor_nwp(
                lt, rho_0[im], outdir, n_model=im,
                skill_kwargs={"n_models": n_models, **clim_kwargs},
            )
            corr = np.stack([np.asarray(rho_extrap), rho_nwp])
            if weights_method == "bps":
                w = calculate_weights_bps(corr)  # (3, k)
            elif weights_method == "spn":
                w = np.stack(
                    [
                        calculate_weights_spn(
                            corr[:, k_i],
                            np.corrcoef(
                                np.stack(
                                    [
                                        np.asarray(
                                            cascades_full[k_i, -1]
                                        ).ravel(),
                                        np.asarray(nwp_levels[im, t, k_i]).ravel(),
                                    ]
                                )
                            ),
                        )
                        for k_i in range(n_cascade_levels)
                    ],
                    axis=1,
                )
            else:
                raise ValueError(f"unknown weights_method {weights_method}")
            # linear transition to full-NWP weight near the forecast end
            # (reference: blending/steps.py:2178,3987); timesteps are
            # compared as lead indices like the reference's sub-timesteps
            if (
                timestep_start_full_nwp_weight is not None
                and t + 1 > timestep_start_full_nwp_weight
            ):
                w = calculate_end_weights(
                    w, t + 1, int_steps, timestep_start_full_nwp_weight
                )
            weights_t[t, im] = w

    # blended advection per step: weighted by the second cascade level's
    # weights (reference: blending/utils.py:185 note).  velocity_models may
    # be static (n_models, 2, m, n) or time-varying (n_models, T+1, 2, m, n)
    # as the reference requires (reference: blending/steps.py:795-797,1856)
    vel_w_extrap = weights_t[:, :, 0, 1]  # (T, n_models)
    vel_w_nwp = weights_t[:, :, 1, 1]
    tot = np.maximum(vel_w_extrap + vel_w_nwp, 1e-12)
    if velocity_models.ndim == 5:
        idx = np.clip(
            np.arange(1, int_steps + 1), 0, velocity_models.shape[1] - 1
        )
        vm_t = np.swapaxes(velocity_models[:, idx], 0, 1)  # (T, n_models, 2, m, n)
    else:
        vm_t = velocity_models[None, :, :2]
    velocity_blend = (
        vel_w_extrap[..., None, None, None] * velocity[None, None]
        + vel_w_nwp[..., None, None, None] * vm_t
    ) / tot[..., None, None, None]

    # noise filter (reference: :1421)
    if noise_method == "nonparametric" and set(noise_kwargs) <= {"win_fun"}:
        # in-graph filter: the aligned fields stay on device instead of
        # bouncing through the host generator (slow host-device links)
        win_fun = noise_kwargs.get("win_fun", "tukey")
        taper = cached_constant(
            ("steps_taper", m, n, win_fun),
            lambda: np.asarray(
                tapering.compute_window_function(m, n, win_fun)
                if win_fun is not None
                else np.ones((m, n)),
                np.float32,
            ),
        )
        noise_filt = nonparam_filter_core(
            jnp.asarray(precip_aligned), taper
        ).astype(jnp.float32)
        pert_gen = {
            "field": noise_filt, "input_shape": (m, n), "use_full_fft": False,
        }
    elif noise_method is not None:
        init_noise, _ = noise.get_method(noise_method)
        # parametric: device array in, only the radial spectrum crosses
        # the tunnel (noise/fftgenerators.py device path)
        noise_src = (
            jnp.asarray(precip_aligned)
            if noise_method == "parametric"
            else np.asarray(precip_aligned)
        )
        pert_gen = init_noise(noise_src, **noise_kwargs)
        noise_filt = jnp.asarray(pert_gen["field"], jnp.float32)
        if pert_gen.get("use_full_fft") and noise_filt.ndim == 2:
            # the scan multiplies rfft2 half-planes; a full-fft filter
            # magnitude is Hermitian-symmetric, so its left half IS the
            # rfft filter (same slice as nowcasts/steps.py)
            noise_filt = noise_filt[:, : n // 2 + 1]
    else:
        noise_filt = jnp.ones((m, n // 2 + 1), jnp.float32)
    noise_std_coeffs = jnp.ones(n_cascade_levels, jnp.float32)
    if noise_stddev_adj == "auto" and noise_method is not None:
        noise_std_coeffs = noise.utils.compute_noise_stddev_adjs(
            precip[-1], precip_thr, precip_min, bp_filter, None, pert_gen,
            None, 20, conditional=True,
            key=jax.random.PRNGKey((seed or 42) + 1),
        ).astype(jnp.float32)
    elif noise_stddev_adj == "fixed":
        noise_std_coeffs = jnp.asarray(
            [1.0 / (0.75 + 0.09 * k) for k in range(1, n_cascade_levels + 1)],
            jnp.float32,
        )

    # member-model pairing (reference: :1849)
    if blend_nwp_members:
        member_model = jnp.zeros(n_ens_members, jnp.int32)
        # combine all models into a single pseudo-model by averaging their
        # normalized cascades (weighted blending of >2 components is applied
        # through the weights of this combined component)
        nwp_levels = jnp.mean(nwp_levels, axis=0, keepdims=True)
        nwp_means_all = jnp.mean(nwp_means_all, axis=0, keepdims=True)
        nwp_sigmas_all = jnp.mean(nwp_sigmas_all, axis=0, keepdims=True)
        weights_t = weights_t.mean(axis=1, keepdims=True)
        velocity_blend = velocity_blend.mean(axis=1, keepdims=True)
        precip_models_used = precip_models.mean(axis=0, keepdims=True)
    else:
        member_model = jnp.asarray(
            [j % n_models for j in range(n_ens_members)], jnp.int32
        )
        precip_models_used = precip_models

    # masks
    mask_rim = int(mask_kwargs.get("mask_rim", 10))
    struct_radius = 1
    if timestep is not None and kmperpixel:
        struct_radius = max(
            int((mask_kwargs.get("mask_f", 1.0) * timestep / kmperpixel - 1) / 2.0),
            1,
        )
    wet = jnp.asarray(precip[-1] >= precip_thr)
    if mask_method == "incremental":
        mask_prec_init = nowcast_utils.compute_dilated_mask(
            wet, struct_radius, mask_rim
        ).astype(jnp.float32)
    elif mask_method == "obs":
        mask_prec_init = wet.astype(jnp.float32)
    else:
        mask_prec_init = jnp.ones((m, n), jnp.float32)

    # smooth radar-domain mask (reference: :3071 + utils:561)
    if smooth_radar_mask_range and np.any(domain_mask):
        smooth_mask = compute_smooth_dilated_mask(
            ~jnp.asarray(domain_mask),
            max_padding_size_in_px=int(smooth_radar_mask_range),
        )
    else:
        smooth_mask = jnp.ones((m, n), jnp.float32)

    member_keys = jax.vmap(
        lambda i: jax.random.fold_in(
            jax.random.PRNGKey(seed if seed is not None else 42), i
        )
    )(jnp.arange(n_ens_members))

    # velocity perturbations (reference: blending/steps.py velocity
    # perturbation init, same BPS machinery as nowcasts/steps.py)
    vel_pert = vel_pert_method is not None
    if vel_pert:
        from pysteps_tpu.noise.motion import _laplace

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
        eps_par = jax.vmap(_laplace)(vkeys[:n_ens_members])
        eps_perp = jax.vmap(_laplace)(vkeys[n_ens_members:])
    else:
        p_par = p_perp = None
        vsf = 1.0
        eps_par = eps_perp = None

    # static displacement bound for the shift-decomposition warps (see
    # nowcasts/steps.py — on CPU the exact gather is faster to compile)
    on_cpu = jax.default_backend() == "cpu"
    vmax = float(np.max(np.abs(velocity_blend))) if velocity_blend.size else 0.0
    if vel_pert:
        t_last = int_steps * (timestep or 1.0)
        g_par_l = abs(p_par[0] * t_last ** p_par[1] + p_par[2])
        g_perp_l = abs(p_perp[0] * t_last ** p_perp[1] + p_perp[2])
        pert_margin = 4.0 * max(g_par_l, g_perp_l) / max(vsf, 1e-6)
    else:
        pert_margin = 0.0
    max_disp = max(int(np.ceil(int_steps * (vmax + pert_margin))) + 2, 2)
    max_disp = min(max_disp, 48)
    if on_cpu or max_disp > min(m, n) // 3:
        max_disp = None
    # test hook / expert override (e.g. exercise the shift path on CPU)
    if "max_disp" in extrap_kwargs:
        max_disp = extrap_kwargs["max_disp"]

    # external nowcast: decompose the supplied ensemble per member/step
    external = precip_nowcast is not None
    if external:
        precip_nowcast = np.asarray(precip_nowcast, np.float32)
        if precip_nowcast.shape[0] != n_ens_members:
            raise ValueError(
                "precip_nowcast must have n_ens_members members"
            )
        pn = np.where(np.isfinite(precip_nowcast), precip_nowcast, precip_min)
        dec_ext = jax.jit(
            jax.vmap(
                jax.vmap(
                    lambda f: decompose_core(f, weights_2d, normalize=True)
                )
            )
        )
        ext_levels, ext_means_em, ext_sigmas_em = dec_ext(
            jnp.asarray(pn[:, :int_steps])
        )  # (E, T, k, ...)
        ext_cascades = jnp.swapaxes(ext_levels, 0, 1).astype(jnp.float32)
        ext_means = jnp.mean(
            jnp.swapaxes(ext_means_em, 0, 1), axis=1
        ).astype(jnp.float32)  # (T, k)
        ext_sigmas = jnp.mean(
            jnp.swapaxes(ext_sigmas_em, 0, 1), axis=1
        ).astype(jnp.float32)
    else:
        ext_cascades = ext_means = ext_sigmas = None

    # multi-chip: members are pure data parallelism — shard the member
    # axis over the mesh's "ens" axis and XLA partitions the whole scan
    if mesh is not None:
        from pysteps_tpu.parallel import ens_sharding

        sh = ens_sharding(mesh)
        member_keys = jax.device_put(member_keys, sh)
        member_model = jax.device_put(jnp.asarray(member_model), sh)

    init_time = time.time() - t0
    t1 = time.time()
    scan_args = (
        window.astype(jnp.float32),
        jnp.zeros_like(window),
        mask_prec_init,
        member_keys,
        jnp.asarray(velocity_blend, jnp.float32),
        jnp.swapaxes(nwp_levels[:, 1 : int_steps + 1], 0, 1).astype(jnp.float32),
        jnp.swapaxes(nwp_means_all[:, 1 : int_steps + 1], 0, 1).astype(jnp.float32),
        jnp.swapaxes(nwp_sigmas_all[:, 1 : int_steps + 1], 0, 1).astype(jnp.float32),
        jnp.swapaxes(
            jnp.asarray(precip_models_used[:, 1 : int_steps + 1]), 0, 1
        ).astype(jnp.float32),
        member_model,
        jnp.asarray(weights_t),
        None,
        phi.astype(jnp.float32),
        noise_filt,
        weights_2d,
        noise_std_coeffs,
        radar_means.astype(jnp.float32),
        radar_sigmas.astype(jnp.float32),
        jnp.asarray(precip[-1]),
        jnp.float32(precip_min),
        jnp.float32(precip_thr),
        jnp.asarray(domain_mask),
        smooth_mask.astype(jnp.float32),
    )
    scan_kwargs = dict(
        mask_method=mask_method,
        probmatching=probmatching_method,
        resample_distribution=bool(resample_distribution),
        mask_rim=mask_rim,
        struct_radius=struct_radius,
        E=n_ens_members,
        noise_filt_shape=(m, n),
        external=external,
        ext_cascades=ext_cascades,
        ext_means=ext_means,
        ext_sigmas=ext_sigmas,
        max_disp=max_disp,
        vel_pert=vel_pert,
        p_par=p_par,
        p_perp=p_perp,
        eps_par=eps_par,
        eps_perp=eps_perp,
        vsf=jnp.float32(vsf),
        timestep_min=jnp.float32(timestep if timestep else 1.0),
        use_noise=noise_method is not None,
    )

    # spatial sharding: a mesh with a non-trivial "y" axis routes the scan
    # through the shard_map variant (grid rows over "y", members over
    # "ens"; parallel/sharded_blending.py)
    # Mesh.shape is a dict; a user mesh without a "y" axis (e.g.
    # Mesh(("ens",))) takes the ensemble-sharded path
    spatial = mesh is not None and int(mesh.shape.get("y", 1)) > 1

    if callback is not None and not return_output and subsel is None and not spatial:
        # incremental memory contract: chunked scan + per-chunk host fetch
        # (reference: blending/steps.py callback/return_output modes)
        t_chunk = min(4, int_steps)
        carry = None
        t_done = 0
        while t_done < int_steps:
            tc = min(t_chunk, int_steps - t_done)
            carry, out_c = _blending_scan(
                *scan_args, tc, t_offset=t_done, carry_init=carry,
                **scan_kwargs,
            )
            arr = np.asarray(out_c)
            del out_c
            for ti in range(tc):
                callback(arr[ti])
            t_done += tc
        loop_time = time.time() - t1
        if measure_time:
            return None, init_time, loop_time
        return None

    # Outer member chunking for memory-desperate large grids (mirrors
    # nowcasts/steps.py): the scan carry holds every member's SPATIAL
    # cascade state (extrap + noise: E x k x p x m x n x 2) next to the
    # full output stack — 96 members at 1024^2 is ~13 GB of carry alone.
    # Running the whole time scan per member chunk keeps one chunk's
    # state live; chunk outputs land member-major in a donated buffer.
    state_bytes = (
        n_ens_members * n_cascade_levels * ar_order * m * n * 4 * 2
    )
    out_itemsize = 2 if output_dtype == "bfloat16" else 4
    out_bytes = n_ens_members * int_steps * m * n * out_itemsize
    outer_thr = int(
        os.environ.get("PYSTEPS_TPU_OUTER_CHUNK_BYTES", 12_500_000_000)
    )
    if (
        member_chunk
        and n_ens_members % member_chunk == 0
        and not spatial
        and subsel is None
        and state_bytes + out_bytes > outer_thr
    ):
        E = n_ens_members
        upd = jax.jit(
            lambda buf, chunk, i: jax.lax.dynamic_update_slice(
                buf,
                jnp.swapaxes(chunk, 0, 1).astype(buf.dtype),
                (i, 0, 0, 0),
            ),
            donate_argnums=0,
        )
        # slim the chunk-invariant device buffers (they stay live across
        # every chunk next to the full output stack): pre-pool the
        # per-step velocities to the coarse displacement grid (the scan
        # only ever consumes the pooled form) and store the normalized
        # NWP cascades as bf16 (they re-promote to f32 in the weighted
        # recompose; ~0.4% of a unit-variance level, re-anchored by the
        # CDF match)
        base_args = list(scan_args)
        member_keys_all = scan_args[3]
        member_model_all = scan_args[9]
        # FREE the full-resolution originals FIRST: the slimmed copies
        # below must not sit next to them (velocities 805 MB + f32 NWP
        # cascades 1.6 GB + the pre-swapaxes NWP locals ~2 GB at 2048^2
        # OOMed the target presort before anything even ran)
        del scan_args
        nwp_levels = nwp_means_all = nwp_sigmas_all = None
        precip_models_used = velocity_blend = cascades_full = None
        coarse_f = (
            4 if (max_disp is not None and m % 4 == 0 and n % 4 == 0) else 1
        )
        vel_coarse_flag = False
        if coarse_f > 1:
            vb = base_args[4]
            T_, nm_ = vb.shape[:2]
            base_args[4] = jax.jit(
                lambda v: v.reshape(
                    T_, nm_, 2, m // coarse_f, coarse_f,
                    n // coarse_f, coarse_f,
                ).mean(axis=(-3, -1))
            )(vb)
            vel_coarse_flag = True
            del vb
        base_args[5] = base_args[5].astype(jnp.bfloat16)   # nwp cascades
        # sync: the frees above only take effect once queued init work
        # drains; without this the presort dispatches against a device
        # still holding the full-resolution buffers
        base_args[5].block_until_ready()
        # sort the CDF-match targets ONCE (they are chunk-invariant; the
        # in-scan hoist would redo them per chunk)
        sorts_pre = None
        if probmatching_method == "cdf" and bool(resample_distribution):
            sorts_pre = _presort_targets(
                base_args[18], base_args[8], base_args[19]
            )
            jax.tree.map(lambda a: a.block_until_ready(), sorts_pre)
        # the 9.7 GB output stack allocates only AFTER the presort (its
        # sort workspace needs the headroom)
        out = jnp.zeros((E, int_steps, m, n), output_dtype)
        for c0 in range(0, E, member_chunk):
            args_c = list(base_args)
            args_c[3] = member_keys_all[c0 : c0 + member_chunk]
            args_c[9] = member_model_all[c0 : c0 + member_chunk]
            kwargs_c = dict(
                scan_kwargs, E=member_chunk, vel_coarse=vel_coarse_flag,
                sorts_pre=sorts_pre,
            )
            for k in ("eps_par", "eps_perp"):
                if scan_kwargs.get(k) is not None:
                    kwargs_c[k] = scan_kwargs[k][c0 : c0 + member_chunk]
            if scan_kwargs.get("ext_cascades") is not None:
                kwargs_c["ext_cascades"] = scan_kwargs["ext_cascades"][
                    :, c0 : c0 + member_chunk
                ]
            _, out_c = _blending_scan(*args_c, int_steps, **kwargs_c)
            out = upd(out, out_c, jnp.int32(c0))
            del out_c
        out.block_until_ready()
        loop_time = time.time() - t1
        if callback is not None:
            arr = np.asarray(out)
            for t in range(arr.shape[1]):
                callback(arr[:, t])
        result = out if return_output else None
        if measure_time:
            return result, init_time, loop_time
        return result

    if spatial:
        from pysteps_tpu.parallel.sharded_blending import blending_scan_sharded

        _, out = blending_scan_sharded(
            *scan_args, int_steps, mesh=mesh,
            vmax_bound=vmax + pert_margin, **scan_kwargs,
        )
    else:
        _, out = _blending_scan(*scan_args, int_steps, **scan_kwargs)
    out = jnp.swapaxes(out, 0, 1)
    if output_dtype != "float32":
        out = out.astype(output_dtype)
    # completion only — np.asarray here fetched the full (E, T, m, n)
    # stack through the ~18 MB/s tunnel (~12 s for 96x12x256^2, ~10x the
    # actual device time) inside every call
    out.block_until_ready()
    loop_time = time.time() - t1

    if subsel is not None:
        frames = []
        for t_sub in subsel:
            if t_sub == int(t_sub):
                frames.append(out[:, int(t_sub) - 1])
            else:
                t_int = int(np.ceil(t_sub))
                lo = out[:, t_int - 2] if t_int >= 2 else out[:, 0]
                hi = out[:, t_int - 1]
                w = t_sub - (t_int - 1)
                frames.append((1 - w) * lo + w * hi)
        out = jnp.stack(frames, axis=1)

    if callback is not None:
        arr = np.asarray(out)
        for t in range(arr.shape[1]):
            callback(arr[:, t])
    result = out if return_output else None
    if measure_time:
        return result, init_time, loop_time
    return result
