"""
STEPS stochastic ensemble nowcast (reference: pysteps/nowcasts/steps.py;
Bowler, Pierce & Seed 2006, Pulkkinen et al. 2019).

TPU-native redesign of the reference pipeline (call stack: SURVEY.md §3.1):

- Ensemble members are a **vmapped axis** with per-member
  ``jax.random.fold_in`` key chains (replacing the reference's seeded
  RandomState chain, steps.py:885-898) — optionally sharded over the
  ``ens`` axis of a device mesh (pure data parallelism).
- The lead-time loop is a single ``lax.scan``; each step fuses, per member:
  noise generation (batched rfft2) -> noise cascade decomposition ->
  AR(2) update over all cascade levels -> recomposition -> masking ->
  sort-based CDF matching -> velocity perturbation -> incremental
  semi-Lagrangian advection of the output field.
- Everything between the input radar stack and the (n_ens, T, m, n) output
  is one compiled XLA program; there is no host round-trip in the loop.

The public ``forecast`` keeps the reference's signature (steps.py:1273).
"""

import dataclasses
import functools
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pysteps_tpu import cascade, noise
from pysteps_tpu.cascade.decomposition import (
    decompose_core,
    decompose_spectral_core,
    recompose_core,
    recompose_spectral_core,
)
from pysteps_tpu.extrapolation.semilagrangian import (
    coarsen_velocity,
    integrate_displacement,
    integrate_displacement_coarse,
    model_warp,
    model_warp_coarse,
    upsample_planes,
)
from pysteps_tpu.noise.fftgenerators import (
    _generate_fft_noise,
    _generate_ssft_noise,
    _ssft_gen_masks,
    nonparam_filter_core as _nonparam_filter_core,
)
from pysteps_tpu.noise.motion import (
    _laplace,
    get_default_params_bps_par,
    get_default_params_bps_perp,
)
from pysteps_tpu.nowcasts import utils as nowcast_utils
from pysteps_tpu.postprocessing.probmatching import (
    prepare_cdf_matcher,
)
from pysteps_tpu.timeseries import autoregression, correlation
from pysteps_tpu.utils import tapering as tapering_utils
from pysteps_tpu.utils.check_norain import check_norain
from pysteps_tpu.utils.devconst import cached_constant


@dataclasses.dataclass(frozen=True)
class StepsNowcasterConfig:
    """Configuration (reference: steps.py:41-235 StepsNowcasterConfig)."""

    n_ens_members: int = 24
    n_cascade_levels: int = 6
    precip_threshold: Optional[float] = None
    norain_threshold: float = 0.0
    kmperpixel: Optional[float] = None
    timestep: Optional[float] = None
    extrapolation_method: str = "semilagrangian"
    decomposition_method: str = "fft"
    bandpass_filter_method: str = "gaussian"
    noise_method: Optional[str] = "nonparametric"
    noise_stddev_adj: Optional[str] = None
    ar_order: int = 2
    velocity_perturbation_method: Optional[str] = "bps"
    conditional: bool = False
    probmatching_method: Optional[str] = "cdf"
    mask_method: Optional[str] = "incremental"
    seed: Optional[int] = None
    num_workers: int = 1
    fft_method: str = "numpy"
    domain: str = "spatial"
    extrapolation_kwargs: dict = dataclasses.field(default_factory=dict)
    filter_kwargs: dict = dataclasses.field(default_factory=dict)
    noise_kwargs: dict = dataclasses.field(default_factory=dict)
    velocity_perturbation_kwargs: dict = dataclasses.field(default_factory=dict)
    mask_kwargs: dict = dataclasses.field(default_factory=dict)
    measure_time: bool = False
    callback: Optional[callable] = None
    return_output: bool = True
    member_chunk: Optional[int] = None
    mesh: Optional[object] = None  # jax.sharding.Mesh with an "ens" axis
    # dtype of the returned (E, T, m, n) stack.  "bfloat16" halves the
    # output buffer — the difference between fitting and not fitting a
    # 96-member CONUS-scale (2048^2+) forecast in one chip's 15.75 GB HBM
    # (96x12x2048^2 is 19.3 GB in f32, 9.7 GB in bf16; ~0.4% relative
    # rounding, below radar observation error).  The compute path stays
    # f32/c64 throughout — only the stored frames are rounded.
    output_dtype: str = "float32"


@functools.partial(
    jax.jit, static_argnames=("n_iter", "interp_order", "max_disp")
)
def _lagrangian_alignment(precip, velocity, n_iter=1, interp_order=1, max_disp=None):
    """Advect each of the first p input fields to the time of the last one
    (reference: steps.py:671 __perform_extrapolation; dask fan-out becomes
    a scan over the shared displacement chain)."""
    p1 = precip.shape[0]
    minval = jnp.nanmin(precip)

    def advect_i(i):
        # field i needs (p1-1-i) unit steps of advection
        def body(carry, _):
            disp = carry
            disp = integrate_displacement(
                velocity, disp, 1.0, n_iter=n_iter, max_disp=max_disp
            )
            return disp, None

        n_steps = p1 - 1 - i
        disp = jnp.zeros_like(velocity)
        if n_steps > 0:
            disp, _ = jax.lax.scan(body, disp, None, length=n_steps)
        return model_warp(
            precip[i], disp, max_disp=max_disp, interp_order=interp_order,
            cval=minval,
        )

    return jnp.stack([advect_i(i) for i in range(p1)])


@functools.partial(jax.jit, static_argnames=("ar_order", "conditional"))
def _estimate_params(
    precip_aligned, weights_2d, mask_thr, ar_order, conditional
):
    """Decompose aligned inputs, estimate per-level correlations and AR
    parameters (reference: steps.py:809-868)."""
    mask = mask_thr if conditional else None
    dec = jax.vmap(
        lambda f: decompose_core(f, weights_2d, mask=mask, normalize=True)
    )(precip_aligned)
    levels, means, stds = dec  # (p+1, k, m, n), (p+1, k), (p+1, k)
    cascades = jnp.swapaxes(levels, 0, 1)  # (k, p+1, m, n)

    # per-level temporal autocorrelation over the mask
    def level_gamma(xs):
        g = correlation.temporal_autocorrelation(xs, mask=mask_thr)
        return jnp.stack(g)

    gamma = jax.vmap(level_gamma)(cascades)  # (k, ar_order)
    if ar_order == 2:
        g2 = autoregression.adjust_lag2_corrcoef2(gamma[:, 0], gamma[:, 1])
        gamma = jnp.stack([gamma[:, 0], g2], axis=1)
    phi = autoregression.estimate_ar_params_yw(
        gamma, check_stationarity=False
    )  # (k, ar_order+1)
    return cascades, means, stds, gamma, phi


def _member_update(
    key,
    cascades_j,
    phi,
    noise_filt,
    noise_filt_shape,
    use_full_fft,
    weights_2d,
    noise_std_coeffs,
    means_last,
    stds_last,
    cfg_flags,
):
    """One member's cascade update: noise -> AR -> recompose.

    cascades_j: tuple of p (k, m, n) spatial cascades (oldest first), or
    complex (k, m, n//2+1) spectral cascades (reference: steps.py:122-126
    domain="spectral").  The spectral path keeps the AR state in rfft2
    half-planes: noise decomposition is a broadcast multiply (no per-level
    inverse FFTs) and only the recomposed output comes back through one
    irfft2 — 2 FFTs per member-step instead of k+1.

    Carrying the AR window as a tuple of lags makes the per-step shift a
    carry re-binding instead of ``concatenate`` — the reference's
    np.roll-style window copy costs an extra read+write of the whole
    cascade state per member-step on TPU (HBM-bound op).
    """
    has_noise = cfg_flags["noise"]
    spectral = cfg_flags.get("spectral", False)
    packed = cfg_flags.get("packed", False)
    shape = cfg_flags.get("shape", noise_filt_shape)
    ssft_masks = cfg_flags.get("ssft_masks", None)
    if has_noise:
        if ssft_masks is not None:
            # SSFT / nested localized noise (reference: steps.py accepts any
            # registered noise_method; fftgenerators.py:735-850): spatial
            # composite of per-window filtered noise, then decompose
            eps = _generate_ssft_noise(
                key, noise_filt, ssft_masks, noise_filt_shape
            )
            if spectral:
                eps_levels, _, _ = decompose_spectral_core(
                    jnp.fft.rfft2(eps), weights_2d, shape, normalize=True
                )
            else:
                eps_levels, _, _ = decompose_core(
                    eps, weights_2d, normalize=True
                )
        elif spectral:
            # standardize=False: the per-level normalization right below
            # cancels any linear pre-scaling (fftgenerators.py)
            eps_fft = _generate_fft_noise(
                key, noise_filt, noise_filt_shape, use_full_fft,
                domain="spectral", standardize=False, packed=packed,
            )
            eps_levels, _, _ = decompose_spectral_core(
                eps_fft, weights_2d, shape, normalize=True, packed=packed
            )
        else:
            eps = _generate_fft_noise(
                key, noise_filt, noise_filt_shape, use_full_fft,
                standardize=False,
            )
            eps_levels, _, _ = decompose_core(eps, weights_2d, normalize=True)
        eps_levels = eps_levels * noise_std_coeffs[:, None, None]
    else:
        eps_levels = None
    cascades_j = _ar_step_lags(cascades_j, phi, eps=eps_levels)
    if spectral:
        field = recompose_spectral_core(
            cascades_j[-1], means_last, stds_last, shape, packed=packed
        )
    else:
        field = recompose_core(cascades_j[-1], means_last, stds_last)
    return cascades_j, field


def _chain_available(probmatching, interp_order, max_disp, shape):
    """Whether the fused match+rim+warp chain (ops/pallas_chain.py) can
    serve this configuration.  Evaluated OUTSIDE the jitted scan so the
    result participates in the jit cache key (PYSTEPS_TPU_NO_CHAIN flips
    it without stale-executable reuse)."""
    try:
        from pysteps_tpu.ops import pallas_chain
        from pysteps_tpu.ops.warp import _use_pallas

        return bool(
            probmatching == "cdf"
            and interp_order == 1
            and max_disp is not None
            and pallas_chain.supported(shape)
            and _use_pallas()
            and not os.environ.get("PYSTEPS_TPU_NO_CHAIN")
        )
    except Exception:  # noqa: BLE001 — Mosaic unavailable: XLA fallback
        return False


def _ar_step_lags(lags, phi, eps=None):
    """AR(p) step on a tuple of lag arrays (oldest first) — the copy-free
    carry form of ``autoregression.iterate_ar_model``."""
    p = len(lags)
    x_new = lags[p - 1] * phi[:, 0, None, None]
    for i in range(p - 1):
        x_new = x_new + lags[i] * phi[:, p - 1 - i, None, None]
    if eps is not None:
        x_new = x_new + phi[:, p, None, None] * eps
    return lags[1:] + (x_new,)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=(
        "phi", "gamma", "means", "stds", "war", "mu_0", "velocity_unit",
        "velocity_perp", "precip_min", "precip_last", "noise_filter",
    ),
    meta_fields=(),
)
@dataclasses.dataclass
class StepsNowcasterParams:
    """Quantities derived at initialization and fixed over the forecast
    loop (reference: steps.py:238-263).  A JAX pytree: crosses jit
    boundaries as-is."""

    phi: jnp.ndarray            # (k, p+1) AR parameters per cascade level
    gamma: jnp.ndarray          # (k, p) temporal autocorrelations
    means: jnp.ndarray          # (k,) cascade means of the last input
    stds: jnp.ndarray           # (k,) cascade stds of the last input
    war: jnp.ndarray            # wet-area ratio of the last input
    mu_0: jnp.ndarray           # mean rain rate over wet pixels
    velocity_unit: jnp.ndarray  # (2, m, n) unit flow (BPS parallel axis)
    velocity_perp: jnp.ndarray  # (2, m, n) perpendicular axis
    precip_min: jnp.ndarray     # domain minimum (fill value)
    precip_last: jnp.ndarray    # (m, n) last observed field
    noise_filter: jnp.ndarray   # (m, n//2+1) nonparametric |FFT| filter


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=(
        "window", "precip_mask", "member_keys", "eps_par", "eps_perp",
    ),
    meta_fields=(),
)
@dataclasses.dataclass
class StepsNowcasterState:
    """Per-member evolving state of the forecast loop
    (reference: steps.py:265-285).  The reference mutates lists in dask
    workers; here this pytree is the (functional) scan carry seed."""

    window: jnp.ndarray       # (k, p, m, n) recent cascade states
    precip_mask: jnp.ndarray  # (m, n) rain mask (float)
    member_keys: jnp.ndarray  # (E,) folded PRNG keys (RandomState chain analog)
    eps_par: jnp.ndarray      # (E,) BPS parallel perturbation draws
    eps_perp: jnp.ndarray     # (E,) BPS perpendicular perturbation draws


class StepsNowcaster:
    """Host orchestration around the jitted STEPS core
    (reference: steps.py:287)."""

    def __init__(self, precip, velocity, timesteps, steps_config):
        # device-resident inputs stay on device: the radar fields feed the
        # jitted pipeline directly, and the host-side gating scalars are
        # computed by one tiny jit (_device_input_stats) instead of
        # round-tripping megabytes through np.asarray (the axon tunnel
        # moves ~18 MB/s, so a 512^2 sequence costs ~0.3 s per bounce)
        self._device_input = isinstance(precip, jax.Array)
        self.precip = precip if self._device_input else np.asarray(precip)
        self.velocity = velocity if isinstance(velocity, jax.Array) else np.asarray(velocity)
        self.timesteps = timesteps
        self.config = steps_config

    def compute_forecast(self):
        cfg = self.config
        t0 = time.time()
        self._check_inputs()
        win_fun = cfg.noise_kwargs.get("win_fun", "tukey")

        if self._device_input:
            m, n = self.precip.shape[-2:]
            taper = cached_constant(
                ("norain_taper", m, n, win_fun),
                lambda: np.asarray(
                    tapering_utils.compute_window_function(m, n, win_fun)
                    if win_fun is not None
                    else np.ones((m, n)),
                    np.float32,
                ),
            )
            thr = np.float32(
                cfg.precip_threshold
                if cfg.precip_threshold is not None
                else np.nan
            )
            rain_frac_d, precip, domain_mask, vmax_d = _device_input_stats(
                self.precip,
                jnp.asarray(self.velocity, jnp.float32),
                taper,
                thr,
                ar_order=cfg.ar_order,
            )
            # when the displacement bounds are data-independent (TPU,
            # large grid — see _steps_forecast), the whole pipeline can be
            # dispatched before the gate value arrives: the norain branch
            # is resolved after the (speculative) forecast, hiding the
            # stats round trip behind useful work
            speculate = (
                jax.default_backend() != "cpu" and min(m, n) >= 3 * 48
            )
            if speculate:
                velocity = jnp.asarray(self.velocity, jnp.float32)
                out, init_time, loop_time = _steps_forecast(
                    precip, velocity, self.timesteps, cfg, domain_mask
                )
                rain_frac = float(rain_frac_d)
                print(
                    f"Rain fraction is: {rain_frac}, while minimum "
                    f"fraction is {cfg.norain_threshold}"
                )
                if rain_frac <= cfg.norain_threshold:
                    return nowcast_utils.zero_precipitation_forecast(
                        cfg.n_ens_members,
                        self.timesteps,
                        np.asarray(self.precip),
                        cfg.callback,
                        cfg.return_output,
                        cfg.measure_time,
                        t0,
                    )
                return self._finalize(out, init_time, loop_time)
            rain_frac, vmax = jax.device_get((rain_frac_d, vmax_d))
            print(
                f"Rain fraction is: {rain_frac}, while minimum fraction is "
                f"{cfg.norain_threshold}"
            )
            norain = bool(rain_frac <= cfg.norain_threshold)
        else:
            # norain early exit (reference: steps.py:360-382)
            norain = check_norain(
                self.precip,
                cfg.precip_threshold,
                cfg.norain_threshold,
                win_fun,
                printmsg=True,
            )
        if norain:
            return nowcast_utils.zero_precipitation_forecast(
                cfg.n_ens_members,
                self.timesteps,
                np.asarray(self.precip),
                cfg.callback,
                cfg.return_output,
                cfg.measure_time,
                t0,
            )

        if self._device_input:
            velocity = jnp.asarray(self.velocity, jnp.float32)
        else:
            precip_np = self.precip[-(cfg.ar_order + 1) :].astype(np.float32)
            domain_mask = ~np.isfinite(precip_np[-1])
            precip_min = float(np.nanmin(precip_np))
            precip_np = np.where(np.isfinite(precip_np), precip_np, precip_min)
            precip = jnp.asarray(precip_np)
            velocity = jnp.asarray(self.velocity, jnp.float32)
            domain_mask = jnp.asarray(domain_mask)
            vmax = None

        out, init_time, loop_time = _steps_forecast(
            precip,
            velocity,
            self.timesteps,
            cfg,
            domain_mask,
            vmax=vmax,
        )
        return self._finalize(out, init_time, loop_time)

    def _finalize(self, out, init_time, loop_time):
        cfg = self.config
        if cfg.callback is not None and out is not None:
            arr = np.asarray(out)
            for t in range(arr.shape[1]):
                cfg.callback(arr[:, t])

        result = out if cfg.return_output else None
        if cfg.measure_time:
            return result, init_time, loop_time
        return result

    def _check_inputs(self):
        cfg = self.config
        if self.precip.ndim != 3:
            raise ValueError("precip must be a three-dimensional array")
        if self.precip.shape[0] < cfg.ar_order + 1:
            raise ValueError(
                f"precip.shape[0] must be at least ar_order+1 "
                f"({cfg.ar_order + 1}), got {self.precip.shape[0]}"
            )
        if self.velocity.ndim != 3:
            raise ValueError("velocity must be a three-dimensional array")
        if self.precip.shape[1:] != self.velocity.shape[1:]:
            raise ValueError("dimension mismatch between precip and velocity")
        if isinstance(self.timesteps, list) and not sorted(self.timesteps) == list(
            self.timesteps
        ):
            raise ValueError("timesteps is not in ascending order")
        if cfg.conditional and cfg.precip_threshold is None:
            raise ValueError("conditional=True but precip_threshold is not set")
        if cfg.mask_method is not None and cfg.precip_threshold is None:
            raise ValueError(
                f"mask_method={cfg.mask_method} but precip_threshold is not set"
            )
        if cfg.noise_stddev_adj == "auto" and cfg.precip_threshold is None:
            raise ValueError("noise_stddev_adj='auto' but precip_threshold not set")
        if cfg.noise_stddev_adj not in ("auto", "fixed", None):
            raise ValueError(
                f"unknown noise_stddev_adj {cfg.noise_stddev_adj}"
            )
        if cfg.velocity_perturbation_method is not None:
            if cfg.kmperpixel is None:
                raise ValueError("vel_pert_method is set but kmperpixel=None")
            if cfg.timestep is None:
                raise ValueError("vel_pert_method is set but timestep=None")


@functools.partial(jax.jit, static_argnames=("ar_order",))
def _device_input_stats(precip_all, velocity, taper, thr_or_nan, ar_order):
    """Host-gating scalars + input sanitization for device-resident inputs,
    fused into one dispatch: tapered rain fraction (the check_norain gate,
    utils/check_norain.py), the sanitized (ar_order+1)-frame window, the
    NaN domain mask, and max |velocity| (static displacement bound)."""
    masked = jnp.where(taper == 0.0, jnp.nanmin(precip_all), precip_all)
    thr = jnp.where(jnp.isnan(thr_or_nan), jnp.nanmin(masked), thr_or_nan)
    rain_frac = jnp.mean(masked > thr)
    precip = precip_all[-(ar_order + 1) :].astype(jnp.float32)
    precip_min = jnp.nanmin(precip)
    domain_mask = ~jnp.isfinite(precip[-1])
    precip = jnp.where(jnp.isfinite(precip), precip, precip_min)
    vmax = jnp.max(jnp.abs(velocity))
    return rain_frac, precip, domain_mask, vmax


def _steps_forecast(precip, velocity, timesteps, cfg, domain_mask, vmax=None):
    """Initialization + scan loop.  Returns (out (E,T,m,n), init_s, loop_s)."""
    t_init0 = time.time()
    m, n = precip.shape[1:]
    p = cfg.ar_order
    E = cfg.n_ens_members
    k_levels = cfg.n_cascade_levels

    # integer-step schedule; list timesteps are handled by computing to the
    # integer grid then selecting/interpolating (reference: binned_timesteps)
    if isinstance(timesteps, int):
        int_steps = timesteps
        subsel = None
    else:
        ts = list(timesteps)
        int_steps = int(np.ceil(max(ts)))
        subsel = ts

    # bandpass filter (static)
    filter_method = cascade.get_method(cfg.bandpass_filter_method)
    bp_filter = filter_method((m, n), k_levels, **cfg.filter_kwargs)
    weights_2d = bp_filter["weights_2d"].astype(jnp.float32)

    base_key = jax.random.PRNGKey(cfg.seed if cfg.seed is not None else 42)
    key_noise_init, key_members, key_vel = jax.random.split(base_key, 3)

    extrap_kwargs = dict(cfg.extrapolation_kwargs)
    n_iter = extrap_kwargs.get("n_iter", 1)
    interp_order = extrap_kwargs.get("interp_order", 1)

    vel_pert = cfg.velocity_perturbation_method is not None
    if vel_pert:
        vp_kwargs = dict(cfg.velocity_perturbation_kwargs)
        p_par = tuple(float(v) for v in vp_kwargs.get("p_par", get_default_params_bps_par()))
        p_perp = tuple(float(v) for v in vp_kwargs.get("p_perp", get_default_params_bps_perp()))
        vsf = 60.0 / (cfg.timestep * (1.0 / cfg.kmperpixel))
    else:
        p_par = p_perp = None
        vsf = 1.0

    mask_rim = None
    struct_radius = 1
    if cfg.mask_method == "incremental":
        mask_rim = int(cfg.mask_kwargs.get("mask_rim", 10))
        mask_f = cfg.mask_kwargs.get("mask_f", 1.0)
        # structuring element scaled by the per-step motion extent
        # (reference: steps.py mask init, iterate_structure(struct, n))
        if cfg.timestep is not None and cfg.kmperpixel is not None:
            n_struct = mask_f * cfg.timestep / cfg.kmperpixel
        else:
            n_struct = 3.0
        struct_radius = max(int((n_struct - 1) / 2.0), 1)

    precip_thr_f = jnp.float32(
        cfg.precip_threshold if cfg.precip_threshold is not None else 0.0
    )

    # static displacement bounds enable the shift-decomposition warp in
    # place of XLA's scalar gather (the dominant cost of the scan on TPU;
    # on CPU the gather is fast and the unrolled shifts only slow compile)
    on_cpu = jax.default_backend() == "cpu"
    if not on_cpu and min(m, n) >= 3 * 48:
        # grids where the 48-px cap always beats the exact-gather rule: the
        # bounds are data-INDEPENDENT (for any vmax the old formula lands on
        # min(vmax-derived, 48) and the Pallas resample's data-dependent
        # chunk loop makes an over-sized static bound cost nothing), so one
        # executable serves every storm and the caller never has to fetch
        # max|velocity| before dispatching
        max_disp_align = 48
        max_disp_scan = 48
    else:
        if vmax is None:
            vmax = (
                float(np.max(np.abs(np.asarray(velocity))))
                if velocity.size
                else 0.0
            )
        else:
            vmax = float(vmax)
        if vel_pert:
            # 4-sigma Laplace margin on the BPS perturbation at the last
            # lead time
            t_last = int_steps * (cfg.timestep or 1.0)
            g_par = abs(p_par[0] * t_last ** p_par[1] + p_par[2])
            g_perp = abs(p_perp[0] * t_last ** p_perp[1] + p_perp[2])
            pert_margin = 4.0 * max(g_par, g_perp) / max(vsf, 1e-6)
        else:
            pert_margin = 0.0
        max_disp_align = max(int(np.ceil(p * (vmax + 1.0))) + 1, 2)
        max_disp_scan = max(
            int(np.ceil(int_steps * (vmax + pert_margin))) + 2, max_disp_align
        )
        # the in-graph index clip makes larger displacements clamp
        # gracefully, so cap the shift window at a cost-effective bound
        max_disp_scan = min(max_disp_scan, 48)
        # the shift decomposition costs O(max_disp) fused ops; beyond ~a
        # third of the domain the exact gather is no slower
        if max_disp_scan > min(m, n) // 3:
            max_disp_scan = None
        if on_cpu:
            max_disp_align = None
            max_disp_scan = None

    # nonparametric noise filter is computed inside the init jit (no host
    # round-trip of the aligned fields); parametric needs host curve_fit;
    # ssft/nested build their per-window filter stacks host-side at init
    # and generate in-scan via _generate_ssft_noise
    if cfg.noise_method is not None and cfg.noise_method not in (
        "nonparametric", "parametric", "ssft", "nested"
    ):
        raise ValueError(f"unknown noise_method {cfg.noise_method}")
    noise_in_graph = cfg.noise_method == "nonparametric"
    if noise_in_graph:
        win_fun = cfg.noise_kwargs.get("win_fun", "tukey")
        taper = cached_constant(
            ("steps_taper", m, n, win_fun),
            lambda: np.asarray(
                tapering_utils.compute_window_function(m, n, win_fun)
                if win_fun is not None
                else np.ones((m, n)),
                np.float32,
            ),
        )
    else:
        taper = cached_constant(
            ("steps_taper", m, n, None), lambda: np.ones((m, n), np.float32)
        )

    # one fused init program: Lagrangian alignment, cascade decomposition,
    # AR estimation, masks, velocity-perturbation draws, member keys,
    # and (for the nonparametric method) the noise filter
    precip_aligned, params, state = _steps_init(
        precip, velocity, weights_2d, key_members, key_vel, precip_thr_f,
        taper,
        E=E, ar_order=p, conditional=cfg.conditional,
        mask_method=cfg.mask_method, struct_radius=struct_radius,
        mask_rim=mask_rim if mask_rim is not None else 0,
        vel_pert=vel_pert, n_iter=n_iter, interp_order=interp_order,
        noise_in_graph=noise_in_graph, max_disp=max_disp_align,
    )

    use_full_fft = False
    noise_filt = None
    ssft_masks = None
    noise_std_coeffs = jnp.ones(k_levels, jnp.float32)
    if cfg.noise_method is not None:
        if noise_in_graph:
            noise_filt = params.noise_filter
            pert_gen = {
                "field": noise_filt,
                "input_shape": (m, n),
                "use_full_fft": False,
            }
        else:
            init_noise, _ = noise.get_method(cfg.noise_method)
            # parametric: pass the DEVICE array — the filter init computes
            # its radial spectrum on device and fetches only ~L/2 floats
            # (np.asarray here cost a full D2H of the aligned stack plus a
            # field-sized filter H2D, ~0.4 s of per-call fixed cost)
            noise_src = (
                precip_aligned
                if cfg.noise_method == "parametric"
                else np.asarray(precip_aligned)
            )
            pert_gen = init_noise(noise_src, **cfg.noise_kwargs)
            noise_filt = jnp.asarray(pert_gen["field"], jnp.float32)
            use_full_fft = bool(pert_gen.get("use_full_fft", False))
            if (
                cfg.domain == "spectral"
                and use_full_fft
                and noise_filt.ndim == 2
            ):
                # the spectral AR path works in rfft2 half-planes; a
                # full-fft filter magnitude is Hermitian-symmetric
                # (parametric: radial power law; nonparametric: |FFT| of a
                # real field), so its left half IS the rfft filter
                noise_filt = noise_filt[:, : n // 2 + 1]
                use_full_fft = False
            if noise_filt.ndim == 4:  # ssft / nested (wy, wx, m, n) stack
                ssft_masks = jnp.asarray(
                    _ssft_gen_masks(
                        noise_filt.shape,
                        (m, n),
                        pert_gen.get("overlap_gen", 0.2),
                        pert_gen.get("win_fun", "tukey"),
                    ),
                    jnp.float32,
                )
        if cfg.noise_stddev_adj == "auto":
            noise_std_coeffs = noise.utils.compute_noise_stddev_adjs(
                precip[-1],
                cfg.precip_threshold,
                float(params.precip_min),
                bp_filter,
                None,
                pert_gen,
                None,
                20,
                conditional=True,
                key=key_noise_init,
            ).astype(jnp.float32)
        elif cfg.noise_stddev_adj == "fixed":
            noise_std_coeffs = jnp.asarray(
                [1.0 / (0.75 + 0.09 * k) for k in range(1, k_levels + 1)],
                jnp.float32,
            )

    cfg_static = dict(
        noise=cfg.noise_method is not None,
        mask_method=cfg.mask_method,
        probmatching=cfg.probmatching_method,
        domain=cfg.domain,
        vel_pert=vel_pert,
        timestep_min=float(cfg.timestep) if cfg.timestep else 1.0,
        mask_rim=mask_rim,
        struct_radius=struct_radius,
        n_iter=n_iter,
        interp_order=interp_order,
        need_det=cfg.noise_method is None or cfg.mask_method == "sprog",
        out_dtype=cfg.output_dtype,
        E=E,
        member_chunk=(
            cfg.member_chunk
            if cfg.member_chunk and E % cfg.member_chunk == 0
            else None
        ),
        max_disp=max_disp_scan,
        use_chain=_chain_available(
            cfg.probmatching_method, interp_order, max_disp_scan, (m, n)
        ),
    )

    # multi-chip: shard the member axis over the mesh's "ens" axis; the
    # scan is pure data parallelism over members, so XLA partitions the
    # whole program without inserting collectives
    if cfg.mesh is not None:
        from pysteps_tpu.parallel import ens_sharding

        sh = ens_sharding(cfg.mesh)
        state = dataclasses.replace(
            state,
            member_keys=jax.device_put(state.member_keys, sh),
            eps_par=jax.device_put(state.eps_par, sh),
            eps_perp=jax.device_put(state.eps_perp, sh),
        )

    init_time = time.time() - t_init0
    t_loop0 = time.time()

    scan_args = (
        state.window,
        state.precip_mask,
        state.member_keys,
        velocity,
        params.phi,
        noise_filt,
        ssft_masks,
        (m, n),
        use_full_fft,
        weights_2d,
        noise_std_coeffs,
        params.means,
        params.stds,
        params.precip_last,
        params.precip_min,
        precip_thr_f,
        params.war,
        params.mu_0,
        domain_mask,
        state.eps_par, state.eps_perp,
        params.velocity_unit, params.velocity_perp,
        jnp.float32(vsf),
        p_par, p_perp,
    )

    if cfg.callback is not None and not cfg.return_output and subsel is None:
        # incremental memory contract (reference: steps.py:196-206 +
        # nowcasts/utils.py:265-533): scan the lead times in chunks,
        # stream each chunk to the host callback, and drop it — peak
        # device memory stays O(E * t_chunk * m * n) instead of O(E*T*m*n)
        # chunk of 6 = the scan's max unroll group, so a short forecast's
        # first chunk compiles to the same executable as the full run
        t_chunk = min(6, int_steps)
        carry = None
        t_done = 0
        while t_done < int_steps:
            tc = min(t_chunk, int_steps - t_done)
            carry, out_c = _steps_scan(
                *scan_args, tc, t_offset=t_done, carry_init=carry,
                **cfg_static,
            )
            arr = np.asarray(out_c)  # (E, tc, m, n), fetched then dropped
            del out_c
            for ti in range(tc):
                cfg.callback(arr[:, ti])
            t_done += tc
        loop_time = time.time() - t_loop0
        return None, init_time, loop_time

    # Outer member-chunking for memory-desperate configs: the in-scan
    # lax.map chunking bounds per-step TRANSIENTS but the scan carry
    # still holds every member's spectral state (96 x 8 levels x 2 lags
    # at 1024^2 is 6.5 GB) next to the full output buffer (4.8 GB).
    # Running the WHOLE time scan per member chunk keeps only one
    # chunk's state + transients live; the chunk outputs land in a
    # donated preallocated (E, T, m, n) buffer.  Costs n_chunks
    # dispatches (~50 ms each over the tunnel), so it only switches on
    # when state + output actually threaten HBM.
    mc = cfg_static["member_chunk"]
    halfn = n // 2 + 1
    state_bytes = (
        E * k_levels * cfg.ar_order * m
        * (halfn * 8 if cfg.domain == "spectral" else n * 4)
    ) * 2  # x2: noise cascade carries the same shape
    out_itemsize = 2 if cfg.output_dtype == "bfloat16" else 4
    out_bytes = E * int_steps * m * n * out_itemsize
    # 12.5 GB: 96x1024^2 spectral (state 6.45 + out 4.8 = 11.25 GB) runs
    # UNCHUNKED with in-scan member_chunk=12 transient bounding — measured
    # 377 vs 303 mf/s for the outer-chunked path (r4); 96x2048^2 (61 GB)
    # still switches to outer chunking
    outer_thr = int(
        os.environ.get("PYSTEPS_TPU_OUTER_CHUNK_BYTES", 12_500_000_000)
    )
    if mc and state_bytes + out_bytes > outer_thr:
        out = jnp.zeros((E, int_steps, m, n), cfg.output_dtype)
        upd = jax.jit(
            lambda buf, chunk, i: jax.lax.dynamic_update_slice(
                buf, chunk, (i, 0, 0, 0)
            ),
            donate_argnums=0,
        )
        from pysteps_tpu import tuning as _tuning

        chunk_static = dict(
            cfg_static, E=mc,
            member_chunk=_tuning.inner_chunk_for_outer(m, n, mc),
        )
        for c0 in range(0, E, mc):
            args_c = list(scan_args)
            for mi in _scan_member_idx():  # member_keys, eps_par, eps_perp
                args_c[mi] = scan_args[mi][c0 : c0 + mc]
            _, out_c = _steps_scan(*args_c, int_steps, **chunk_static)
            out = upd(out, out_c, jnp.int32(c0))
            del out_c
    elif (
        cfg.mesh is not None
        and int(cfg.mesh.shape.get("ens", 1)) > 1
        and E % int(cfg.mesh.shape.get("ens", 1)) == 0
    ):
        # manual SPMD over "ens": each device scans its LOCAL members
        # only.  Letting GSPMD partition the batched program instead
        # inserts an all-gather of the WHOLE member batch before every
        # FFT op (observed in the dumped after-optimizations HLO on the
        # CPU mesh; the XLA-FFT fallback at 2048^2+ hits the same) —
        # every device then transforms the full ensemble redundantly.
        # shard_map is collective-free by construction here because the
        # scan touches members independently.
        ens_n = int(cfg.mesh.shape["ens"])
        E_loc = E // ens_n
        mc = cfg_static["member_chunk"]
        cfg_local = dict(
            cfg_static,
            E=E_loc,
            member_chunk=(
                mc if mc and mc < E_loc and E_loc % mc == 0 else None
            ),
        )
        out = _steps_scan_ens_sharded(
            cfg.mesh, scan_args, int_steps, cfg_local
        )
    else:
        _, out = _steps_scan(*scan_args, int_steps, **cfg_static)
    # already member-major (E, T, m, n): the scan writes into a single
    # carried buffer, so no transpose pass (or its extra copy) is needed
    out.block_until_ready()
    loop_time = time.time() - t_loop0

    if subsel is not None:
        # select/interpolate requested lead times from the integer grid;
        # fractional times interpolate linearly between neighbours
        frames = []
        arr = out
        for t_sub in subsel:
            t_int = int(np.ceil(t_sub))
            frac = t_sub - (t_int - 1) - 1.0
            if t_sub == int(t_sub):
                frames.append(arr[:, int(t_sub) - 1])
            else:
                lo = arr[:, t_int - 2] if t_int >= 2 else arr[:, 0]
                hi = arr[:, t_int - 1]
                w = t_sub - (t_int - 1)
                frames.append((1 - w) * lo + w * hi)
        out = jnp.stack(frames, axis=1)

    return out, init_time, loop_time


@functools.partial(
    jax.jit,
    static_argnames=(
        "E", "ar_order", "conditional", "mask_method", "struct_radius",
        "mask_rim", "vel_pert", "n_iter", "interp_order", "noise_in_graph",
        "max_disp",
    ),
)
def _steps_init(
    precip, velocity, weights_2d, key_members, key_vel, precip_thr, taper,
    E, ar_order, conditional, mask_method, struct_radius, mask_rim,
    vel_pert, n_iter, interp_order, noise_in_graph=False, max_disp=None,
):
    """Fused STEPS initialization: alignment, decomposition, AR estimation,
    masks, velocity-perturbation draws, per-member keys — one XLA program
    (the reference spreads this over steps.py:625-1000 with dask threads)."""
    m, n = precip.shape[1:]
    if conditional:
        mask_thr = jnp.all(precip >= precip_thr, axis=0)
    else:
        mask_thr = jnp.ones((m, n), dtype=bool)

    precip_aligned = _lagrangian_alignment(
        precip, velocity, n_iter=n_iter, interp_order=interp_order,
        max_disp=max_disp,
    )
    cascades_full, means, stds, gamma, phi = _estimate_params(
        precip_aligned, weights_2d, mask_thr, ar_order, conditional
    )
    means_last, stds_last = means[-1], stds[-1]
    window = cascades_full[:, -ar_order:]  # (k, p, m, n)

    precip_last = precip[-1]
    precip_min = jnp.min(precip)
    wet = precip_last >= precip_thr
    war = jnp.sum(wet & mask_thr) / jnp.maximum(jnp.sum(mask_thr), 1)
    mu_0 = jnp.sum(jnp.where(wet, precip_last, 0.0)) / jnp.maximum(jnp.sum(wet), 1)

    if mask_method == "incremental":
        mask_prec_init = nowcast_utils.compute_dilated_mask(
            wet, struct_radius, mask_rim
        ).astype(jnp.float32)
    elif mask_method == "obs":
        mask_prec_init = wet.astype(jnp.float32)
    else:
        mask_prec_init = jnp.ones((m, n), jnp.float32)

    member_keys = jax.vmap(lambda i: jax.random.fold_in(key_members, i))(
        jnp.arange(E)
    )

    if vel_pert:
        vkeys = jax.random.split(key_vel, 2 * E)
        eps_par = jax.vmap(_laplace)(vkeys[:E])
        eps_perp = jax.vmap(_laplace)(vkeys[E:])
        Nv = jnp.linalg.norm(velocity, axis=0)
        V_n = jnp.where(
            Nv[None] > 1e-12, velocity / jnp.maximum(Nv[None], 1e-12), 0.0
        )
        V_perp = jnp.stack([-V_n[1], V_n[0]])
    else:
        eps_par = jnp.zeros(E)
        eps_perp = jnp.zeros(E)
        V_n = jnp.zeros_like(velocity)
        V_perp = jnp.zeros_like(velocity)

    if noise_in_graph:
        # nonparametric noise filter over the aligned inputs
        # (reference: noise/fftgenerators.py:221-328)
        noise_filt = _nonparam_filter_core(precip_aligned, taper)
    else:
        noise_filt = jnp.zeros((m, n // 2 + 1), jnp.float32)

    params = StepsNowcasterParams(
        phi=phi, gamma=gamma, means=means_last, stds=stds_last, war=war,
        mu_0=mu_0, velocity_unit=V_n, velocity_perp=V_perp,
        precip_min=precip_min, precip_last=precip_last, noise_filter=noise_filt,
    )
    state = StepsNowcasterState(
        window=window, precip_mask=mask_prec_init, member_keys=member_keys,
        eps_par=eps_par, eps_perp=eps_perp,
    )
    return precip_aligned, params, state


# member-axis inputs of _steps_scan (the only ones sharded over "ens"
# or sliced by the outer member-chunk path); positions are derived from
# the function signature in _scan_member_idx() so they cannot drift
_SCAN_MEMBER_ARGS = ("member_keys", "eps_par", "eps_perp")
_sharded_scan_cache = {}


@functools.lru_cache(maxsize=1)
def _scan_member_idx():
    import inspect

    params = tuple(inspect.signature(_steps_scan).parameters)
    return tuple(params.index(name) for name in _SCAN_MEMBER_ARGS)


def _steps_scan_ens_sharded(mesh, scan_args, int_steps, cfg_local):
    """Cached jit(shard_map) over the member axis: each device scans its
    LOCAL members only.  Letting GSPMD partition the batched program
    instead inserts an all-gather of the WHOLE member batch before every
    FFT op (observed in the dumped after-optimizations HLO on the CPU
    mesh; the XLA-FFT fallback at 2048^2+ hits the same), making every
    device transform the full ensemble redundantly.  The wrapper is
    cached per (mesh, statics) — a fresh jit(shard_map(closure)) per
    call would retrace every forecast; and eager (un-jitted) shard_map
    executes shard programs SEQUENTIALLY (measured 3x slower)."""
    from jax.sharding import PartitionSpec as SP

    member_idx = _scan_member_idx()
    is_arr = [
        isinstance(v, (jax.Array, np.ndarray)) and i not in member_idx
        for i, v in enumerate(scan_args)
    ]
    arr_idx = tuple(i for i, a in enumerate(is_arr) if a)
    statics = tuple(
        (i, v)
        for i, v in enumerate(scan_args)
        if not is_arr[i] and i not in member_idx
    )
    key = (mesh, int_steps, statics, tuple(sorted(cfg_local.items())), arr_idx)
    fn = _sharded_scan_cache.get(key)
    if fn is None:
        n_args = len(scan_args)

        def _scan_local(reps, member_locals):
            a = [None] * n_args
            for i, v in zip(arr_idx, reps):
                a[i] = v
            for i, v in statics:
                a[i] = v
            for i, v in zip(member_idx, member_locals):
                a[i] = v
            _, out_l = _steps_scan(*a, int_steps, **cfg_local)
            return out_l

        fn = jax.jit(
            jax.shard_map(
                _scan_local, mesh=mesh,
                in_specs=(
                    tuple(SP() for _ in arr_idx),
                    tuple(SP("ens") for _ in member_idx),
                ),
                out_specs=SP("ens"),
                check_vma=False,
            )
        )
        _sharded_scan_cache[key] = fn
    return fn(
        tuple(scan_args[i] for i in arr_idx),
        tuple(scan_args[i] for i in member_idx),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "noise_filt_shape", "use_full_fft", "int_steps", "noise", "mask_method",
        "probmatching", "domain", "vel_pert", "timestep_min", "mask_rim",
        "struct_radius", "n_iter", "interp_order", "p_par", "p_perp",
        "need_det", "out_dtype", "E", "member_chunk", "max_disp",
        # static so the streaming chunked path (which passes it) compiles
        # the SAME program as the full run (which leaves the default) —
        # a traced-vs-folded scalar changed fusion enough to break the
        # bitwise streaming == full contract at unroll 6
        "t_offset",
        "use_chain",
    ),
)
def _steps_scan(
    window, mask_prec_init, member_keys, velocity, phi,
    noise_filt, ssft_masks, noise_filt_shape, use_full_fft, weights_2d,
    noise_std_coeffs,
    means_last, stds_last, precip_last, precip_min, precip_thr, war, mu_0,
    domain_mask, eps_par, eps_perp, V_n, V_perp, vsf, p_par, p_perp,
    int_steps, noise, mask_method, probmatching, domain, vel_pert,
    timestep_min, mask_rim, struct_radius, n_iter, interp_order, need_det, E,
    out_dtype="float32", member_chunk=None, max_disp=None, t_offset=0,
    carry_init=None, use_chain=False,
):
    m, n = precip_last.shape
    spectral = domain == "spectral"
    # packed Hermitian layout (ops/packfft): the spectral state drops from
    # n//2+1 to n//2 lane columns — at 512^2 that is 2 lane tiles instead
    # of 3, ~33% of the dominant HBM traffic (PERFORMANCE.md roofline #1).
    # SSFT noise generates spatially and re-transforms per step, so it
    # stays on the unpacked path.
    from pysteps_tpu.ops import packfft

    packed = (
        spectral
        and ssft_masks is None
        and not use_full_fft
        and packfft.enabled(n)
    )
    cfg_flags = {
        "noise": noise, "spectral": spectral, "shape": (m, n),
        "ssft_masks": ssft_masks, "packed": packed,
    }

    if spectral:
        # lift the normalized spatial window into rfft2 half-planes once;
        # the AR state then stays spectral for the whole scan
        window = jnp.fft.rfft2(window)
        if packed:
            window = packfft.pack(window)
    # AR window as a tuple of lags: the per-step shift becomes a carry
    # re-binding instead of a whole-state concatenate copy
    ar_order = window.shape[1]
    lags0 = tuple(window[:, i] for i in range(ar_order))
    # optional bf16 AR-state carry (PYSTEPS_TPU_BF16_STATE=1): the lag
    # arrays dominate the scan's HBM traffic (roofline: the pipeline is
    # memory-bound); storing them as split-bf16 halves those bytes.  The
    # carry DTYPE is structural, so XLA cannot elide the casts the way it
    # elides in-graph f32->bf16->f32 round trips.
    bf16_state = os.environ.get("PYSTEPS_TPU_BF16_STATE", "0") == "1"

    def _pack_lag(x):
        if not bf16_state:
            return x
        if jnp.iscomplexobj(x):
            # re/im stacked on axis -3 so the member axis stays leading
            # (the lag arrays are vmapped over members)
            return jnp.stack([x.real, x.imag], axis=-3).astype(jnp.bfloat16)
        return x.astype(jnp.bfloat16)

    def _unpack_lag(x):
        if not bf16_state:
            return x
        f = x.astype(jnp.float32)
        if spectral:
            re, im = jnp.moveaxis(f, -3, 0)
            return jax.lax.complex(re, im)
        return f

    cascades0 = tuple(
        _pack_lag(jnp.broadcast_to(lag, (E,) + lag.shape)) for lag in lags0
    )
    # the CDF-matching target is the fixed latest observation: sort once
    pm_match, pm_state = prepare_cdf_matcher(precip_last)
    mask_prec0 = jnp.broadcast_to(mask_prec_init, (E, m, n))
    det_window0 = lags0 if need_det else None
    # displacement carried on a coarse grid (full-res pixel units): the
    # midpoint integration and the BPS perturbation (linear in the
    # velocity) run at 1/coarse^2 cost; one bilinear upsample per step
    # feeds the full-res output warp
    coarse = 4 if (max_disp is not None and m % 4 == 0 and n % 4 == 0) else 1
    # fused spatial chain (ops/pallas_chain.py): PWL match + rim mask +
    # warp in one resident-VMEM kernel pair — ~1/3 the HBM passes and a
    # hierarchical 2-level PWL evaluation (~5x less VPU compare work).
    # ``use_chain`` is a STATIC argument (computed by _chain_available in
    # the caller) so the PYSTEPS_TPU_NO_CHAIN kill-switch keys the jit
    # cache instead of being baked into a shared executable.
    if use_chain:
        from pysteps_tpu.ops import pallas_chain, pallas_histmatch

        chain_ok = pm_match is pallas_histmatch.match_cdf_pwl
    else:
        chain_ok = False
    vel_c = coarsen_velocity(velocity, coarse)
    V_n_c = coarsen_velocity(V_n, coarse) if vel_pert else None
    V_perp_c = coarsen_velocity(V_perp, coarse) if vel_pert else None
    displacement0 = jnp.zeros((E, 2, m // coarse, n // coarse), jnp.float32)

    def step(carry_and_buf, t_loc):
        carry, out_buf = carry_and_buf
        cascades, det_window, mask_prec, keys, displacement = carry
        t = t_loc + t_offset
        t_total = (t + 1.0) * timestep_min

        # deterministic AR evolution (for sprog mask / no-noise path)
        if det_window is not None:
            det_window = _ar_step_lags(det_window, phi)
            if spectral:
                det_field = recompose_spectral_core(
                    det_window[-1], means_last, stds_last, (m, n),
                    packed=packed,
                )
            else:
                det_field = recompose_core(
                    det_window[-1], means_last, stds_last
                )
            sprog_m = nowcast_utils.compute_percentile_mask(det_field, war)
        else:
            det_field = None
            sprog_m = None

        def member(key, casc_j, mask_j, disp_j, eps_par_j, eps_perp_j):
            key, k_noise = jax.random.split(key)
            if noise:
                casc_j = tuple(_unpack_lag(c) for c in casc_j)
                casc_j, field = _member_update(
                    k_noise, casc_j, phi, noise_filt, noise_filt_shape,
                    use_full_fft, weights_2d, noise_std_coeffs,
                    means_last, stds_last, cfg_flags,
                )
                casc_j = tuple(_pack_lag(c) for c in casc_j)
            else:
                casc_j = det_window
                field = det_field

            fmin = jnp.min(field)
            # --- masking (reference: steps.py:1192-1239) ---
            if mask_method == "incremental":
                field = fmin + (field - fmin) * mask_j
                wet_mask = field > fmin
                field = jnp.where(wet_mask, field, fmin)
            elif mask_method == "obs":
                field = jnp.where(mask_j > 0, field, fmin)
            elif mask_method == "sprog":
                field = jnp.where(sprog_m, field, fmin)

            # --- velocity perturbation + incremental advection ---
            if vel_pert:
                a1, b1, c1 = p_par
                a2, b2, c2 = p_perp
                g_par = a1 * t_total**b1 + c1
                g_perp = a2 * t_total**b2 + c2
                vel_j = vel_c + (
                    eps_par_j * g_par * V_n_c + eps_perp_j * g_perp * V_perp_c
                ) / vsf
            else:
                vel_j = vel_c
            disp_j = integrate_displacement_coarse(
                vel_j, disp_j, 1.0, n_iter=n_iter, max_disp=max_disp,
                coarse=coarse,
            )

            # outside-domain pixels are NaN like the reference's output
            # extrapolation (semilagrangian outval default, steps has no
            # override): filling with precip_min booked a dry inflow band
            # into every score while the reference excludes it
            if chain_ok:
                # fused match + rim + warp (one VMEM-resident kernel pair)
                edges_c, d0_c, d1_c, q0_c, zval_c, ztrg_c = (
                    pallas_histmatch.build_pwl_coeffs(
                        field.reshape(-1), pm_state
                    )
                )
                e8_c, T_c = pallas_histmatch.pack_gather_lut(edges_c, d0_c, d1_c)
                dy_f, disp_t = upsample_planes(disp_j, (m, n), coarse)
                out_field, rim_new = pallas_chain.match_warp_rim(
                    field, e8_c, T_c, q0_c, zval_c, ztrg_c,
                    jnp.float32(precip_thr), dy_f, disp_t, jnp.nan,
                    max_disp,
                    struct_radius if struct_radius else 1,
                    mask_rim if mask_rim else 0,
                    do_rim=(mask_method == "incremental"),
                )
                if mask_method == "incremental":
                    mask_j = rim_new
            else:
                # --- probability matching ---
                if probmatching == "cdf":
                    field = pm_match(field, pm_state)
                elif probmatching == "mean":
                    wet = field >= precip_thr
                    mu_fct = jnp.sum(
                        jnp.where(wet, field, 0.0)
                    ) / jnp.maximum(jnp.sum(wet), 1)
                    field = jnp.where(wet, field - mu_fct + mu_0, field)

                # --- incremental mask update ---
                if mask_method == "incremental":
                    mask_j = nowcast_utils.compute_dilated_mask_from_field(
                        field, precip_thr, struct_radius, mask_rim
                    )

                out_field = model_warp_coarse(
                    field, disp_j, (m, n), coarse,
                    max_disp=max_disp, interp_order=interp_order,
                    cval=jnp.nan,
                )
            out_field = jnp.where(domain_mask, jnp.nan, out_field)
            return key, casc_j, mask_j, disp_j, out_field

        if vel_pert:
            member_fn = member
            member_args = (keys, cascades, mask_prec, displacement, eps_par, eps_perp)
        else:
            member_fn = lambda k, c, mk, d: member(k, c, mk, d, None, None)  # noqa: E731
            member_args = (keys, cascades, mask_prec, displacement)

        if member_chunk is not None and member_chunk < E:
            # bound peak HBM: process members in sequential chunks of
            # member_chunk (lax.map reuses the chunk's buffers), trading a
            # little launch overhead for ~E/member_chunk lower peak memory
            n_chunks = E // member_chunk
            chunked = jax.tree.map(
                lambda a: a.reshape((n_chunks, member_chunk) + a.shape[1:]),
                member_args,
            )
            results = jax.lax.map(
                lambda args: jax.vmap(member_fn)(*args), chunked
            )
            keys, cascades, mask_prec, displacement, out_fields = jax.tree.map(
                lambda r: r.reshape((E,) + r.shape[2:]), results
            )
        else:
            keys, cascades, mask_prec, displacement, out_fields = jax.vmap(
                member_fn
            )(*member_args)

        out_buf = jax.lax.dynamic_update_slice(
            out_buf,
            out_fields[:, None].astype(out_buf.dtype),
            (0, t_loc, 0, 0),
        )
        return (
            (cascades, det_window, mask_prec, keys, displacement),
            out_buf,
        ), None

    if carry_init is not None:
        carry0 = carry_init
    else:
        carry0 = (cascades0, det_window0, mask_prec0, member_keys, displacement0)
    # member-major (E, T, m, n) output buffer threaded through the carry:
    # lax.scan aliases carries in place, so the full output costs ONE
    # buffer — no time-major stack + transpose pair (at 96x1024^2 those
    # two 4.8 GB arrays alive together OOMed the 16 GB HBM)
    out_buf0 = jnp.zeros((E, int_steps, m, n), out_dtype)
    # Unroll ar_order steps per scan iteration: the lag-tuple carry
    # ROTATES each AR step (slot 0 <- slot 1), and a pass-through carry
    # slot forces XLA to copy the whole buffer every iteration — the r4
    # profiler trace showed 4 x (E, k, m, rf) f32 copies per step, ~17%
    # of the scan.  After ar_order inner steps every slot holds a newly
    # computed array, so the while-loop carries alias in place again.
    unroll = (
        ar_order if ar_order > 1 and int_steps % ar_order == 0 else 1
    )
    # Deeper unrolling exposes cross-step fusion to XLA: at 96x512 the
    # headline measured 0.533 s (unroll 2) -> 0.476 s (unroll 6), +11%;
    # unroll 12 blew the compile budget.  Any multiple of ar_order
    # dividing int_steps keeps the alias property.  Capped at 6 up to
    # 512^2: at 96x1024^2 (unchunked, 11.25 GB state+output) the 6-step
    # body's extra live transients OOMed HBM, and larger grids also pay
    # multi-minute compiles (PYSTEPS_TPU_UNROLL overrides).
    unroll_cap = 6 if m * n <= 512 * 512 else unroll
    unroll_env = int(os.environ.get("PYSTEPS_TPU_UNROLL", "0"))
    if unroll_env:
        unroll_cap = unroll_env
    for cand in range(unroll_cap, unroll, -1):
        if (
            int_steps % cand == 0
            and (ar_order <= 1 or cand % ar_order == 0)
        ):
            unroll = cand
            break

    def step_group(carry_and_buf, g):
        for j in range(unroll):
            carry_and_buf, _ = step(carry_and_buf, g * unroll + j)
        return carry_and_buf, None

    (carry_out, outputs), _ = jax.lax.scan(
        step_group, (carry0, out_buf0),
        jnp.arange(int_steps // unroll, dtype=jnp.int32),
    )
    return carry_out, outputs


def forecast(
    precip,
    velocity,
    timesteps,
    n_ens_members=24,
    n_cascade_levels=6,
    precip_thr=None,
    norain_thr=0.0,
    kmperpixel=None,
    timestep=None,
    extrap_method="semilagrangian",
    decomp_method="fft",
    bandpass_filter_method="gaussian",
    noise_method="nonparametric",
    noise_stddev_adj=None,
    ar_order=2,
    vel_pert_method="bps",
    conditional=False,
    probmatching_method="cdf",
    mask_method="incremental",
    seed=None,
    num_workers=1,
    fft_method="numpy",
    domain="spatial",
    extrap_kwargs=None,
    filter_kwargs=None,
    noise_kwargs=None,
    vel_pert_kwargs=None,
    mask_kwargs=None,
    measure_time=False,
    callback=None,
    return_output=True,
    member_chunk=None,
    mesh=None,
    output_dtype="float32",
):
    """STEPS nowcast with the reference's flat signature
    (reference: steps.py:1273-1558).  Returns (n_ens_members, T, m, n)."""
    config = StepsNowcasterConfig(
        n_ens_members=n_ens_members,
        n_cascade_levels=n_cascade_levels,
        precip_threshold=precip_thr,
        norain_threshold=norain_thr,
        kmperpixel=kmperpixel,
        timestep=timestep,
        extrapolation_method=extrap_method,
        decomposition_method=decomp_method,
        bandpass_filter_method=bandpass_filter_method,
        noise_method=noise_method,
        noise_stddev_adj=noise_stddev_adj,
        ar_order=ar_order,
        velocity_perturbation_method=vel_pert_method,
        conditional=conditional,
        probmatching_method=probmatching_method,
        mask_method=mask_method,
        seed=seed,
        num_workers=num_workers,
        fft_method=fft_method,
        domain=domain,
        extrapolation_kwargs=extrap_kwargs or {},
        filter_kwargs=filter_kwargs or {},
        noise_kwargs=noise_kwargs or {},
        velocity_perturbation_kwargs=vel_pert_kwargs or {},
        mask_kwargs=mask_kwargs or {},
        measure_time=measure_time,
        callback=callback,
        return_output=return_output,
        member_chunk=member_chunk,
        mesh=mesh,
        output_dtype=output_dtype,
    )
    nowcaster = StepsNowcaster(precip, velocity, timesteps, config)
    return nowcaster.compute_forecast()
