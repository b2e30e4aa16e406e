"""
S-PROG deterministic nowcast (reference: pysteps/nowcasts/sprog.py:32-432;
Seed 2003 spectral prognosis).

Shares the STEPS machinery: Lagrangian alignment, cascade decomposition,
per-level AR(p), with the stochastic terms removed and a percentile mask.
The lead-time loop is a lax.scan; the whole forecast is one XLA program.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from pysteps_tpu import cascade
from pysteps_tpu.cascade.decomposition import recompose_core
from pysteps_tpu.extrapolation.semilagrangian import integrate_displacement, model_warp
from pysteps_tpu.nowcasts import utils as nowcast_utils
from pysteps_tpu.nowcasts.steps import _estimate_params, _lagrangian_alignment
from pysteps_tpu.postprocessing.probmatching import (
    prepare_cdf_matcher,
)
from pysteps_tpu.timeseries import autoregression
from pysteps_tpu.utils.check_norain import check_norain


@functools.partial(
    jax.jit,
    static_argnames=("int_steps", "probmatching", "n_iter", "interp_order", "max_disp"),
)
def _sprog_scan(
    window0, velocity, phi, means_last, stds_last, precip_last, precip_min,
    precip_thr, war, mu_0, domain_mask, int_steps, probmatching,
    n_iter, interp_order, max_disp=None,
):
    m, n = precip_last.shape
    displacement0 = jnp.zeros((2, m, n), jnp.float32)
    pm_match, pm_state = prepare_cdf_matcher(precip_last)

    def step(carry, _):
        window, displacement = carry
        window = autoregression.iterate_ar_model(window, phi)
        field = recompose_core(window[:, -1], means_last, stds_last)
        # mask out the smallest values so the wet-area ratio stays constant
        # (reference: sprog.py:396-432 _update)
        mask = nowcast_utils.compute_percentile_mask(field, war)
        field = jnp.where(mask, field, precip_min)
        if probmatching == "cdf":
            field = pm_match(field, pm_state)
        elif probmatching == "mean":
            wet = field >= precip_thr
            mu_fct = jnp.sum(jnp.where(wet, field, 0.0)) / jnp.maximum(
                jnp.sum(wet), 1
            )
            field = jnp.where(wet, field - mu_fct + mu_0, field)
        displacement = integrate_displacement(
            velocity, displacement, 1.0, n_iter=n_iter, max_disp=max_disp
        )
        # NaN outside the domain, matching the reference's output
        # extrapolation (semilagrangian outval default)
        out = model_warp(
            field, displacement, max_disp=max_disp,
            interp_order=interp_order, cval=jnp.nan,
        )
        out = jnp.where(domain_mask, jnp.nan, out)
        return (window, displacement), out

    _, outputs = jax.lax.scan(step, (window0, displacement0), None, length=int_steps)
    return outputs


@functools.partial(
    jax.jit,
    static_argnames=("ar_order", "conditional", "n_iter", "interp_order",
                     "max_disp"),
)
def _sprog_init(
    precip_all, velocity, weights_2d, precip_thr, ar_order, conditional,
    n_iter, interp_order, max_disp=None,
):
    """Fused S-PROG initialization: norain gate stats, sanitization,
    Lagrangian alignment, cascade/AR estimation, wet-area statistics —
    ONE dispatch (the previous structure paid ~8 eager dispatches + a
    full-stack host round-trip over the 30-60 ms axon tunnel, which
    dominated the deterministic models' wall time)."""
    rain_frac = jnp.mean(precip_all > precip_thr)
    precip = precip_all[-(ar_order + 1) :].astype(jnp.float32)
    precip_min = jnp.nanmin(precip)
    domain_mask = ~jnp.isfinite(precip[-1])
    precip = jnp.where(jnp.isfinite(precip), precip, precip_min)
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
    window0 = cascades_full[:, -ar_order:]
    precip_last = precip[-1]
    wet = precip_last >= precip_thr
    war = jnp.sum(wet & mask_thr) / jnp.sum(mask_thr)
    mu_0 = jnp.sum(jnp.where(wet, precip_last, 0.0)) / jnp.maximum(
        jnp.sum(wet), 1
    )
    return (
        rain_frac, window0, means, stds, gamma, phi, precip_last,
        precip_min, war, mu_0, domain_mask,
    )


def forecast(
    precip,
    velocity,
    timesteps,
    precip_thr=None,
    norain_thr=0.0,
    n_cascade_levels=6,
    extrap_method="semilagrangian",
    decomp_method="fft",
    bandpass_filter_method="gaussian",
    ar_order=2,
    conditional=False,
    probmatching_method="cdf",
    num_workers=1,
    fft_method="numpy",
    domain="spatial",
    extrap_kwargs=None,
    filter_kwargs=None,
    measure_time=False,
):
    """S-PROG forecast with the reference's signature
    (reference: sprog.py:32).  Returns (num_timesteps, m, n).

    Dispatch discipline: one fused init jit + one scan jit, with the
    norain gate and the AR-parameter table prints resolved AFTER the
    (speculative) scan dispatch so their device->host fetches overlap
    the forecast itself."""
    t0 = time.time()
    device_input = isinstance(precip, jax.Array)
    if not device_input:
        precip = np.asarray(precip)
    if precip.ndim != 3 or precip.shape[0] < ar_order + 1:
        raise ValueError(
            f"precip must be (>=ar_order+1, m, n); got {precip.shape}"
        )
    if precip_thr is None:
        raise ValueError("precip_thr required")
    extrap_kwargs = extrap_kwargs or {}
    filter_kwargs = filter_kwargs or {}
    m, n = precip.shape[1:]

    filter_method = cascade.get_method(bandpass_filter_method)
    bp_filter = filter_method((m, n), n_cascade_levels, **filter_kwargs)
    weights_2d = bp_filter["weights_2d"].astype(jnp.float32)

    n_iter = extrap_kwargs.get("n_iter", 1)
    interp_order = extrap_kwargs.get("interp_order", 1)

    if isinstance(timesteps, int):
        int_steps = timesteps
        subsel = None
    else:
        subsel = list(timesteps)
        int_steps = int(np.ceil(max(subsel)))

    on_cpu = jax.default_backend() == "cpu"
    if not on_cpu and min(m, n) >= 3 * 48:
        # data-independent bound: one executable per shape, and the gate
        # value never has to arrive before dispatch (cf. steps.py)
        max_disp = 48
        speculate = True
    else:
        vmax = (
            float(np.max(np.abs(np.asarray(velocity))))
            if np.asarray(velocity).size else 0.0
        )
        max_disp = max(int(np.ceil(int_steps * (vmax + 0.5))) + 2, 3)
        if on_cpu or max_disp > min(m, n) // 3:
            max_disp = None
        speculate = False

    precip_j = precip if device_input else jnp.asarray(
        np.asarray(precip, np.float32)
    )
    velocity_j = jnp.asarray(velocity, jnp.float32)

    (
        rain_frac_d, window0, means, stds, gamma, phi, precip_last,
        precip_min, war, mu_0, domain_mask,
    ) = _sprog_init(
        precip_j, velocity_j, weights_2d, jnp.float32(precip_thr),
        ar_order=ar_order, conditional=conditional, n_iter=n_iter,
        interp_order=interp_order, max_disp=max_disp if speculate else None,
    )

    init_time = time.time() - t0
    t1 = time.time()
    out = _sprog_scan(
        window0, velocity_j, phi, means[-1], stds[-1], precip_last,
        precip_min, jnp.float32(precip_thr), war, mu_0,
        domain_mask, int_steps, probmatching_method,
        n_iter, interp_order, max_disp=max_disp,
    )
    # these fetches overlap the running scan
    rain_frac = float(rain_frac_d)
    nowcast_utils.print_corrcoefs(gamma)
    nowcast_utils.print_ar_params(phi)
    if rain_frac <= norain_thr:
        print("No precipitation above the threshold found "
              "in the radar field")
        return nowcast_utils.zero_precipitation_forecast(
            None, timesteps, np.asarray(precip), None, True, measure_time, t0
        )
    out.block_until_ready()
    loop_time = time.time() - t1

    if subsel is not None:
        frames = []
        for t_sub in subsel:
            if t_sub == int(t_sub):
                frames.append(out[int(t_sub) - 1])
            else:
                t_int = int(np.ceil(t_sub))
                lo = out[t_int - 2] if t_int >= 2 else out[0]
                hi = out[t_int - 1]
                w = t_sub - (t_int - 1)
                frames.append((1 - w) * lo + w * hi)
        out = jnp.stack(frames)

    if measure_time:
        return out, init_time, loop_time
    return out
