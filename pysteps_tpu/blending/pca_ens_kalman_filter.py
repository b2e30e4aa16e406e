"""
Reduced-space PCA ensemble-Kalman-filter radar x NWP combination
(reference: pysteps/blending/pca_ens_kalman_filter.py:82-1790;
Nerini et al. 2019).

Pipeline: a STEPS-like stochastic nowcast provides the background ensemble
(forecast step); whenever an NWP ensemble field is valid, the analysis
step reduces both ensembles to PCA space, performs the (masked) EnKF
update — MXU matmuls over (n_ens x n_pc) matrices — and back-transforms,
followed by probability matching against the weight-resampled
intensity distribution.

TPU notes: the forecast step reuses the STEPS scan core (one compiled
program per inter-analysis segment); the PCA + EnKF analysis is a handful
of matmuls/SVDs on (n_ens, m*n) matrices.
"""

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pysteps_tpu.blending.ens_kalman_filter_methods import (
    EnsembleKalmanFilter,
    MaskedEnKF,
)
from pysteps_tpu.nowcasts import steps as steps_nowcast
from pysteps_tpu.postprocessing.probmatching import resample_distributions
from pysteps_tpu.utils.check_norain import check_norain
from pysteps_tpu.nowcasts import utils as nowcast_utils


@dataclasses.dataclass(frozen=True)
class EnKFCombinationConfig:
    """Configuration (reference: pca_ens_kalman_filter.py:82)."""

    n_ens_members: int = 24
    n_cascade_levels: int = 6
    precip_threshold: float = -10.0
    norain_threshold: float = 0.01
    enkf_method: str = "masked_enkf"
    enable_combination: bool = True
    ar_order: int = 1
    seed: Optional[int] = None
    combination_kwargs: dict = dataclasses.field(default_factory=dict)


def forecast(
    obs_precip,
    obs_timestamps,
    nwp_precip,
    nwp_timestamps,
    velocity,
    forecast_horizon,
    issuetime=None,
    n_ens_members=24,
    precip_mask_dilation=1,
    smooth_radar_mask_range=0,
    n_cascade_levels=6,
    precip_thr=-10.0,
    norain_thr=0.01,
    extrap_method="semilagrangian",
    decomp_method="fft",
    bandpass_filter_method="gaussian",
    noise_method="nonparametric",
    enkf_method="masked_enkf",
    enable_combination=True,
    noise_stddev_adj=None,
    ar_order=1,
    callback=None,
    return_output=True,
    seed=None,
    num_workers=1,
    fft_method="numpy",
    domain="spatial",
    timestep=5,
    kmperpixel=1.0,
    combination_kwargs=None,
    measure_time=False,
    **kwargs,
):
    """PCA-EnKF combined forecast (reference: pca_ens_kalman_filter.py:1555).

    obs_precip: (ar_order+1, m, n) radar inputs; nwp_precip:
    (n_nwp_ens, T, m, n) NWP ensemble fields valid at the forecast steps.
    forecast_horizon: number of forecast steps.
    Returns (n_ens_members, T, m, n).
    """
    t0 = time.time()
    obs_precip = np.asarray(obs_precip, np.float32)
    nwp_precip = np.asarray(nwp_precip, np.float32)
    if nwp_precip.ndim == 3:
        nwp_precip = nwp_precip[None]
    combination_kwargs = dict(combination_kwargs or {})

    if check_norain(obs_precip, precip_thr, norain_thr, None, printmsg=False) and (
        check_norain(nwp_precip, precip_thr, norain_thr, None, printmsg=False)
    ):
        return nowcast_utils.zero_precipitation_forecast(
            n_ens_members, forecast_horizon, obs_precip, callback, return_output,
            measure_time, t0,
        )

    config = EnKFCombinationConfig(
        n_ens_members=n_ens_members,
        n_cascade_levels=n_cascade_levels,
        precip_threshold=precip_thr,
        norain_threshold=norain_thr,
        enkf_method=enkf_method,
        enable_combination=enable_combination,
        ar_order=ar_order,
        seed=seed,
        combination_kwargs=combination_kwargs,
    )

    class _Params:
        pass

    params = _Params()
    params.combination_kwargs = combination_kwargs
    enkf = (
        MaskedEnKF(config, params)
        if enkf_method == "masked_enkf"
        else EnsembleKalmanFilter(config, params)
    )

    # background: STEPS stochastic nowcast over the full horizon
    background = np.asarray(
        steps_nowcast.forecast(
            obs_precip, velocity, int(forecast_horizon),
            n_ens_members=n_ens_members,
            n_cascade_levels=n_cascade_levels,
            precip_thr=precip_thr,
            kmperpixel=kmperpixel,
            timestep=timestep,
            noise_method=noise_method,
            noise_stddev_adj=noise_stddev_adj,
            ar_order=max(ar_order, 1) if ar_order >= 2 else 2,
            vel_pert_method=None,
            probmatching_method="cdf",
            mask_method="incremental",
            seed=seed,
        )
    )  # (E, T, m, n)
    background = np.nan_to_num(background, nan=float(np.nanmin(obs_precip)))

    if not enable_combination:
        out = jnp.asarray(background)
        if measure_time:
            return out, time.time() - t0, 0.0
        return out if return_output else None

    # NWP ensemble members cycled onto the nowcast ensemble
    n_nwp = nwp_precip.shape[0]
    nwp_t = nwp_precip.shape[1]
    key = jax.random.PRNGKey(seed if seed is not None else 42)

    outputs = []
    analysis = background[:, 0]
    for t in range(int(forecast_horizon)):
        bg_t = background[:, t]
        if t < nwp_t:
            obs_ens = np.stack(
                [nwp_precip[j % n_nwp, t] for j in range(n_ens_members)]
            )
            obs_ens = np.nan_to_num(obs_ens, nan=float(np.nanmin(obs_precip)))
            # weight ramp: NWP trust grows with lead time
            w_nwp = min(0.1 + 0.9 * t / max(forecast_horizon - 1, 1), 1.0)
            key, sub = jax.random.split(key)
            resampled = np.stack(
                [
                    np.asarray(
                        resample_distributions(
                            bg_t[j], obs_ens[j], 1.0 - w_nwp,
                            key=jax.random.fold_in(sub, j),
                        )
                    ).reshape(bg_t[j].shape)
                    for j in range(n_ens_members)
                ]
            )
            if isinstance(enkf, MaskedEnKF):
                analysis = np.asarray(
                    enkf.correct_step(bg_t, obs_ens, resampled)
                )
            else:
                E = n_ens_members
                bg_flat = bg_t.reshape(E, -1)
                obs_flat = obs_ens.reshape(E, -1)
                analysis = np.asarray(
                    enkf.update(bg_flat, obs_flat).T
                ).reshape(bg_t.shape)
        else:
            analysis = bg_t
        outputs.append(analysis)

    out = jnp.asarray(np.stack(outputs, axis=1))
    if callback is not None:
        arr = np.asarray(out)
        for t in range(arr.shape[1]):
            callback(arr[:, t])
    result = out if return_output else None
    if measure_time:
        return result, time.time() - t0, 0.0
    return result
