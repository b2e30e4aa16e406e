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

Class layout mirrors the reference: EnKFCombinationConfig (:82),
EnKFCombinationParams (:226), ForecastInitialization (:251),
ForecastState (:585), ForecastModel (:620), EnKFCombinationNowcaster
(:923), with the flat `forecast` wrapper (:1555).

TPU notes: the forecast step reuses the STEPS scan core (one compiled
program over the full horizon); the PCA + EnKF analysis is a handful of
matmuls/SVDs on (n_ens, m*n) matrices.
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
from pysteps_tpu.nowcasts import utils as nowcast_utils
from pysteps_tpu.postprocessing.probmatching import resample_distributions
from pysteps_tpu.utils.check_norain import check_norain


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


@dataclasses.dataclass
class EnKFCombinationParams:
    """Derived quantities shared between the forecast and correction models
    (reference: pca_ens_kalman_filter.py:226-249)."""

    combination_kwargs: dict = dataclasses.field(default_factory=dict)
    zerovalue: float = 0.0
    n_nwp_members: int = 0
    n_timesteps: int = 0


@dataclasses.dataclass
class ForecastState:
    """Evolving state of the combination loop
    (reference: pca_ens_kalman_filter.py:585-618)."""

    analysis: np.ndarray          # (E, m, n) current combined ensemble
    rng_key: jnp.ndarray          # resampling PRNG key
    timestep: int = 0


class ForecastInitialization:
    """Input validation + background-ensemble generation
    (reference: pca_ens_kalman_filter.py:251-583, which decomposes and
    fits AR cascades itself; here the STEPS scan core does that in one
    compiled program)."""

    def __init__(self, obs_precip, velocity, config, forecast_horizon,
                 noise_method="nonparametric", noise_stddev_adj=None,
                 nowcast_kwargs=None,
                 timestep=5, kmperpixel=1.0):
        self.obs_precip = np.asarray(obs_precip, np.float32)
        self.velocity = velocity
        self.config = config
        self.forecast_horizon = int(forecast_horizon)
        self.noise_method = noise_method
        self.noise_stddev_adj = noise_stddev_adj
        self.timestep = timestep
        self.kmperpixel = kmperpixel
        self.nowcast_kwargs = dict(nowcast_kwargs or {})

    def compute_background(self):
        """Run the stochastic nowcast over the full horizon; returns
        (E, T, m, n) with NaNs filled at the domain minimum."""
        cfg = self.config
        background = np.asarray(
            steps_nowcast.forecast(
                self.obs_precip, self.velocity, self.forecast_horizon,
                n_ens_members=cfg.n_ens_members,
                n_cascade_levels=cfg.n_cascade_levels,
                precip_thr=cfg.precip_threshold,
                kmperpixel=self.kmperpixel,
                timestep=self.timestep,
                noise_method=self.noise_method,
                noise_stddev_adj=self.noise_stddev_adj,
                ar_order=max(cfg.ar_order, 1) if cfg.ar_order >= 2 else 2,
                vel_pert_method=None,
                probmatching_method="cdf",
                mask_method="incremental",
                seed=cfg.seed,
                **self.nowcast_kwargs,
            )
        )
        return np.nan_to_num(
            background, nan=float(np.nanmin(self.obs_precip))
        )


class ForecastModel:
    """One combination cycle: weight-ramped distribution resampling +
    (PCA-reduced) EnKF analysis when an NWP field is valid
    (reference: pca_ens_kalman_filter.py:620-921)."""

    def __init__(self, config, params, enkf):
        self.config = config
        self.params = params
        self.enkf = enkf

    def nwp_weight(self, t, horizon):
        """Linear trust ramp toward NWP with lead time."""
        return min(0.1 + 0.9 * t / max(horizon - 1, 1), 1.0)

    def correction_step(self, state, background_t, nwp_t, horizon):
        """EnKF analysis of one lead time; returns the updated state."""
        cfg = self.config
        E = cfg.n_ens_members
        n_nwp = self.params.n_nwp_members
        obs_ens = np.stack(
            [nwp_t[j % n_nwp] for j in range(E)]
        )
        obs_ens = np.nan_to_num(obs_ens, nan=self.params.zerovalue)
        key, sub = jax.random.split(state.rng_key)
        if isinstance(self.enkf, MaskedEnKF):
            # rainy-pixel + Lien-criterion EnKF with a dynamic sampling
            # probability (reference: ens_kalman_filter_methods.py:452-628);
            # the analysis is rank-matched against the resampled target as
            # the reference's subsequent nowcast step does
            # (pca_ens_kalman_filter.py:876-883)
            from pysteps_tpu.postprocessing.probmatching import _match_cdf_core

            analysis, resampled = self.enkf.correct_step(
                background_t, obs_ens,
                resampled_forecast=background_t.copy(), rng_key=sub,
            )
            if resampled is not None:
                analysis = np.stack(
                    [
                        np.asarray(
                            _match_cdf_core(
                                jnp.asarray(analysis[j]),
                                jnp.asarray(resampled[j]),
                            )
                        )
                        for j in range(E)
                    ]
                )
        else:
            # plain EnKF: fixed linear trust ramp toward NWP
            w_nwp = self.nwp_weight(state.timestep, horizon)
            resampled = np.stack(
                [
                    np.asarray(
                        resample_distributions(
                            background_t[j], obs_ens[j], 1.0 - w_nwp,
                            key=jax.random.fold_in(sub, j),
                        )
                    ).reshape(background_t[j].shape)
                    for j in range(E)
                ]
            )
            bg_flat = background_t.reshape(E, -1)
            obs_flat = obs_ens.reshape(E, -1)
            analysis = np.asarray(
                self.enkf.update(bg_flat, obs_flat).T
            ).reshape(background_t.shape)
        return ForecastState(
            analysis=analysis, rng_key=key, timestep=state.timestep + 1
        )

    def forecast_step(self, state, background_t):
        """No valid NWP at this lead time: the background is the analysis."""
        return ForecastState(
            analysis=background_t, rng_key=state.rng_key,
            timestep=state.timestep + 1,
        )


class EnKFCombinationNowcaster:
    """Orchestration of forecast/correction cycling
    (reference: pca_ens_kalman_filter.py:923-1553)."""

    def __init__(self, obs_precip, nwp_precip, velocity, forecast_horizon,
                 enkf_combination_config, noise_method="nonparametric",
                 noise_stddev_adj=None, timestep=5, kmperpixel=1.0,
                 callback=None, return_output=True, measure_time=False,
                 nowcast_kwargs=None, verbose_output=False):
        self.obs_precip = np.asarray(obs_precip, np.float32)
        self.nwp_precip = np.asarray(nwp_precip, np.float32)
        if self.nwp_precip.ndim == 3:
            self.nwp_precip = self.nwp_precip[None]
        self.velocity = velocity
        self.forecast_horizon = int(forecast_horizon)
        self.config = enkf_combination_config
        self.noise_method = noise_method
        self.noise_stddev_adj = noise_stddev_adj
        self.timestep = timestep
        self.kmperpixel = kmperpixel
        self.callback = callback
        self.return_output = return_output
        self.measure_time = measure_time
        self.nowcast_kwargs = dict(nowcast_kwargs or {})
        self.verbose_output = verbose_output

    def compute_forecast(self):
        cfg = self.config
        t0 = time.time()

        if check_norain(
            self.obs_precip, cfg.precip_threshold, cfg.norain_threshold,
            None, printmsg=False,
        ) and check_norain(
            self.nwp_precip, cfg.precip_threshold, cfg.norain_threshold,
            None, printmsg=False,
        ):
            return nowcast_utils.zero_precipitation_forecast(
                cfg.n_ens_members, self.forecast_horizon, self.obs_precip,
                self.callback, self.return_output, self.measure_time, t0,
            )

        params = EnKFCombinationParams(
            combination_kwargs=dict(cfg.combination_kwargs),
            zerovalue=float(np.nanmin(self.obs_precip)),
            n_nwp_members=self.nwp_precip.shape[0],
            n_timesteps=self.nwp_precip.shape[1],
        )
        enkf = (
            MaskedEnKF(cfg, params)
            if cfg.enkf_method == "masked_enkf"
            else EnsembleKalmanFilter(cfg, params)
        )

        init = ForecastInitialization(
            self.obs_precip, self.velocity, cfg, self.forecast_horizon,
            noise_method=self.noise_method,
            noise_stddev_adj=self.noise_stddev_adj,
            timestep=self.timestep, kmperpixel=self.kmperpixel,
            nowcast_kwargs=self.nowcast_kwargs,
        )
        background = init.compute_background()  # (E, T, m, n)

        if not cfg.enable_combination:
            out = jnp.asarray(background)
            if self.measure_time:
                return out, time.time() - t0, 0.0
            return out if self.return_output else None

        model = ForecastModel(cfg, params, enkf)
        state = ForecastState(
            analysis=background[:, 0],
            rng_key=jax.random.PRNGKey(cfg.seed if cfg.seed is not None else 42),
        )
        outputs = []
        for t in range(self.forecast_horizon):
            corrected = t < params.n_timesteps
            if corrected:
                state = model.correction_step(
                    state, background[:, t], self.nwp_precip[:, t],
                    self.forecast_horizon,
                )
            else:
                state = model.forecast_step(state, background[:, t])
            if self.verbose_output:
                print(
                    f"t={t + 1}: "
                    + ("EnKF analysis" if corrected else "background only")
                    + f", ens mean {float(np.nanmean(state.analysis)):.3f}"
                )
            outputs.append(state.analysis)

        out = jnp.asarray(np.stack(outputs, axis=1))
        if self.callback is not None:
            arr = np.asarray(out)
            for t in range(arr.shape[1]):
                self.callback(arr[:, t])
        result = out if self.return_output else None
        if self.measure_time:
            return result, time.time() - t0, 0.0
        return result


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
    extrap_kwargs=None,
    filter_kwargs=None,
    noise_kwargs=None,
    verbose_output=False,
    measure_time=False,
    **kwargs,
):
    """PCA-EnKF combined forecast (reference: pca_ens_kalman_filter.py:1555;
    extrap_kwargs/filter_kwargs/noise_kwargs forward to the extrapolator,
    bandpass filter and noise initializer, verbose_output prints the
    per-step combination diagnostics).

    obs_precip: (ar_order+1, m, n) radar inputs; nwp_precip:
    (n_nwp_ens, T, m, n) NWP ensemble fields valid at the forecast steps.
    forecast_horizon: number of forecast steps.
    Returns (n_ens_members, T, m, n).
    """
    config = EnKFCombinationConfig(
        n_ens_members=n_ens_members,
        n_cascade_levels=n_cascade_levels,
        precip_threshold=precip_thr,
        norain_threshold=norain_thr,
        enkf_method=enkf_method,
        enable_combination=enable_combination,
        ar_order=ar_order,
        seed=seed,
        combination_kwargs=dict(combination_kwargs or {}),
    )
    nowcast_kwargs = {}
    if extrap_kwargs:
        nowcast_kwargs["extrap_kwargs"] = dict(extrap_kwargs)
    if filter_kwargs:
        nowcast_kwargs["filter_kwargs"] = dict(filter_kwargs)
    if noise_kwargs:
        nowcast_kwargs["noise_kwargs"] = dict(noise_kwargs)
    nowcaster = EnKFCombinationNowcaster(
        obs_precip, nwp_precip, velocity, forecast_horizon,
        enkf_combination_config=config,
        noise_method=noise_method,
        noise_stddev_adj=noise_stddev_adj,
        timestep=timestep,
        kmperpixel=kmperpixel,
        callback=callback,
        return_output=return_output,
        measure_time=measure_time,
        nowcast_kwargs=nowcast_kwargs,
        verbose_output=verbose_output,
    )
    return nowcaster.compute_forecast()
