"""
Ensemble Kalman filter update machinery
(reference: pysteps/blending/ens_kalman_filter_methods.py:79-635;
Nerini et al. 2019).

TPU-native: the covariance build, tapering, Kalman gain solve and analysis
update are jnp matmuls over (n_ens, n_pc) matrices — exactly the shapes the
MXU wants.
"""

import jax.numpy as jnp
import numpy as np


class EnsembleKalmanFilter:
    """EnKF update in (principal-component) space
    (reference: ens_kalman_filter_methods.py:79)."""

    def __init__(self, config, params):
        self._config = config
        kwargs = getattr(params, "combination_kwargs", {}) or {}
        self._n_tapering = kwargs.get("n_tapering", 0)
        self._non_precip_mask = kwargs.get("non_precip_mask", True)
        self._n_ens_prec = kwargs.get("n_ens_prec", 1)
        self._lien_criterion = kwargs.get("lien_criterion", True)
        self._n_lien = kwargs.get(
            "n_lien", getattr(config, "n_ens_members", 2) // 2
        )
        self.K = None

    def update(
        self,
        background_ensemble,
        observation_ensemble,
        inflation_factor_bg=1.0,
        inflation_factor_obs=1.0,
        offset_bg=0.0,
        offset_obs=0.0,
        background_ensemble_valid_lien=None,
        observation_ensemble_valid_lien=None,
    ):
        """Kalman update (reference: :105; Nerini 2019 eq. 13-16).

        background/observation ensembles: (n_ens, n_pc).
        Returns the analysis ensemble (n_pc, n_ens) as the reference does.
        """
        bg = jnp.asarray(background_ensemble)
        obs = jnp.asarray(observation_ensemble)
        bg_P = (
            jnp.asarray(background_ensemble_valid_lien)
            if background_ensemble_valid_lien is not None
            else bg
        )
        obs_R = (
            jnp.asarray(observation_ensemble_valid_lien)
            if observation_ensemble_valid_lien is not None
            else obs
        )
        P = self.get_covariance_matrix(bg_P, inflation_factor_bg, offset_bg)
        R = self.get_covariance_matrix(obs_R, inflation_factor_obs, offset_obs)
        # eq. 15: K = P (P + R)^-1  (solved, not inverted)
        self.K = jnp.linalg.solve((P + R).T, P.T).T
        analysis = bg.T + self.K @ (obs - bg).T
        return analysis

    def get_covariance_matrix(self, forecast_array, inflation_factor=1.0, offset=0.0):
        """(reference: :197; Nerini 2019 eq. 13-14)"""
        fa = jnp.asarray(forecast_array)
        centered = (fa - jnp.mean(fa, axis=0)) * inflation_factor
        cov = centered.T @ centered / max(fa.shape[0] - 1, 1) + offset
        return cov * jnp.asarray(self.get_tapering(fa.shape[1]))

    def get_tapering(self, n):
        """Hanning-windowed diagonal taper (reference: :236)."""
        window = np.eye(n)
        if self._n_tapering > 0:
            hanning_values = np.hanning(self._n_tapering * 2 + 1)[
                self._n_tapering + 1 :
            ]
            for d in range(self._n_tapering):
                window += np.diag(
                    np.ones(n - d - 1) * hanning_values[d], k=d + 1
                )
                window += np.diag(
                    np.ones(n - d - 1) * hanning_values[d], k=-d - 1
                )
        return window

    def get_precipitation_mask(self, forecast_array, precip_thr=0.1):
        """Grid boxes where >= n_ens_prec members forecast precipitation
        (reference: :278)."""
        fa = jnp.asarray(forecast_array)
        counts = jnp.sum(fa > precip_thr, axis=0)
        return np.asarray(counts >= self._n_ens_prec)

    def get_lien_mask(self, background, observation, precip_thr=0.1):
        """Grid boxes satisfying the Lien et al. criterion: at least n_lien
        members of both ensembles show precipitation (reference: :330)."""
        bg_counts = jnp.sum(jnp.asarray(background) > precip_thr, axis=0)
        obs_counts = jnp.sum(jnp.asarray(observation) > precip_thr, axis=0)
        return np.asarray((bg_counts >= self._n_lien) & (obs_counts >= self._n_lien))


class MaskedEnKF(EnsembleKalmanFilter):
    """EnKF with precipitation masking and PCA reduction
    (reference: ens_kalman_filter_methods.py:401)."""

    def __init__(self, config, params):
        super().__init__(config, params)
        kwargs = getattr(params, "combination_kwargs", {}) or {}
        self._iterative_prob_matching = kwargs.get("iterative_prob_matching", True)
        self._inflation_factor_bg = kwargs.get("inflation_factor_bg", 1.0)
        self._inflation_factor_obs = kwargs.get("inflation_factor_obs", 1.0)
        self._offset_bg = kwargs.get("offset_bg", 0.0)
        self._offset_obs = kwargs.get("offset_obs", 0.0)
        self._n_components = kwargs.get("n_components", None)

    def correct_step(self, background_ensemble, observation_ensemble, resampled_forecast):
        """PCA-reduce, Kalman-update, back-transform, rank-match
        (reference: :452; Nerini 2019).

        All arrays: (n_ens, m, n).  Returns the analysis ensemble (n_ens, m, n).
        """
        from pysteps_tpu.postprocessing.probmatching import _match_cdf_core
        from pysteps_tpu.utils.pca import pca_backtransform, pca_transform

        n_ens, m, n = background_ensemble.shape
        bg_flat = jnp.asarray(background_ensemble).reshape(n_ens, -1)
        obs_flat = jnp.asarray(observation_ensemble).reshape(n_ens, -1)

        # fit PCA on the combined ensembles (reduced space dim <= 2*n_ens)
        combined = jnp.concatenate([bg_flat, obs_flat], axis=0)
        n_comp = self._n_components or max(n_ens - 1, 1)
        _, pca_params = pca_transform(combined, n_components=n_comp, get_params=True)
        bg_pc = pca_transform(bg_flat, pca_params=pca_params)
        obs_pc = pca_transform(obs_flat, pca_params=pca_params)

        analysis_pc = self.update(
            bg_pc, obs_pc,
            inflation_factor_bg=self._inflation_factor_bg,
            inflation_factor_obs=self._inflation_factor_obs,
            offset_bg=self._offset_bg,
            offset_obs=self._offset_obs,
        ).T  # (n_ens, n_pc)

        analysis = pca_backtransform(analysis_pc, pca_params).reshape(n_ens, m, n)

        if self._iterative_prob_matching and resampled_forecast is not None:
            matched = []
            for j in range(n_ens):
                matched.append(
                    _match_cdf_core(
                        analysis[j], jnp.asarray(resampled_forecast[j])
                    )
                )
            analysis = jnp.stack(matched)
        return analysis
