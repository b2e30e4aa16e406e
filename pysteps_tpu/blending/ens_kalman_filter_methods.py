"""
Ensemble Kalman filter update machinery
(reference: pysteps/blending/ens_kalman_filter_methods.py:79-635;
Nerini et al. 2019).

TPU-native: the covariance build, tapering, Kalman gain solve and analysis
update are jnp matmuls over (n_ens, n_pc) matrices — exactly the shapes the
MXU wants.
"""

import jax
import jax.numpy as jnp
import numpy as np


def _resample_core(a, b, p_first, key):
    """Traceable binomial mix of two sorted sample sets (see
    postprocessing.probmatching.resample_distributions; reference:
    probmatching.py:277)."""
    fill = jnp.nanmin(jnp.stack([jnp.nanmin(a), jnp.nanmin(b)]))
    a = jnp.where(jnp.isnan(a), fill, a)
    b = jnp.where(jnp.isnan(b), fill, b)
    asort = jnp.sort(a)[::-1]
    bsort = jnp.sort(b)[::-1]
    pick = jax.random.bernoulli(key, p_first, asort.shape)
    return jnp.where(pick, asort, bsort)


def masked_enkf_correct_core(
    bg, obs, resampled, rng_key, samp_prob, accum_prob, infl_prev,
    degrade_t,
    *, precip_thr, norain_thr, n_ens_prec, n_lien, non_precip_mask,
    lien_criterion, taper, inflation_factor_bg, inflation_factor_obs,
    offset_bg, offset_obs, iterative_prob_matching, sampling_prob_source,
    use_accum, ensure_full_nwp_weight,
):
    """Device-resident MaskedEnKF correction (traceable; the per-cycle jit
    in pca_ens_kalman_filter calls this so no field ever crosses the host
    link).  Semantics follow MaskedEnKF.correct_step (reference:
    ens_kalman_filter_methods.py:452-628) with two TPU-native changes that
    are mathematically equivalent:

    - rainy-pixel selection keeps static shapes: instead of gathering the
      dynamic rainy-column submatrix, non-rainy columns are zeroed before
      the PCA fit (their centred values contribute nothing to the Gram
      matrix, so eigenvectors/scores match the gathered fit), and the
      analysis is scattered back with a masked select;
    - the PCA fit uses the Gram trick (G = Xc Xc^T, 2E x 2E eigh) instead
      of the economy SVD — identical scores up to component sign, and the
      eigendecomposition is tiny while the two big matmuls hit the MXU.

    Returns ``(analysis, resampled, samp_prob, accum_prob, infl_obs_tmp,
    degrade_t)`` — the three scalars are the carried filter state that the
    numpy class keeps as attributes.
    """
    E = bg.shape[0]
    bgf = bg.reshape(E, -1)
    obsf = obs.reshape(E, -1)
    P = bgf.shape[1]
    n2 = 2 * E

    # full-NWP-weight assurance near total NWP trust (reference :529-537):
    # runs before the update, referencing last step's accumulated prob
    close1 = jnp.abs(accum_prob - 1.0) <= (1e-8 + 1e-2 * 1.0)
    infl_tmp = jnp.where(
        close1,
        jnp.cos(degrade_t),
        inflation_factor_obs - accum_prob * (inflation_factor_obs - 1.0),
    )
    degrade_new = jnp.where(close1, degrade_t + 0.2, degrade_t)

    # rainy-pixel selection + Lien criterion (reference :484-493)
    cnt_bg = jnp.sum(bgf >= precip_thr, axis=0)
    cnt_obs = jnp.sum(obsf >= precip_thr, axis=0)
    if non_precip_mask:
        idx_prec = (cnt_bg >= n_ens_prec) | (cnt_obs >= n_ens_prec)
    else:
        idx_prec = jnp.ones(P, bool)
    if lien_criterion:
        lien = (cnt_bg >= n_lien) & (cnt_obs >= n_lien)
    else:
        lien = jnp.ones(P, bool)
    mask_p = idx_prec.astype(jnp.float32)
    mask_lb = idx_prec & lien
    mask_l = mask_lb.astype(jnp.float32)

    X = jnp.concatenate([bgf, obsf], axis=0)
    X = jnp.where(jnp.isfinite(X), X, norain_thr)

    # PCA fit on the masked stacked ensembles (reference :512-527)
    mean = jnp.mean(X, axis=0)
    Xc = (X - mean) * mask_p[None]
    G = Xc @ Xc.T
    lam, U = jnp.linalg.eigh(G)
    lam = lam[::-1]
    U = U[:, ::-1]
    S = jnp.sqrt(jnp.maximum(lam, 1e-30))
    UoS = U / S[None]
    scores = U * S[None]                 # = Xc @ Vt^T exactly (2E, 2E)
    Xl = (X - mean) * mask_l[None]
    scores_l = (Xl @ Xc.T) @ UoS         # Lien-masked projection

    # covariances, gain, analysis (reference EnsembleKalmanFilter.update)
    def _cov(sc, infl, off):
        c = (sc - jnp.mean(sc, axis=0)) * infl
        return (c.T @ c) / max(E - 1, 1) + off

    Pm = _cov(scores_l[:E], inflation_factor_bg, offset_bg) * taper
    R = _cov(scores_l[E:], infl_tmp, offset_obs) * taper
    K = jnp.linalg.solve((Pm + R).T, Pm.T).T
    analysis_pc = scores[:E].T + K @ (scores[E:] - scores[:E]).T
    A = analysis_pc.T @ (UoS.T @ Xc) + mean        # back-transform (E, P)

    # sampling probability (reference :555-577)
    if sampling_prob_source == "ensemble":
        w1 = jnp.sum((A - X[:E]) * mask_l[None], axis=0)
        w2 = jnp.sum((X[E:] - X[:E]) * mask_l[None], axis=0)
        w_close = jnp.isclose(w1, w2)
        ratio = w1 / w2
        w = jnp.where(w_close, 1.0, ratio)
        valid = (w >= 0.0) & (w <= 1.0) & mask_lb
        nvalid = jnp.sum(valid)
        prob = jnp.sum(jnp.where(valid, w, 0.0)) / jnp.maximum(nvalid, 1)
        prob = jnp.where(nvalid > 0, prob, jnp.nan)
    elif sampling_prob_source == "explained_var":
        prob = jnp.sum(jnp.diag(K) * lam / jnp.maximum(jnp.sum(lam), 1e-30))
    else:
        raise ValueError(
            "sampling_prob_source must be 'ensemble' or 'explained_var', "
            f"got {sampling_prob_source}"
        )
    prob = jnp.where(jnp.isfinite(prob), prob, 1.0)

    samp_new = (1.0 - prob) * samp_prob + prob if use_accum else prob
    accum_new = (
        (1.0 - prob) * accum_prob + prob
        if ensure_full_nwp_weight
        else accum_prob
    )

    # resample the matching target with the dynamic weight (:598-621)
    if iterative_prob_matching:
        res_new = jax.vmap(
            lambda f, o, k: _resample_core(f, o, 1.0 - samp_new, k)
        )(
            bgf, obsf,
            jax.vmap(lambda j: jax.random.fold_in(rng_key, j))(jnp.arange(E)),
        ).reshape(bg.shape)
    else:
        res_new = resampled

    out = jnp.where(mask_p[None] > 0, A, bgf).reshape(bg.shape)

    # too few rainy boxes: fall back to the NWP ensemble, filter state
    # untouched (reference :506-510 returns before the inflation update)
    few = jnp.sum(idx_prec) <= n2
    return (
        jnp.where(few, obs, out),
        jnp.where(few, resampled, res_new),
        jnp.where(few, samp_prob, samp_new),
        jnp.where(few, accum_prob, accum_new),
        jnp.where(few, infl_prev, infl_tmp),
        jnp.where(few, degrade_t, degrade_new),
    )


class EnsembleKalmanFilter:
    """EnKF update in (principal-component) space
    (reference: ens_kalman_filter_methods.py:79)."""

    def __init__(self, config, params):
        self._config = config
        kwargs = getattr(params, "combination_kwargs", {}) or {}
        self._inflation_factor_obs_tmp = 1.0
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

    def get_precipitation_mask(self, forecast_array):
        """Grid boxes where >= n_ens_prec members forecast precipitation
        (reference: :252-300); with non_precip_mask disabled every box
        passes."""
        fa = jnp.asarray(forecast_array).reshape(forecast_array.shape[0], -1)
        counts = jnp.sum(fa >= self._config.precip_threshold, axis=0)
        if not self._non_precip_mask:
            return np.ones(fa.shape[1], dtype=bool)
        return np.asarray(counts >= self._n_ens_prec)

    def get_lien_criterion(self, nwc_ensemble, nwp_ensemble):
        """Grid boxes satisfying the Lien et al. (2013) criterion: at least
        n_lien members of both ensembles forecast precipitation
        (reference: :302-357); with lien_criterion disabled every box
        passes."""
        nwc = jnp.asarray(nwc_ensemble).reshape(nwc_ensemble.shape[0], -1)
        nwp = jnp.asarray(nwp_ensemble).reshape(nwp_ensemble.shape[0], -1)
        nwc_counts = jnp.sum(nwc >= self._config.precip_threshold, axis=0)
        nwp_counts = jnp.sum(nwp >= self._config.precip_threshold, axis=0)
        if not self._lien_criterion:
            return np.ones(nwc.shape[1], dtype=bool)
        return np.asarray(
            (nwc_counts >= self._n_lien) & (nwp_counts >= self._n_lien)
        )

    def get_weighting_for_probability_matching(
        self, background_ensemble, analysis_ensemble, observation_ensemble
    ):
        """Effective NWP weight implied by the analysis update — Nerini
        (2019) eq. 17 (reference: :359-400).  0 = all nowcast, 1 = all
        NWP."""
        w1 = np.sum(
            np.asarray(analysis_ensemble) - np.asarray(background_ensemble),
            axis=0,
        )
        w2 = np.sum(
            np.asarray(observation_ensemble) - np.asarray(background_ensemble),
            axis=0,
        )
        w_close = np.isclose(w1, w2)
        w_zero = w_close & np.isclose(w2, 0.0)
        weight = np.zeros_like(w1)
        with np.errstate(divide="ignore", invalid="ignore"):
            weight[~w_zero] = w1[~w_zero] / w2[~w_zero]
        weight[w_close] = 1.0
        valid = (weight >= 0.0) & (weight <= 1.0)
        with np.errstate(invalid="ignore"):
            weight = float(np.nanmean(weight[valid])) if np.any(valid) else np.nan
        if not np.isfinite(weight):
            weight = 1.0
        return weight


class MaskedEnKF(EnsembleKalmanFilter):
    """EnKF with precipitation masking and PCA reduction
    (reference: ens_kalman_filter_methods.py:401)."""

    def __init__(self, config, params):
        super().__init__(config, params)
        kwargs = getattr(params, "combination_kwargs", {}) or {}
        # optional device mesh: the PCA fit runs as sharded matmuls
        # (SURVEY §2.17 "EnKF linear algebra as sharded matmuls")
        self._mesh = kwargs.get("mesh") or getattr(params, "mesh", None)
        self._iterative_prob_matching = kwargs.get("iterative_prob_matching", True)
        self._inflation_factor_bg = kwargs.get("inflation_factor_bg", 1.0)
        self._inflation_factor_obs = kwargs.get("inflation_factor_obs", 1.0)
        self._offset_bg = kwargs.get("offset_bg", 0.0)
        self._offset_obs = kwargs.get("offset_obs", 0.0)
        self._sampling_prob_source = kwargs.get("sampling_prob_source", "ensemble")
        self._use_accum_sampling_prob = kwargs.get("use_accum_sampling_prob", False)
        self._ensure_full_nwp_weight = kwargs.get("ensure_full_nwp_weight", True)
        self.sampling_probability = 0.0
        self._accumulated_sampling_prob = 0.0
        self._degradation_timestep = 0.2
        self._inflation_factor_obs_tmp = 1.0

    def get_inflation_factor_obs(self):
        """Effective observation inflation factor; reaches ~0 when the
        accumulated sampling probability saturates (reference:
        ens_kalman_filter_methods.py:628-635) — the full-NWP-weight
        switch tests this against 0.02."""
        return self._inflation_factor_obs_tmp

    def correct_step(self, background_ensemble, observation_ensemble,
                     resampled_forecast=None, rng_key=None):
        """Rainy-pixel selection + Lien criterion + PCA-reduced Kalman
        update (reference: :452-628; Nerini 2019).

        All arrays: (n_ens, m, n).  Returns ``(analysis, resampled)``: the
        nowcast ensemble with the analysis patched into the rainy-pixel
        set, and the sampling-probability-resampled matching target (None
        when iterative probability matching is off)."""
        from pysteps_tpu.postprocessing.probmatching import (
            resample_distributions,
        )
        from pysteps_tpu.utils.pca import pca_backtransform, pca_transform

        background_ensemble = np.asarray(background_ensemble, np.float32)
        observation_ensemble = np.asarray(observation_ensemble, np.float32)
        n_ens = background_ensemble.shape[0]
        shape2d = background_ensemble.shape[1:]
        bg_flat = background_ensemble.reshape(n_ens, -1)
        obs_flat = observation_ensemble.reshape(n_ens, -1)

        # rainy-pixel selection: grid boxes where either ensemble rains
        # (reference: :484-487)
        idx_prec = self.get_precipitation_mask(
            bg_flat
        ) | self.get_precipitation_mask(obs_flat)
        # Lien-criterion subset, truncated onto the rainy area (:489-493)
        idx_lien = self.get_lien_criterion(bg_flat, obs_flat)[idx_prec]

        stacked = np.vstack([bg_flat, obs_flat])[:, idx_prec]
        stacked[~np.isfinite(stacked)] = self._config.norain_threshold

        # too few rainy boxes: fall back to the NWP ensemble (:506-510)
        if np.sum(idx_prec) <= stacked.shape[0]:
            return observation_ensemble, resampled_forecast

        # PCA on the stacked rainy-pixel ensembles; the Lien-masked
        # projection feeds the covariance estimates (:512-527)
        stacked_pc, pca_params = pca_transform(
            stacked, get_params=True, n_components=stacked.shape[0],
            mesh=self._mesh,
        )
        stacked_lien_pc = pca_transform(
            stacked, mask=jnp.asarray(idx_lien), pca_params=pca_params
        )

        # full-NWP-weight assurance near total NWP trust (:529-537)
        if not np.isclose(self._accumulated_sampling_prob, 1.0, rtol=1e-2):
            self._inflation_factor_obs_tmp = (
                self._inflation_factor_obs
                - self._accumulated_sampling_prob
                * (self._inflation_factor_obs - 1.0)
            )
        else:
            self._inflation_factor_obs_tmp = np.cos(self._degradation_timestep)
            self._degradation_timestep += 0.2

        analysis_pc = self.update(
            stacked_pc[:n_ens], stacked_pc[n_ens:],
            inflation_factor_bg=self._inflation_factor_bg,
            inflation_factor_obs=self._inflation_factor_obs_tmp,
            offset_bg=self._offset_bg,
            offset_obs=self._offset_obs,
            background_ensemble_valid_lien=stacked_lien_pc[:n_ens],
            observation_ensemble_valid_lien=stacked_lien_pc[n_ens:],
        )
        analysis = np.asarray(pca_backtransform(analysis_pc.T, pca_params))

        # sampling probability: effective NWP weight over the Lien subset
        # or the explained-variance-weighted Kalman gain (:555-577)
        if self._sampling_prob_source == "ensemble":
            prob = self.get_weighting_for_probability_matching(
                stacked[:n_ens][:, idx_lien],
                analysis[:, idx_lien],
                stacked[n_ens:][:, idx_lien],
            )
        elif self._sampling_prob_source == "explained_var":
            prob = float(
                np.sum(
                    np.diag(np.asarray(self.K))
                    * np.asarray(pca_params["explained_variance"])[
                        : self.K.shape[0]
                    ]
                )
            )
        else:
            raise ValueError(
                "sampling_prob_source must be 'ensemble' or 'explained_var', "
                f"got {self._sampling_prob_source}"
            )

        if self._use_accum_sampling_prob:
            self.sampling_probability = (
                1.0 - prob
            ) * self.sampling_probability + prob
        else:
            self.sampling_probability = prob
        if self._ensure_full_nwp_weight:
            self._accumulated_sampling_prob = (
                1.0 - prob
            ) * self._accumulated_sampling_prob + prob

        # resample the matching target with the dynamic weight (:598-621)
        if self._iterative_prob_matching and resampled_forecast is not None:
            import jax

            key = rng_key if rng_key is not None else jax.random.PRNGKey(0)
            resampled_forecast = np.stack(
                [
                    np.asarray(
                        resample_distributions(
                            bg_flat[j], obs_flat[j],
                            1.0 - self.sampling_probability,
                            key=jax.random.fold_in(key, j),
                        )
                    ).reshape(shape2d)
                    for j in range(n_ens)
                ]
            )

        out = background_ensemble.copy().reshape(n_ens, -1)
        out[:, idx_prec] = analysis
        return out.reshape(background_ensemble.shape), resampled_forecast
