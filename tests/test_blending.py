"""Blending tests: weight formulas (exact), linear blending ramp, and the
STEPS blending pipeline on synthetic radar + synthetic 'NWP'
(reference strategy: pysteps/tests/test_blending_steps.py 59-config
matrix, test_blending_linear_blending.py)."""

import numpy as np
import pytest

from helpers import make_synthetic_sequence
from pysteps_tpu.blending import clim, skill_scores
from pysteps_tpu.blending.steps import (
    blend_means_sigmas,
    calculate_ratios,
    calculate_weights_bps,
    calculate_weights_spn,
)
from pysteps_tpu.verification import probscores

VELOCITY = (2.0, 1.0)


def test_ratios_and_bps_weights():
    corr = np.array([[0.8, 0.5], [0.6, 0.3]])  # (components, k)
    ratios = calculate_ratios(corr)
    np.testing.assert_allclose(ratios[0, 0], 0.64 / 0.36, rtol=1e-6)
    w = calculate_weights_bps(corr)
    assert w.shape == (3, 2)
    # noise weight closes the variance budget
    np.testing.assert_allclose(
        np.sum(w[:2] ** 2, axis=0) + w[2] ** 2 <= 1.0 + 1e-6, True
    )


def test_bps_weights_single_component():
    corr = np.array([[0.7, 0.2]])
    w = calculate_weights_bps(corr)
    np.testing.assert_allclose(w[0], corr[0])
    np.testing.assert_allclose(w[1], 1 - corr[0])


def test_spn_weights():
    corr = np.array([0.8, 0.6])
    cov = np.array([[1.0, 0.5], [0.5, 1.0]])
    w = calculate_weights_spn(corr, cov)
    assert w.shape == (3,)
    assert np.all(np.isfinite(w))


def test_blend_means_sigmas():
    means = np.array([[1.0, 2.0], [3.0, 4.0]])  # (components, k)
    sigmas = np.array([[1.0, 1.0], [2.0, 2.0]])
    weights = np.array([[0.5, 0.5], [0.5, 0.5], [0.1, 0.1]])
    cm, cs = blend_means_sigmas(means, sigmas, weights)
    np.testing.assert_allclose(np.asarray(cm), [2.0, 3.0])
    np.testing.assert_allclose(np.asarray(cs), [1.5, 1.5])


def test_clim_default_skill():
    skill = clim.get_default_skill(6, 1)
    assert skill.shape == (1, 6)
    assert skill[0, 0] == 0.848
    skill10 = clim.get_default_skill(10, 2)
    assert skill10.shape == (2, 10)
    assert skill10[1, 9] == pytest.approx(1e-4)


def test_skill_save_and_clim(tmp_path):
    import datetime

    skill = np.full((1, 6), 0.5)
    t = datetime.datetime(2026, 8, 17, 12)
    clim.save_skill(skill, t, str(tmp_path))
    # not enough days -> defaults
    out = clim.calc_clim_skill(str(tmp_path), 6, 1)
    assert out.shape == (1, 6)


def test_lt_dependent_cor_nwp(tmp_path):
    rho0 = np.array([0.9, 0.8, 0.7, 0.5, 0.3, 0.1])
    rho_5 = skill_scores.lt_dependent_cor_nwp(5, rho0, str(tmp_path))
    rho_120 = skill_scores.lt_dependent_cor_nwp(120, rho0, str(tmp_path))
    clim_vals = clim.get_default_skill(6, 1)[0]
    # at long lead times the skill regresses toward climatology
    assert abs(rho_120[0] - clim_vals[0]) < abs(rho_5[0] - clim_vals[0])


def test_spatial_correlation_perfect():
    rng = np.random.RandomState(0)
    obs = rng.randn(4, 32, 32)
    rho = skill_scores.spatial_correlation(obs, obs.copy(), np.zeros((32, 32), bool))
    np.testing.assert_allclose(rho, 1.0, atol=1e-4)


@pytest.fixture(scope="module")
def blending_data():
    frames = make_synthetic_sequence(
        n_frames=9, shape=(128, 128), velocity=VELOCITY, seed=1
    )
    db = np.where(
        frames >= 0.1, 10 * np.log10(np.maximum(frames, 0.1)), -15.0
    ).astype(np.float32)
    velocity = np.zeros((2, 128, 128), np.float32)
    velocity[0], velocity[1] = VELOCITY
    # synthetic "NWP": the true future fields, slightly degraded
    rng = np.random.RandomState(7)
    nwp = db[2:9].copy() + 0.5 * rng.randn(7, 128, 128).astype(np.float32)
    return db, velocity, nwp


@pytest.mark.parametrize(
    "weights_method,mask_method,probmatching,resample",
    [
        ("bps", "incremental", "cdf", True),
        ("bps", "obs", "mean", False),
        ("spn", "incremental", "cdf", False),
        ("bps", None, None, False),
    ],
)
def test_steps_blending(blending_data, weights_method, mask_method, probmatching, resample):
    from pysteps_tpu import blending

    db, velocity, nwp = blending_data
    fc = blending.get_method("steps")(
        db[:3], nwp[None], velocity, velocity[None], 3, 5,
        n_ens_members=4, n_cascade_levels=6,
        precip_thr=-10.0, kmperpixel=1.0,
        weights_method=weights_method,
        mask_method=mask_method,
        probmatching_method=probmatching,
        resample_distribution=resample,
        seed=42,
    )
    fc = np.asarray(fc)
    assert fc.shape == (4, 3, 128, 128)
    assert np.all(np.isfinite(fc))
    crps = probscores.CRPS(fc[:, -1], db[5])
    assert crps < 3.0, f"blended CRPS {crps}"


def test_steps_blending_multimodel(blending_data):
    from pysteps_tpu import blending

    db, velocity, nwp = blending_data
    nwp2 = np.stack([nwp, nwp + 0.3])
    fc = np.asarray(
        blending.get_method("steps")(
            db[:3], nwp2, velocity, np.stack([velocity, velocity]), 2, 5,
            n_ens_members=4, precip_thr=-10.0, kmperpixel=1.0, seed=1,
        )
    )
    assert fc.shape == (4, 2, 128, 128)


def test_linear_blending(blending_data):
    from pysteps_tpu import blending

    db, velocity, nwp = blending_data
    meta = {"transform": "dB", "unit": "mm/h", "threshold": -10.0, "zerovalue": -15.0}
    fc = blending.get_method("linear_blending")(
        db[2], meta, velocity, 4, 5, "extrapolation",
        precip_nwp=10.0 ** (nwp[:4] / 10.0),
        start_blending=5, end_blending=15,
    )
    fc = np.asarray(fc)
    assert fc.shape == (4, 128, 128)
    # last step should be (nearly) pure NWP
    np.testing.assert_allclose(
        fc[-1], 10.0 ** (nwp[3] / 10.0), atol=1e-3
    )


def test_salient_blending(blending_data):
    from pysteps_tpu import blending

    db, velocity, nwp = blending_data
    meta = {"transform": "dB", "unit": "mm/h", "threshold": -10.0, "zerovalue": -15.0}
    fc = np.asarray(
        blending.get_method("salient_blending")(
            db[2], meta, velocity, 3, 5, "extrapolation",
            precip_nwp=10.0 ** (nwp[:3] / 10.0),
            start_blending=5, end_blending=20,
        )
    )
    assert fc.shape == (3, 128, 128)
    assert np.all(np.isfinite(fc))


def test_enkf_update_reduces_spread_toward_obs():
    from pysteps_tpu.blending.ens_kalman_filter_methods import EnsembleKalmanFilter

    class Cfg:
        n_ens_members = 8

    class Params:
        combination_kwargs = {}

    rng = np.random.RandomState(0)
    enkf = EnsembleKalmanFilter(Cfg(), Params())
    bg = rng.randn(8, 10) + 5.0
    obs = rng.randn(8, 10) * 0.1  # tight observation around 0
    analysis = np.asarray(enkf.update(bg, obs)).T
    # the analysis mean moves from the background towards the observation
    assert abs(analysis.mean()) < abs(bg.mean())


def test_masked_enkf_lien_criterion_changes_analysis():
    """The Lien et al. (2013) member-validity selection: covariances are
    estimated only from grid boxes where >= n_lien members of BOTH
    ensembles rain, so a partly-dry ensemble yields a different analysis
    with the criterion on vs off (reference:
    ens_kalman_filter_methods.py:302-357,489-527)."""
    import jax

    from pysteps_tpu.blending.ens_kalman_filter_methods import MaskedEnKF

    class Cfg:
        n_ens_members = 6
        precip_threshold = 0.5
        norain_threshold = 0.0

    rng = np.random.RandomState(7)
    E, m, n = 6, 16, 16
    bg = np.abs(rng.gamma(2.0, 2.0, (E, m, n))).astype(np.float32)
    obs = np.abs(rng.gamma(2.0, 2.5, (E, m, n))).astype(np.float32)
    # half the background members are dry over the right half of the
    # domain -> the Lien criterion excludes those boxes from the
    # covariance estimate
    bg[: E // 2, :, n // 2:] = 0.0

    def run(lien):
        class Params:
            combination_kwargs = {
                "lien_criterion": lien, "n_lien": E - 1,
                "iterative_prob_matching": False,
            }

        enkf = MaskedEnKF(Cfg(), Params())
        analysis, _ = enkf.correct_step(
            bg.copy(), obs.copy(), rng_key=jax.random.PRNGKey(0)
        )
        return np.asarray(analysis), enkf

    with_lien, enkf_on = run(True)
    without_lien, _ = run(False)
    assert with_lien.shape == (E, m, n)
    assert np.max(np.abs(with_lien - without_lien)) > 1e-3
    assert 0.0 <= enkf_on.sampling_probability <= 1.0

    # degenerate rainy area: falls back to the NWP ensemble
    bg_dry = np.zeros((E, m, n), np.float32)
    bg_dry[:, 0, 0] = 1.0
    obs_dry = np.zeros((E, m, n), np.float32)
    analysis, _ = MaskedEnKF(
        Cfg(), type("P", (), {"combination_kwargs": {}})()
    ).correct_step(bg_dry, obs_dry)
    np.testing.assert_allclose(analysis, obs_dry)


def test_pca_enkf_forecast(blending_data):
    from pysteps_tpu.blending import pca_ens_kalman_filter

    db, velocity, nwp = blending_data
    nwp_ens = np.stack([nwp[:3], nwp[:3] + 0.2])
    fc = np.asarray(
        pca_ens_kalman_filter.forecast(
            db[:3], None, nwp_ens, None, velocity, 3,
            n_ens_members=4, precip_thr=-10.0, seed=42,
        )
    )
    # reference contract: the output series starts at t0 (the analysis),
    # so a 3-step horizon yields 4 frames
    assert fc.shape == (4, 4, 128, 128)
    assert np.all(np.isfinite(fc))
    crps = probscores.CRPS(fc[:, -1], db[5])
    assert crps < 3.0


def test_steps_blending_external_nowcast(blending_data):
    from pysteps_tpu import blending, nowcasts

    db, velocity, nwp = blending_data
    external = np.asarray(
        nowcasts.get_method("steps")(
            db[:3], velocity, 3, n_ens_members=4, precip_thr=-10.0,
            kmperpixel=1.0, timestep=5, seed=3,
        )
    )
    fc = np.asarray(
        blending.get_method("steps")(
            db[:3], nwp[None], velocity, velocity[None], 3, 5,
            n_ens_members=4, precip_thr=-10.0, kmperpixel=1.0, seed=42,
            precip_nowcast=external,
        )
    )
    assert fc.shape == (4, 3, 128, 128)
    assert np.all(np.isfinite(fc))
    crps = probscores.CRPS(fc[:, -1], db[5])
    assert crps < 3.0


@pytest.mark.parametrize(
    "kwargs",
    [
        # smooth radar mask transition (reference: test_blending_steps.py
        # smooth_radar_mask_range configs)
        dict(smooth_radar_mask_range=40),
        # velocity perturbation
        dict(vel_pert_method="bps", timestep=5),
        # blend every NWP member into every ensemble member
        dict(blend_nwp_members=True),
        # single-member ensemble
        dict(n_ens_members=1),
        # SPN weights with distribution resampling
        dict(weights_method="spn", resample_distribution=True),
        # irregular timestep list
        dict(timesteps=[1, 2, 3]),
    ],
)
def test_steps_blending_matrix(blending_data, kwargs):
    """Representative slice of the reference's 59-config blending matrix
    (reference: pysteps/tests/test_blending_steps.py:31-80)."""
    from pysteps_tpu import blending

    db, velocity, nwp = blending_data
    kwargs = dict(kwargs)
    timesteps = kwargs.pop("timesteps", 3)
    n_ens = kwargs.pop("n_ens_members", 4)
    nwp_in = nwp[None]
    vel_in = velocity[None]
    if kwargs.get("blend_nwp_members"):
        rng = np.random.RandomState(3)
        nwp_in = np.stack([nwp, nwp + 0.3 * rng.randn(*nwp.shape).astype(np.float32)])
        vel_in = np.stack([velocity, velocity])
    fc = blending.get_method("steps")(
        db[:3], nwp_in, velocity, vel_in, timesteps, kwargs.pop("timestep", 5),
        n_ens_members=n_ens, n_cascade_levels=6,
        precip_thr=-10.0, kmperpixel=1.0, seed=42, **kwargs,
    )
    fc = np.asarray(fc)
    n_t = len(timesteps) if isinstance(timesteps, list) else timesteps
    assert fc.shape == (n_ens, n_t, 128, 128)
    assert np.all(np.isfinite(fc))
    crps = probscores.CRPS(fc[:, -1], db[5])
    assert crps < 3.0, f"blended CRPS {crps}"


def test_steps_blending_zero_radar(blending_data):
    """All-dry radar with live NWP: forecast should lean on NWP and stay
    finite (reference matrix's zero_radar cases)."""
    from pysteps_tpu import blending

    db, velocity, nwp = blending_data
    dry = np.full_like(db[:3], -15.0)
    fc = np.asarray(
        blending.get_method("steps")(
            dry, nwp[None], velocity, velocity[None], 2, 5,
            n_ens_members=2, n_cascade_levels=6,
            precip_thr=-10.0, kmperpixel=1.0, seed=42,
        )
    )
    assert fc.shape == (2, 2, 128, 128)
    assert np.all(np.isfinite(fc))


def test_steps_blending_zero_nwp(blending_data):
    """All-dry NWP with live radar: extrapolation keeps the forecast wet at
    early lead times (reference matrix's zero_nwp cases)."""
    from pysteps_tpu import blending

    db, velocity, nwp = blending_data
    dry_nwp = np.full_like(nwp, -15.0)
    fc = np.asarray(
        blending.get_method("steps")(
            db[:3], dry_nwp[None], velocity, velocity[None], 2, 5,
            n_ens_members=2, n_cascade_levels=6,
            precip_thr=-10.0, kmperpixel=1.0, seed=42,
        )
    )
    assert fc.shape == (2, 2, 128, 128)
    assert np.all(np.isfinite(fc))
    assert (fc[:, 0] > -10.0).mean() > 0.01


def test_steps_blending_end_weights(blending_data):
    """timestep_start_full_nwp_weight forces the forecast toward the NWP
    fields at the last lead times (reference: blending/steps.py:143-150)."""
    from pysteps_tpu import blending

    db, velocity, nwp = blending_data
    fc = blending.get_method("steps")(
        db[:3], nwp[None], velocity, velocity[None], 4, 5,
        n_ens_members=2, n_cascade_levels=6,
        precip_thr=-10.0, kmperpixel=1.0,
        timestep_start_full_nwp_weight=1,
        noise_method=None, vel_pert_method=None,
        mask_method=None, probmatching_method=None,
        seed=42,
    )
    fc = np.asarray(fc)
    assert fc.shape == (2, 4, 128, 128)
    # by the final step the blend must be closer to NWP than at step 1
    err_first = np.abs(fc[:, 0] - nwp[1]).mean()
    err_last = np.abs(fc[:, -1] - nwp[4]).mean()
    assert err_last < err_first

    with pytest.raises(ValueError):
        blending.get_method("steps")(
            db[:3], nwp[None], velocity, velocity[None], 3, 5,
            n_ens_members=2, precip_thr=-10.0, kmperpixel=1.0,
            timestep_start_full_nwp_weight=5, seed=42,
        )
    with pytest.raises(ValueError):
        blending.get_method("steps")(
            db[:3], nwp[None], velocity, velocity[None], 3, 5,
            n_ens_members=2, precip_thr=-10.0, kmperpixel=1.0,
            nowcasting_method="external_nowcast", seed=42,
        )


def test_multivariate_autocorrelation_localized():
    from pysteps_tpu.timeseries import correlation

    rng = np.random.RandomState(3)
    x = rng.randn(3, 2, 32, 32).astype(np.float32)
    gamma = correlation.temporal_autocorrelation_multivariate(
        x, window="gaussian", window_radius=8.0
    )
    assert len(gamma) == 3
    assert gamma[0].shape == (32, 32, 2, 2)
    # lag-0 diagonal is a self-correlation: ~1 everywhere
    np.testing.assert_allclose(np.asarray(gamma[0])[..., 0, 0], 1.0, atol=1e-3)


def test_steps_blending_shiftpath_equivalence(blending_data):
    """The shift-decomposition / coarse-displacement fast path (enabled on
    TPU by a static max_disp bound; forced here via extrap_kwargs) must
    reproduce the exact-gather path: under the uniform test flow the two
    warps are mathematically identical."""
    from pysteps_tpu import blending

    db, velocity, nwp = blending_data
    common = dict(
        n_ens_members=2, n_cascade_levels=5, precip_thr=-10.0,
        kmperpixel=1.0, seed=11,
    )
    f = blending.get_method("steps")
    fc_exact = np.asarray(
        f(db[:3], nwp[None], velocity, velocity[None], 2, 5, **common)
    )
    fc_fast = np.asarray(
        f(db[:3], nwp[None], velocity, velocity[None], 2, 5,
          extrap_kwargs={"max_disp": 8}, **common)
    )
    assert fc_fast.shape == fc_exact.shape
    # identical RNG streams: any difference comes from the warp scheme
    assert np.nanmean(np.abs(fc_fast - fc_exact)) < 0.05
    assert np.nanmax(np.abs(fc_fast - fc_exact)) < 2.0


def test_steps_blending_velocity_perturbation(blending_data):
    """vel_pert_method='bps' perturbs each member's advection field
    (reference: blending/steps.py velocity perturbation via noise/motion)."""
    from pysteps_tpu import blending

    db, velocity, nwp = blending_data
    common = dict(
        n_ens_members=3, n_cascade_levels=5, precip_thr=-10.0,
        kmperpixel=1.0, seed=5, noise_method=None,
        mask_method=None, probmatching_method=None,
    )
    f = blending.get_method("steps")
    fc = np.asarray(
        f(db[:3], nwp[None], velocity, velocity[None], 3, 5,
          vel_pert_method="bps", **common)
    )
    assert fc.shape == (3, 3, 128, 128)
    assert np.all(np.isfinite(fc))
    fc_nopert = np.asarray(
        f(db[:3], nwp[None], velocity, velocity[None], 3, 5,
          vel_pert_method=None, **common)
    )
    # without noise, members differ only through the velocity perturbation
    spread_pert = np.mean(np.std(fc, axis=0))
    spread_nopert = np.mean(np.std(fc_nopert, axis=0))
    assert spread_pert > spread_nopert + 1e-4


def test_steps_blending_parametric_noise(blending_data):
    """Parametric (power-law) noise through blending: the full-fft filter
    must be sliced to the rfft half-plane the scan multiplies (r4 fix —
    previously a shape error), and the device-path fit must run."""
    from pysteps_tpu import blending

    db, velocity, nwp = blending_data
    fc = np.asarray(
        blending.get_method("steps")(
            db[:3], nwp[None], velocity, velocity[None], 2, 5,
            n_ens_members=2, n_cascade_levels=6,
            precip_thr=-10.0, kmperpixel=1.0,
            noise_method="parametric", seed=42,
        )
    )
    assert fc.shape == (2, 2, 128, 128)
    assert np.all(np.isfinite(fc))
    crps = probscores.CRPS(fc[:, -1], db[4])
    assert crps < 3.0, f"parametric blended CRPS {crps}"


def test_blending_outer_member_chunk_matches(monkeypatch, sequence_db=None):
    """The memory-desperate outer member-chunk path (bf16 output, pooled
    velocities, bf16 NWP cascades) must reproduce the unchunked forecast
    within bf16 output resolution."""
    import numpy as np

    from pysteps_tpu import blending
    from tests.helpers import make_synthetic_sequence

    frames = np.asarray(
        make_synthetic_sequence(n_frames=3, shape=(64, 64),
                                velocity=(1.0, 0.5), seed=5)
    )
    db = (10 * np.log10(np.maximum(frames, 0.01) / 0.01) - 10.0).astype(
        np.float32
    )
    velocity = np.zeros((2, 64, 64), np.float32)
    velocity[0], velocity[1] = 1.0, 0.5
    rng = np.random.RandomState(2)
    nwp = np.repeat(db[-1][None], 4, axis=0)[None] + 0.3 * rng.randn(
        1, 4, 64, 64
    ).astype(np.float32)
    kwargs = dict(
        n_ens_members=4, n_cascade_levels=4, precip_thr=-10.0,
        kmperpixel=1.0, seed=9, noise_method="nonparametric",
        vel_pert_method=None,
    )
    ref = np.asarray(
        blending.steps.forecast(db, nwp, velocity, velocity[None], 3, 5.0,
                                **kwargs)
    )
    monkeypatch.setenv("PYSTEPS_TPU_OUTER_CHUNK_BYTES", "1")
    out = np.asarray(
        blending.steps.forecast(
            db, nwp, velocity, velocity[None], 3, 5.0,
            output_dtype="bfloat16", member_chunk=2, **kwargs,
        )
    ).astype(np.float32)
    assert out.shape == ref.shape
    # bf16 output resolution ~0.4% of magnitude; NWP-cascade bf16 storage
    # adds a comparable perturbation before CDF matching re-anchors
    span = np.nanmax(ref) - np.nanmin(ref)
    d = np.nanmax(np.abs(np.nan_to_num(out) - np.nan_to_num(ref)))
    assert d < 0.05 * max(span, 1.0), d
