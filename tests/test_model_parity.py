"""Model-level head-to-head quality parity against the imported reference.

Runs reference pysteps and pysteps_tpu end-to-end on the same synthetic
sequences with the same configs and asserts the repo's skill score is
within a tight delta of the *reference's own score* (relative bound, not
an absolute one) — the quality bar the reference's CI defines via its
skill-threshold suite (pysteps/tests/test_nowcasts_steps.py:115-116,
test_blending_steps.py:31-80).  The measured delta table is emitted as
MODEL_PARITY.json at module teardown.
"""

import datetime
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from helpers import make_synthetic_sequence

pytestmark = pytest.mark.parity

pysteps = None
RESULTS = {}

SHAPE = (128, 128)
VEL = (2.0, 1.0)
N_LEADS = 4
SCORE_LEAD = 3  # t=+4 steps, the hardest lead scored


def setup_module():
    global pysteps
    import benchtools

    pysteps = benchtools.import_reference_pysteps()
    if pysteps is None:
        pytest.skip("reference pysteps unavailable")


def teardown_module():
    if RESULTS:
        path = os.path.join(os.path.dirname(__file__), "..", "MODEL_PARITY.json")
        existing = {}
        if os.path.exists(path):
            try:
                with open(path) as f:
                    existing = json.load(f)
            except Exception:  # noqa: BLE001
                existing = {}
        existing.update(RESULTS)
        with open(path, "w") as f:
            json.dump(existing, f, indent=2, sort_keys=True)


def _record(model, metric, ref, mine, tol):
    delta_rel = float((mine - ref) / abs(ref)) if ref != 0 else float(mine)
    RESULTS[model] = {
        "metric": metric,
        "ref": float(ref),
        "mine": float(mine),
        "delta_rel": delta_rel,
        "tol_rel": tol,
    }
    return delta_rel


def _dispersion_stats(ens_list, obs):
    """Spread-error ratio + rank-histogram deviation over a list of
    same-size ensembles (one per seed), using the repo's own ensemble
    verification (reference bar: pysteps/verification/ensscores.py:157-253).

    spread-error ratio: mean pixelwise ensemble std / RMSE of the
    ensemble mean (1.0 = perfectly dispersive).  rankhist deviation:
    total-variation distance of the rank histogram from uniform."""
    from pysteps_tpu.verification import ensscores

    ratios = []
    rh = ensscores.rankhist_init(np.asarray(ens_list[0]).shape[0], X_min=0.1)
    np.random.seed(0)  # rankhist tie-breaking
    for ens in ens_list:
        ens = np.asarray(ens)
        spread = float(np.nanmean(np.nanstd(ens, axis=0, ddof=1)))
        err = float(
            np.sqrt(np.nanmean((np.nanmean(ens, axis=0) - obs) ** 2))
        )
        ratios.append(spread / max(err, 1e-12))
        ensscores.rankhist_accum(rh, ens, obs)
    p = ensscores.rankhist_compute(rh)
    flat_dev = 0.5 * float(np.sum(np.abs(p - 1.0 / len(p))))
    return float(np.mean(ratios)), flat_dev


def _record_dispersion(model, ref_list, my_list, obs, tol_ratio=0.30,
                       tol_rankdev=0.15):
    """Two-sided dispersion parity: the ensemble must be *as dispersive
    as the reference's*, not merely score a good CRPS — an under- or
    over-dispersed ensemble can game a one-sided CRPS bound."""
    r_ref, f_ref = _dispersion_stats(ref_list, obs)
    r_my, f_my = _dispersion_stats(my_list, obs)
    RESULTS.setdefault(model, {})["dispersion"] = {
        "spread_error_ref": r_ref,
        "spread_error_mine": r_my,
        "rankhist_dev_ref": f_ref,
        "rankhist_dev_mine": f_my,
    }
    assert abs(r_my - r_ref) / max(abs(r_ref), 1e-9) < tol_ratio, (
        f"{model} spread-error ratio {r_my:.3f} vs ref {r_ref:.3f}"
    )
    assert abs(f_my - f_ref) < tol_rankdev, (
        f"{model} rank-histogram deviation {f_my:.3f} vs ref {f_ref:.3f}"
    )


@pytest.fixture(scope="module")
def sequence():
    # evolution > 0 adds genuine (unpredictable) growth/decay: on a pure
    # advection sequence an exact Lagrangian model scores ~0 error and
    # parity degenerates to comparing boundary artifacts
    frames = make_synthetic_sequence(
        n_frames=10, shape=SHAPE, velocity=VEL, seed=7, evolution=0.2
    )
    velocity = np.stack(
        [np.full(SHAPE, VEL[0]), np.full(SHAPE, VEL[1])]
    )
    return frames, velocity


def _to_db(x):
    out = 10.0 * np.log10(np.maximum(x, 1e-6))
    out[x < 0.1] = -15.0
    return out


def _from_db(x):
    x = np.asarray(x)
    return 10.0 ** (x / 10.0) * (x > -10)


def _rmse(fc, obs):
    return float(np.sqrt(np.nanmean((np.asarray(fc) - obs) ** 2)))


def _csi(fc, obs, thr=0.1):
    fc = np.asarray(fc)
    hits = np.sum((fc >= thr) & (obs >= thr))
    return float(hits / max(np.sum((fc >= thr) | (obs >= thr)), 1))


def _crps(ens, obs):
    return float(pysteps.verification.probscores.CRPS(np.asarray(ens), obs))


def test_sprog_parity(sequence):
    frames, velocity = sequence
    db = _to_db(frames)
    truth = frames[3 + SCORE_LEAD]
    kw = dict(n_cascade_levels=6, precip_thr=-10.0)

    ref_fc = pysteps.nowcasts.get_method("sprog")(db[:3], velocity, N_LEADS, **kw)
    import pysteps_tpu

    my_fc = pysteps_tpu.nowcasts.get_method("sprog")(db[:3], velocity, N_LEADS, **kw)

    r_ref = _rmse(_from_db(ref_fc[SCORE_LEAD]), truth)
    r_mine = _rmse(_from_db(np.asarray(my_fc)[SCORE_LEAD]), truth)
    delta = _record("sprog", "rmse@t4", r_ref, r_mine, 0.05)
    assert abs(delta) < 0.05, f"S-PROG RMSE {r_mine:.4f} vs ref {r_ref:.4f}"
    c_ref = _csi(_from_db(ref_fc[SCORE_LEAD]), truth)
    c_mine = _csi(_from_db(np.asarray(my_fc)[SCORE_LEAD]), truth)
    assert c_mine >= c_ref - 0.02


def test_anvil_parity(sequence):
    frames, velocity = sequence
    truth = frames[4 + SCORE_LEAD]
    kw = dict(n_cascade_levels=8, ar_window_radius=25)

    ref_fc = pysteps.nowcasts.get_method("anvil")(frames[:4], velocity, N_LEADS, **kw)
    import pysteps_tpu

    my_fc = pysteps_tpu.nowcasts.get_method("anvil")(frames[:4], velocity, N_LEADS, **kw)

    r_ref = _rmse(ref_fc[SCORE_LEAD], truth)
    r_mine = _rmse(np.asarray(my_fc)[SCORE_LEAD], truth)
    delta = _record("anvil", "rmse@t4", r_ref, r_mine, 0.05)
    assert abs(delta) < 0.05, f"ANVIL RMSE {r_mine:.4f} vs ref {r_ref:.4f}"


def _crps_all_leads(ens4d):
    """Mean CRPS over every lead — single-lead, small-ensemble CRPS is
    dominated by Monte Carlo noise (measured per-seed delta sd ~9% at 6
    members/1 lead vs ~2.6% at 20 members/4 leads; ref and repo use
    different RNG streams, so that noise never cancels)."""
    ens4d = np.asarray(ens4d)
    return float(np.mean([
        _crps(ens4d[:, L], frames_global[3 + L]) for L in range(N_LEADS)
    ]))


frames_global = None


def test_steps_parity(sequence):
    global frames_global
    frames, velocity = sequence
    frames_global = frames
    db = _to_db(frames)
    truth = frames[3 + SCORE_LEAD]
    kw = dict(
        n_ens_members=20, n_cascade_levels=6, precip_thr=-10.0,
        kmperpixel=1.0, timestep=5, noise_method="nonparametric",
        vel_pert_method=None, mask_method="incremental",
        probmatching_method="cdf",
    )
    import pysteps_tpu

    refs, mins = [], []
    ref_ens, my_ens = [], []
    for seed in (11, 22, 33):
        fr = pysteps.nowcasts.get_method("steps")(db[:3], velocity, N_LEADS, seed=seed, **kw)
        fm = pysteps_tpu.nowcasts.get_method("steps")(db[:3], velocity, N_LEADS, seed=seed, **kw)
        ref_ens.append(_from_db(fr)[:, SCORE_LEAD])
        my_ens.append(_from_db(fm)[:, SCORE_LEAD])
        refs.append(_crps_all_leads(_from_db(fr)))
        mins.append(_crps_all_leads(_from_db(fm)))
    c_ref, c_mine = float(np.mean(refs)), float(np.mean(mins))
    delta = _record("steps", "crps@all-leads(20m,mean3seeds)", c_ref, c_mine, 0.08)
    assert abs(delta) < 0.08, f"STEPS CRPS {c_mine:.4f} vs ref {c_ref:.4f}"
    _record_dispersion("steps", ref_ens, my_ens, truth)


@pytest.mark.parametrize(
    "mask_method,probmatching,domain",
    [
        (None, None, "spatial"),          # BASELINE row: no mask / no PM
        ("sprog", None, "spatial"),       # BASELINE row: sprog mask
        ("incremental", "mean", "spatial"),  # BASELINE row: mean PM
        ("incremental", "cdf", "spectral"),  # BASELINE row: spectral domain
    ],
)
def test_steps_config_parity(sequence, mask_method, probmatching, domain):
    """Per-config STEPS quality deltas matching the reference CI's config
    matrix (pysteps/tests/test_nowcasts_steps.py:21-30)."""
    frames, velocity = sequence
    db = _to_db(frames)
    truth = frames[3 + SCORE_LEAD]
    global frames_global
    frames_global = frames
    kw = dict(
        n_ens_members=20, n_cascade_levels=6, precip_thr=-10.0,
        kmperpixel=1.0, timestep=5, noise_method="nonparametric",
        vel_pert_method=None, mask_method=mask_method,
        probmatching_method=probmatching, domain=domain,
    )
    import pysteps_tpu

    # The reference's spectral mode decomposes noise with
    # compact_output=True, truncating filter-tail coefficients: its own
    # spectral ensembles are under-dispersed relative to its spatial mode
    # (measured: spread 4.92 vs 7.14 on this sequence, CRPS 3.47 vs 3.16
    # — pysteps/cascade/decomposition.py:240-243 truncation feeding
    # nowcasts/steps.py:1148-1170).  Our spectral design keeps full
    # spectral levels, so spectral==spatial on our side; the honest
    # two-sided quality bar for the spectral row is therefore the
    # reference's SPATIAL score (bounding against its degraded spectral
    # score would *require* replicating a reference-side quality loss).
    ref_kw = dict(kw, domain="spatial") if domain == "spectral" else kw
    refs, mins = [], []
    for seed in (11, 22):
        fr = pysteps.nowcasts.get_method("steps")(
            db[:3], velocity, N_LEADS, seed=seed, **ref_kw
        )
        fm = pysteps_tpu.nowcasts.get_method("steps")(
            db[:3], velocity, N_LEADS, seed=seed, **kw
        )
        refs.append(_crps_all_leads(_from_db(fr)))
        mins.append(_crps_all_leads(_from_db(fm)))
    c_ref, c_mine = float(np.mean(refs)), float(np.mean(mins))
    name = f"steps[{mask_method}-{probmatching}-{domain}]"
    metric = "crps@all-leads(20m,mean2seeds)"
    if domain == "spectral":
        metric += " vs ref-spatial (ref spectral self-degrades: compact_output truncation)"
    delta = _record(name, metric, c_ref, c_mine, 0.10)
    assert abs(delta) < 0.10, f"{name} CRPS {c_mine:.4f} vs ref {c_ref:.4f}"


def test_sseps_parity(sequence):
    global frames_global
    frames, velocity = sequence
    frames_global = frames
    db = _to_db(frames)
    truth = frames[3 + SCORE_LEAD]
    meta = {
        "accutime": 5, "unit": "dBZ", "transform": "dB", "zerovalue": -15.0,
        "threshold": -10.0, "xpixelsize": 1000.0, "ypixelsize": 1000.0,
    }
    kw = dict(
        n_ens_members=6, n_cascade_levels=6, win_size=64, overlap=0.3,
        vel_pert_method=None,
    )
    import pysteps_tpu

    refs, mins = [], []
    ref_ens, my_ens = [], []
    # 5 seeds: the 2-seed estimate varied by several percent between
    # runs — more than the actual implementation delta
    for seed in (11, 22, 33, 44, 55):
        fr = pysteps.nowcasts.get_method("sseps")(
            db[:3], dict(meta), velocity, N_LEADS, seed=seed, **kw
        )
        fm = pysteps_tpu.nowcasts.get_method("sseps")(
            db[:3], dict(meta), velocity, N_LEADS, seed=seed, **kw
        )
        ref_ens.append(_from_db(fr)[:, SCORE_LEAD])
        my_ens.append(_from_db(fm)[:, SCORE_LEAD])
        refs.append(_crps_all_leads(_from_db(fr)))
        mins.append(_crps_all_leads(_from_db(fm)))
    c_ref, c_mine = float(np.mean(refs)), float(np.mean(mins))
    delta = _record("sseps", "crps@all-leads(mean5seeds)", c_ref, c_mine, 0.12)
    assert abs(delta) < 0.12, f"SSEPS CRPS {c_mine:.4f} vs ref {c_ref:.4f}"
    _record_dispersion("sseps", ref_ens, my_ens, truth)


def test_linda_deterministic_parity(sequence):
    frames, velocity = sequence
    truth = frames[3 + SCORE_LEAD]
    kw = dict(feature_method="domain", add_perturbations=False)
    import pysteps_tpu

    ref_fc = pysteps.nowcasts.get_method("linda")(frames[:3], velocity, N_LEADS, **kw)
    my_fc = pysteps_tpu.nowcasts.get_method("linda")(frames[:3], velocity, N_LEADS, **kw)

    r_ref = _rmse(ref_fc[SCORE_LEAD], truth)
    r_mine = _rmse(np.asarray(my_fc)[SCORE_LEAD], truth)
    delta = _record("linda_det", "rmse@t4", r_ref, r_mine, 0.08)
    assert abs(delta) < 0.08, f"LINDA det RMSE {r_mine:.4f} vs ref {r_ref:.4f}"


def test_linda_probabilistic_parity(sequence):
    frames, velocity = sequence
    truth = frames[3 + SCORE_LEAD]
    global frames_global
    frames_global = frames
    kw = dict(
        feature_method="domain", add_perturbations=True, n_ens_members=10,
        vel_pert_method=None, kmperpixel=1.0, timestep=5, seed=42,
    )
    import pysteps_tpu

    ref_fc = pysteps.nowcasts.get_method("linda")(frames[:3], velocity, N_LEADS, **kw)
    my_fc = pysteps_tpu.nowcasts.get_method("linda")(frames[:3], velocity, N_LEADS, **kw)

    c_ref = _crps_all_leads(np.asarray(ref_fc))
    c_mine = _crps_all_leads(np.asarray(my_fc))
    delta = _record("linda_prob", "crps@all-leads(10m)", c_ref, c_mine, 0.15)
    assert abs(delta) < 0.15, f"LINDA prob CRPS {c_mine:.4f} vs ref {c_ref:.4f}"
    _record_dispersion(
        "linda_prob",
        [np.asarray(ref_fc)[:, SCORE_LEAD]],
        [np.asarray(my_fc)[:, SCORE_LEAD]],
        truth,
    )


def test_lagrangian_probability_parity(sequence):
    frames, velocity = sequence
    import pysteps_tpu

    ref_fc = pysteps.nowcasts.get_method("lagrangian_probability")(
        frames[2], velocity, N_LEADS, threshold=1.0, slope=2
    )
    my_fc = pysteps_tpu.nowcasts.get_method("lagrangian_probability")(
        frames[2], velocity, N_LEADS, threshold=1.0, slope=2
    )
    # fully deterministic: probability fields must agree almost everywhere
    diff = np.nanmean(np.abs(np.asarray(my_fc) - np.asarray(ref_fc)))
    RESULTS["lagrangian_probability"] = {
        "metric": "mean|P_mine - P_ref|", "ref": 0.0, "mine": float(diff),
        "delta_rel": float(diff), "tol_rel": 0.02,
    }
    assert diff < 0.02


def test_blending_parity(sequence):
    frames, velocity = sequence
    db = _to_db(frames)
    truth = frames[3 + SCORE_LEAD]

    # synthetic NWP: the future truth advected fields, smoothed + biased —
    # a "useful but imperfect" model forecast, in dB units
    from scipy.ndimage import gaussian_filter

    nwp = np.stack([
        gaussian_filter(frames[3 + t], 3.0) * 1.1 for t in range(N_LEADS + 1)
    ])
    nwp_db = _to_db(nwp)[None]  # (1 model, T+1, m, n)
    nwp_vel = np.broadcast_to(
        velocity[None, None], (1, N_LEADS + 1) + velocity.shape
    ).copy()

    kw = dict(
        timesteps=N_LEADS, timestep=5.0,
        issuetime=datetime.datetime(2021, 12, 1, 23, 55),
        n_ens_members=6, n_cascade_levels=6, blend_nwp_members=False,
        precip_thr=-10.0, kmperpixel=1.0, noise_method="nonparametric",
        noise_stddev_adj="auto", ar_order=2, vel_pert_method=None,
        weights_method="bps", probmatching_method="cdf",
        mask_method="incremental", resample_distribution=True,
        smooth_radar_mask_range=0, seed=42, fft_method="numpy",
        outdir_path_skill=None,
    )
    import pysteps_tpu

    ref_kw = dict(kw)
    os.makedirs("./tmp_skill_ref/", exist_ok=True)
    ref_kw["outdir_path_skill"] = "./tmp_skill_ref/"
    fr = pysteps.blending.steps.forecast(
        precip=db[:3], precip_models=nwp_db, velocity=velocity,
        velocity_models=nwp_vel, **ref_kw
    )
    fm = pysteps_tpu.blending.steps.forecast(
        precip=db[:3], precip_models=nwp_db, velocity=velocity,
        velocity_models=nwp_vel, **kw
    )
    global frames_global
    frames_global = frames
    c_ref = _crps_all_leads(_from_db(fr))
    c_mine = _crps_all_leads(_from_db(fm))
    delta = _record("blending_steps", "crps@all-leads", c_ref, c_mine, 0.12)
    assert abs(delta) < 0.12, f"blending CRPS {c_mine:.4f} vs ref {c_ref:.4f}"
    _record_dispersion(
        "blending_steps",
        [_from_db(fr)[:, SCORE_LEAD]],
        [_from_db(fm)[:, SCORE_LEAD]],
        truth,
    )


def test_pca_enkf_parity(sequence):
    """PCA-EnKF combined forecast vs the reference
    (pca_ens_kalman_filter.py:1555): ensemble CRPS at the last lead
    within tolerance.  Same synthetic radar + noisy-truth NWP ensemble
    on both sides."""
    frames, velocity = sequence
    db = _to_db(np.asarray(frames))
    obs = db[:2].astype(np.float32)
    t0 = datetime.datetime(2021, 6, 29, 12, 0)
    obs_ts = np.array([t0 - datetime.timedelta(minutes=5), t0])
    nwp_ts = np.array(
        [t0 + datetime.timedelta(minutes=5 * i) for i in range(5)]
    )
    rng = np.random.RandomState(1)
    nwp = np.stack(
        [db[1:6] + 0.5 * rng.randn(5, *SHAPE) for _ in range(4)]
    )
    common = dict(
        forecast_horizon=20, issuetime=t0, n_ens_members=4,
        n_cascade_levels=6, precip_thr=-10.0, norain_thr=0.01,
        noise_method="nonparametric", num_workers=1,
    )

    from pysteps.blending import pca_ens_kalman_filter as ref_pca

    from pysteps_tpu.blending import pca_ens_kalman_filter as my_pca
    from pysteps_tpu.verification import probscores

    def crps_last(out):
        out = np.asarray(out)
        lead = out.shape[1] - 1
        return float(
            np.asarray(probscores.CRPS(out[:, lead], db[1 + lead]))
        )

    ref_scores, my_scores = [], []
    for seed in (5, 11):
        ref_scores.append(crps_last(ref_pca.forecast(
            obs_precip=obs.astype(np.float64), obs_timestamps=obs_ts,
            nwp_precip=nwp.astype(np.float64), nwp_timestamps=nwp_ts,
            velocity=velocity.astype(np.float64), seed=seed, **common,
        )))
        my_scores.append(crps_last(my_pca.forecast(
            obs_precip=obs, obs_timestamps=obs_ts,
            nwp_precip=nwp.astype(np.float32), nwp_timestamps=nwp_ts,
            velocity=velocity.astype(np.float32), seed=seed, **common,
        )))
    ref_crps = float(np.mean(ref_scores))
    my_crps = float(np.mean(my_scores))
    delta = _record(
        "pca_enkf", "crps@last(mean2seeds)", ref_crps, my_crps, 0.08
    )
    assert abs(delta) < 0.08, (ref_crps, my_crps)
