"""Skill tests for ANVIL and SSEPS on synthetic truth (reference
strategy: pysteps/tests/test_nowcasts_anvil.py, test_nowcasts_sseps.py)."""

import numpy as np
import pytest

from helpers import make_synthetic_sequence
from pysteps_tpu import nowcasts
from pysteps_tpu.verification import detcatscores, probscores

VELOCITY = (2.0, 1.0)


@pytest.fixture(scope="module")
def sequence():
    frames = make_synthetic_sequence(n_frames=9, shape=(256, 256), velocity=VELOCITY, seed=0)
    return frames.astype(np.float32)


@pytest.fixture(scope="module")
def sequence_db(sequence):
    return np.where(
        sequence >= 0.1, 10 * np.log10(np.maximum(sequence, 0.1)), -15.0
    ).astype(np.float32)


@pytest.fixture(scope="module")
def velocity_field():
    v = np.zeros((2, 256, 256), np.float32)
    v[0], v[1] = VELOCITY
    return v


def test_anvil_rainrate_csi(sequence, velocity_field):
    # ANVIL on rain-rate inputs (no R(VIL) conversion)
    fc = np.asarray(
        nowcasts.get_method("anvil")(
            sequence[:4], velocity_field, 3, ar_order=2, n_cascade_levels=8
        )
    )
    assert fc.shape == (3, 256, 256)
    score = detcatscores.det_cat_fct(fc[-1], sequence[6], 0.1, "CSI")
    assert score > 0.6, f"ANVIL CSI {score}"


def test_anvil_ar1(sequence, velocity_field):
    fc = np.asarray(
        nowcasts.get_method("anvil")(
            sequence[:3], velocity_field, 2, ar_order=1
        )
    )
    assert fc.shape == (2, 256, 256)
    assert np.all(fc[np.isfinite(fc)] >= 0)


def test_anvil_rvil_conversion(sequence, velocity_field):
    vil = sequence[:4] * 20.0  # pretend VIL units
    rainrate = sequence[3]
    fc = np.asarray(
        nowcasts.get_method("anvil")(
            vil, velocity_field, 2, rainrate=rainrate, r_vil_window_radius=5
        )
    )
    assert fc.shape == (2, 256, 256)
    assert np.all(fc[np.isfinite(fc)] >= 0)


def test_sseps_crps(sequence_db, velocity_field, synthetic_metadata):
    meta = dict(synthetic_metadata)
    meta["threshold"] = -10.0
    meta["zerovalue"] = -15.0
    fc = np.asarray(
        nowcasts.get_method("sseps")(
            sequence_db[:3], meta, velocity_field, 3,
            n_ens_members=5, n_cascade_levels=6, win_size=128, seed=42,
        )
    )
    assert fc.shape == (5, 3, 256, 256)
    crps = probscores.CRPS(fc[:, -1], sequence_db[5])
    assert crps < 0.6, f"SSEPS CRPS {crps}"


def test_sseps_members_differ(sequence_db, velocity_field, synthetic_metadata):
    meta = dict(synthetic_metadata)
    meta["threshold"] = -10.0
    meta["zerovalue"] = -15.0
    fc = np.asarray(
        nowcasts.get_method("sseps")(
            sequence_db[:3], meta, velocity_field, 2,
            n_ens_members=3, win_size=128, seed=7,
        )
    )
    assert np.nanmax(np.abs(fc[0] - fc[1])) > 0.1


def test_linda_deterministic_csi(sequence, velocity_field):
    fc = np.asarray(
        nowcasts.get_method("linda")(
            sequence[:3], velocity_field, 3,
            add_perturbations=False, feature_method="blob",
        )
    )
    assert fc.shape == (3, 256, 256)
    score = detcatscores.det_cat_fct(fc[-1], sequence[5], 0.1, "CSI")
    assert score > 0.5, f"LINDA CSI {score}"


def test_linda_probabilistic(sequence, velocity_field):
    fc = np.asarray(
        nowcasts.get_method("linda")(
            sequence[:3], velocity_field, 3,
            add_perturbations=True, n_ens_members=5, seed=42,
            feature_method="blob", kmperpixel=1.0, timestep=5,
        )
    )
    assert fc.shape == (5, 3, 256, 256)
    crps = probscores.CRPS(fc[:, -1], sequence[5])
    assert crps < 1.5, f"LINDA CRPS {crps}"
    # members differ
    assert np.nanmax(np.abs(fc[0] - fc[1])) > 0.01


def test_linda_tstorm_feature(sequence, velocity_field):
    refl = (sequence[:3] + 35.0).astype(np.float32)
    fc = np.asarray(
        nowcasts.get_method("linda")(
            refl, velocity_field, 2,
            feature_method="tstorm", add_perturbations=False,
            feature_kwargs={"minref": 38, "minmax": 40, "minsize": 20},
        )
    )
    assert fc.shape == (2, 256, 256)
    assert np.isfinite(fc[:, 30:-30, 30:-30]).all()


def test_linda_domain_feature(sequence, velocity_field):
    fc = np.asarray(
        nowcasts.get_method("linda")(
            sequence[:3], velocity_field, 2,
            add_perturbations=False, feature_method="domain",
        )
    )
    assert fc.shape == (2, 256, 256)


def test_sseps_velocity_perturbation(sequence_db, velocity_field, synthetic_metadata):
    meta = dict(synthetic_metadata)
    meta["threshold"] = -10.0
    meta["zerovalue"] = -15.0
    common = dict(n_ens_members=3, n_cascade_levels=6, win_size=128, seed=11)
    fc_nopert = np.asarray(
        nowcasts.get_method("sseps")(
            sequence_db[:3], meta, velocity_field, 2,
            vel_pert_method=None, **common,
        )
    )
    fc_pert = np.asarray(
        nowcasts.get_method("sseps")(
            sequence_db[:3], meta, velocity_field, 2,
            vel_pert_method="bps",
            vel_pert_kwargs={"p_par": [5.0, 0.6, -1.0], "p_perp": [4.0, 0.6, -1.0]},
            **common,
        )
    )
    assert fc_pert.shape == fc_nopert.shape == (3, 2, 256, 256)
    # perturbing the advection field must change the members' trajectories
    assert np.nanmax(np.abs(fc_pert - fc_nopert)) > 0.05
    assert np.isfinite(fc_pert).any()


def _small_steps_inputs():
    frames = make_synthetic_sequence(
        n_frames=3, shape=(64, 64), velocity=VELOCITY, seed=5
    )
    db = np.where(
        frames >= 0.1, 10 * np.log10(np.maximum(frames, 0.1)), -15.0
    ).astype(np.float32)
    db += 0.1 * np.random.RandomState(11).randn(*db.shape).astype(np.float32)
    velocity = np.zeros((2, 64, 64), np.float32)
    velocity[0], velocity[1] = VELOCITY
    kwargs = dict(
        n_ens_members=2, n_cascade_levels=5, precip_thr=-10.0,
        kmperpixel=1.0, timestep=5, seed=8,
    )
    return db, velocity, kwargs


def test_steps_callback_and_return_output():
    """callback receives each lead time as (E, m, n); return_output=False
    returns None (reference: nowcasts/steps.py:196-206 memory-saving
    incremental-export mode)."""
    db, velocity, kwargs = _small_steps_inputs()
    got = []
    out = nowcasts.get_method("steps")(
        db, velocity, 3, callback=lambda f: got.append(np.asarray(f)),
        return_output=False, **kwargs,
    )
    assert out is None
    assert len(got) == 3
    assert all(f.shape == (2, 64, 64) for f in got)


def test_steps_measure_time():
    db, velocity, kwargs = _small_steps_inputs()
    out, init_s, loop_s = nowcasts.get_method("steps")(
        db, velocity, 2, measure_time=True, **kwargs
    )
    assert np.asarray(out).shape == (2, 2, 64, 64)
    assert init_s >= 0.0 and loop_s >= 0.0


def test_steps_fractional_timesteps():
    """List timesteps with fractional entries interpolate between the
    integer grid (reference: nowcasts/utils.py:34 binned_timesteps +
    temporal interpolation)."""
    db, velocity, kwargs = _small_steps_inputs()
    f = nowcasts.get_method("steps")
    out_int = np.asarray(f(db, velocity, 3, **kwargs))
    out_list = np.asarray(f(db, velocity, [1, 2, 3], **kwargs))
    np.testing.assert_allclose(out_list, out_int, atol=1e-5)

    out_frac = np.asarray(f(db, velocity, [1, 1.5, 2], **kwargs))
    assert out_frac.shape == (2, 3, 64, 64)
    # the fractional frame lies between its neighbours (linear interp)
    lo = np.minimum(out_frac[:, 0], out_frac[:, 2])
    hi = np.maximum(out_frac[:, 0], out_frac[:, 2])
    mid = out_frac[:, 1]
    # outside-domain inflow pixels are NaN (reference outval semantics):
    # bound the interpolant only where all three frames are finite
    ok = np.isfinite(lo) & np.isfinite(hi) & np.isfinite(mid)
    assert ok.mean() > 0.8
    assert np.all(mid[ok] >= lo[ok] - 1e-4)
    assert np.all(mid[ok] <= hi[ok] + 1e-4)
