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
            feature_method="blob",
        )
    )
    assert fc.shape == (5, 3, 256, 256)
    crps = probscores.CRPS(fc[:, -1], sequence[5])
    assert crps < 1.5, f"LINDA CRPS {crps}"
    # members differ
    assert np.nanmax(np.abs(fc[0] - fc[1])) > 0.01


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
