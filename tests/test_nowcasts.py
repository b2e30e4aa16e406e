"""Skill-threshold tests for the nowcast models on synthetic sequences,
mirroring the reference's statistical test strategy
(pysteps/tests/test_nowcasts_steps.py etc.) with synthetic truth."""

import numpy as np
import pytest

from pysteps_tpu import nowcasts
from pysteps_tpu.utils import transformation
from pysteps_tpu.verification import detcatscores, probscores

VELOCITY = (2.0, 1.0)


@pytest.fixture(scope="module")
def sequence_db():
    from helpers import make_synthetic_sequence

    frames = make_synthetic_sequence(n_frames=9, velocity=VELOCITY)
    db, meta = transformation.dB_transform(frames, {"transform": None, "unit": "mm/h", "threshold": 0.1})
    return np.asarray(db), meta


@pytest.fixture(scope="module")
def velocity_field():
    v = np.zeros((2, 256, 256), np.float32)
    v[0] = VELOCITY[0]
    v[1] = VELOCITY[1]
    return v


def test_extrapolation_nowcast_csi(sequence_db, velocity_field):
    db, meta = sequence_db
    fc = nowcasts.get_method("extrapolation")(db[2], velocity_field, 3)
    fc = np.asarray(fc)
    assert fc.shape == (3, 256, 256)
    score = detcatscores.det_cat_fct(fc[-1], db[5], meta["threshold"], "CSI")
    assert score > 0.95  # exact motion -> near-perfect forecast


def test_sprog_csi(sequence_db, velocity_field):
    db, meta = sequence_db
    fc = nowcasts.get_method("sprog")(
        db[:3], velocity_field, 3,
        precip_thr=meta["threshold"], n_cascade_levels=6,
    )
    fc = np.asarray(fc)
    assert fc.shape == (3, 256, 256)
    score = detcatscores.det_cat_fct(fc[-1], db[5], meta["threshold"], "CSI")
    assert score > 0.6


@pytest.mark.parametrize(
    "mask_method,probmatching,noise_stddev_adj,vel_pert",
    [
        ("incremental", "cdf", None, None),
        ("incremental", "cdf", "auto", "bps"),
        ("obs", "mean", "fixed", None),
        ("sprog", None, None, None),
        (None, None, None, None),
    ],
)
def test_steps_crps(
    sequence_db, velocity_field, mask_method, probmatching,
    noise_stddev_adj, vel_pert,
):
    db, meta = sequence_db
    fc = nowcasts.get_method("steps")(
        db[:3], velocity_field, 3,
        n_ens_members=5,
        n_cascade_levels=6,
        precip_thr=meta["threshold"],
        kmperpixel=1.0,
        timestep=5,
        mask_method=mask_method,
        probmatching_method=probmatching,
        noise_stddev_adj=noise_stddev_adj,
        vel_pert_method=vel_pert,
        seed=42,
    )
    fc = np.asarray(fc)
    assert fc.shape == (5, 3, 256, 256)
    # outside-domain inflow pixels are NaN (reference semantics:
    # semilagrangian outval default); the interior must be finite.  BPS
    # velocity perturbations widen the inflow band by a few pixels.
    b = int(3 * max(VELOCITY)) + 8
    assert np.all(np.isfinite(fc[:, :, b:-b, b:-b]))
    crps = probscores.CRPS(fc[:, -1], db[5])
    # synthetic sequence with exact motion: CRPS well below the dB-space
    # spread of the field (reference CI bound analog)
    assert crps < 2.0, f"CRPS {crps} too high"


def test_steps_parametric_noise_spectral_domain(sequence_db, velocity_field):
    """Parametric (full-fft, Hermitian) noise filters must work in the
    spectral-domain scan: the left half-plane is sliced into the rfft2
    filter."""
    db, meta = sequence_db
    fc = np.asarray(
        nowcasts.get_method("steps")(
            db[:3], velocity_field, 2, n_ens_members=2, n_cascade_levels=6,
            precip_thr=meta["threshold"], kmperpixel=1.0, timestep=5,
            noise_method="parametric", domain="spectral", seed=4,
        )
    )
    assert fc.shape == (2, 2, 256, 256)
    b = int(2 * max(VELOCITY)) + 2
    assert np.all(np.isfinite(fc[:, :, b:-b, b:-b]))


def test_steps_norain(velocity_field):
    zeros = np.zeros((3, 256, 256), np.float32)
    fc = nowcasts.get_method("steps")(
        zeros, velocity_field, 3,
        n_ens_members=2, n_cascade_levels=6,
        precip_thr=0.1, kmperpixel=1.0, timestep=5, seed=42,
    )
    fc = np.asarray(fc)
    assert fc.shape == (2, 3, 256, 256)
    assert np.all(fc == 0.0)


def test_steps_streaming_callback_matches_full_run(sequence_db, velocity_field):
    """The callback/return_output=False memory contract (reference:
    steps.py:196-206): the lead-time loop runs in chunks, each chunk is
    streamed to the host callback and dropped, and the streamed frames
    equal the full-materialization run up to XLA fusion reassociation
    (the chunked scans compile with different unroll factors)."""
    db, meta = sequence_db
    kwargs = dict(
        n_ens_members=3, n_cascade_levels=6, precip_thr=meta["threshold"],
        kmperpixel=1.0, timestep=5, seed=31,
    )
    full = np.asarray(
        nowcasts.get_method("steps")(db[:3], velocity_field, 6, **kwargs)
    )

    streamed = []
    result = nowcasts.get_method("steps")(
        db[:3], velocity_field, 6, callback=lambda b: streamed.append(b.copy()),
        return_output=False, **kwargs,
    )
    assert result is None
    assert len(streamed) == 6
    for t in range(6):
        assert streamed[t].shape == (3, 256, 256)
        np.testing.assert_allclose(streamed[t], full[:, t], atol=1e-5)


def test_sseps_streaming_callback(synthetic_metadata_db, sequence_db, velocity_field):
    db, meta = sequence_db
    streamed = []
    result = nowcasts.get_method("sseps")(
        db[:3], dict(synthetic_metadata_db), velocity_field, 5,
        n_ens_members=2, n_cascade_levels=6, win_size=128, seed=5,
        callback=lambda b: streamed.append(b.copy()), return_output=False,
    )
    assert result is None
    assert len(streamed) == 5
    full = np.asarray(
        nowcasts.get_method("sseps")(
            db[:3], dict(synthetic_metadata_db), velocity_field, 5,
            n_ens_members=2, n_cascade_levels=6, win_size=128, seed=5,
        )
    )
    for t in range(5):
        np.testing.assert_allclose(streamed[t], full[:, t], atol=1e-5)


@pytest.fixture(scope="module")
def synthetic_metadata_db():
    return {
        "accutime": 5, "unit": "dBZ", "transform": "dB", "zerovalue": -15.0,
        "threshold": 0.1, "xpixelsize": 1000.0, "ypixelsize": 1000.0,
    }


def test_steps_members_differ(sequence_db, velocity_field):
    db, meta = sequence_db
    fc = np.asarray(
        nowcasts.get_method("steps")(
            db[:3], velocity_field, 2,
            n_ens_members=3, n_cascade_levels=6,
            precip_thr=meta["threshold"], kmperpixel=1.0, timestep=5, seed=7,
        )
    )
    assert np.nanmax(np.abs(fc[0] - fc[1])) > 0.1


def test_steps_reproducible(sequence_db, velocity_field):
    db, meta = sequence_db
    kwargs = dict(
        n_ens_members=2, n_cascade_levels=6, precip_thr=meta["threshold"],
        kmperpixel=1.0, timestep=5, seed=123,
    )
    fc1 = np.asarray(nowcasts.get_method("steps")(db[:3], velocity_field, 2, **kwargs))
    fc2 = np.asarray(nowcasts.get_method("steps")(db[:3], velocity_field, 2, **kwargs))
    np.testing.assert_allclose(fc1, fc2, atol=1e-5)


def test_lagrangian_probability(sequence_db, velocity_field):
    db, meta = sequence_db
    P = np.asarray(
        nowcasts.get_method("lagrangian_probability")(
            db[2], velocity_field, 3, threshold=meta["threshold"]
        )
    )
    assert P.shape == (3, 256, 256)
    valid = np.isfinite(P)
    assert np.all((P[valid] >= 0) & (P[valid] <= 1))


def test_steps_list_timesteps(sequence_db, velocity_field):
    db, meta = sequence_db
    fc = np.asarray(
        nowcasts.get_method("steps")(
            db[:3], velocity_field, [3],
            n_ens_members=2, n_cascade_levels=6,
            precip_thr=meta["threshold"], kmperpixel=1.0, timestep=5, seed=42,
        )
    )
    assert fc.shape == (2, 1, 256, 256)


def test_steps_spectral_domain(sequence_db, velocity_field):
    db, meta = sequence_db
    kwargs = dict(
        n_ens_members=4, n_cascade_levels=6, precip_thr=meta["threshold"],
        kmperpixel=1.0, timestep=5, seed=42,
    )
    fc_spatial = np.asarray(
        nowcasts.get_method("steps")(db[:3], velocity_field, 3, domain="spatial", **kwargs)
    )
    fc_spectral = np.asarray(
        nowcasts.get_method("steps")(db[:3], velocity_field, 3, domain="spectral", **kwargs)
    )
    assert fc_spectral.shape == (4, 3, 256, 256)
    b = int(3 * max(VELOCITY)) + 2
    assert np.all(np.isfinite(fc_spectral[:, :, b:-b, b:-b]))
    # both domains must agree on which pixels are outside-domain inflow
    assert np.array_equal(np.isnan(fc_spectral), np.isnan(fc_spatial))
    # same seeds, mathematically equivalent formulations: fields must agree
    # closely (float accumulation differences only)
    crps_spatial = probscores.CRPS(fc_spatial[:, -1], db[5])
    crps_spectral = probscores.CRPS(fc_spectral[:, -1], db[5])
    assert abs(crps_spatial - crps_spectral) < 0.2


@pytest.mark.parametrize("noise_method", ["ssft", "nested"])
def test_steps_localized_noise(sequence_db, velocity_field, noise_method):
    # reference STEPS accepts any registered noise generator
    # (pysteps/nowcasts/steps.py noise_method docstring)
    db, meta = sequence_db
    noise_kwargs = (
        {"win_size": 128} if noise_method == "ssft" else {"max_level": 2}
    )
    fc = np.asarray(
        nowcasts.get_method("steps")(
            db[:3], velocity_field, 3,
            n_ens_members=4, n_cascade_levels=6,
            precip_thr=meta["threshold"], kmperpixel=1.0, timestep=5,
            noise_method=noise_method, noise_kwargs=noise_kwargs, seed=42,
        )
    )
    assert fc.shape == (4, 3, 256, 256)
    b = int(3 * max(VELOCITY)) + 2
    assert np.all(np.isfinite(fc[:, :, b:-b, b:-b]))
    crps = probscores.CRPS(fc[:, -1], db[5])
    assert crps < 2.0, f"CRPS {crps} too high"


def test_steps_localized_noise_stddev_adj(sequence_db, velocity_field):
    db, meta = sequence_db
    fc = np.asarray(
        nowcasts.get_method("steps")(
            db[:3], velocity_field, 2,
            n_ens_members=2, n_cascade_levels=6,
            precip_thr=meta["threshold"], kmperpixel=1.0, timestep=5,
            noise_method="ssft", noise_stddev_adj="auto",
            noise_kwargs={"win_size": 128}, seed=42,
        )
    )
    assert fc.shape == (2, 2, 256, 256)
    b = int(2 * max(VELOCITY)) + 2
    assert np.all(np.isfinite(fc[:, :, b:-b, b:-b]))


def test_nowcast_main_loop_generic(sequence_db, velocity_field):
    """The generic host main loop (reference parity API) drives a custom
    Eulerian-decay model with fractional timesteps."""
    from pysteps_tpu.nowcasts.utils import nowcast_main_loop

    db, meta = sequence_db
    state = {"field": db[2].copy()}

    def func(state, params):
        state = {"field": state["field"] * 0.95}
        return state["field"], state

    out = nowcast_main_loop(
        db[2], velocity_field, state, [0.5, 1.0, 2.5], "semilagrangian", func,
        extrap_kwargs={"outval": float(np.nanmin(db))},
    )
    assert out.shape == (3, 256, 256)
    assert np.all(np.isfinite(out[:, 64:-64, 64:-64]))


def test_steps_device_input_equivalence():
    """Device-resident inputs (jax arrays) must produce the same forecast
    as numpy inputs: the wrapper's gating scalars move into one jit but the
    pipeline math is identical."""
    import jax.numpy as jnp

    from helpers import make_synthetic_sequence

    frames = make_synthetic_sequence(
        n_frames=3, shape=(64, 64), velocity=(2.0, 1.0), seed=4
    )
    db = np.where(
        frames >= 0.1, 10 * np.log10(np.maximum(frames, 0.1)), -15.0
    ).astype(np.float32)
    db += 0.1 * np.random.RandomState(7).randn(*db.shape).astype(np.float32)
    velocity = np.zeros((2, 64, 64), np.float32)
    velocity[0], velocity[1] = 2.0, 1.0
    kwargs = dict(
        n_ens_members=2, n_cascade_levels=5, precip_thr=-10.0,
        kmperpixel=1.0, timestep=5, noise_method="nonparametric", seed=9,
    )
    f = nowcasts.get_method("steps")
    fc_np = np.asarray(f(db, velocity, 3, **kwargs))
    fc_dev = np.asarray(f(jnp.asarray(db), jnp.asarray(velocity), 3, **kwargs))
    np.testing.assert_allclose(fc_dev, fc_np, atol=1e-4)

    # norain early exit works for device inputs too
    zero = np.full((3, 64, 64), -15.0, np.float32)
    fc0 = np.asarray(f(jnp.asarray(zero), jnp.asarray(velocity), 2, **kwargs))
    assert fc0.shape == (2, 2, 64, 64)
    assert np.all(fc0 == -15.0)


def test_steps_outer_member_chunk_matches(monkeypatch, synthetic_precip):
    """The memory-desperate outer member-chunk path (whole time scan per
    chunk, donated output buffer) must reproduce the in-scan chunk
    path exactly — members are independent given fold_in keys."""
    import jax.numpy as jnp

    from pysteps_tpu import nowcasts

    frames = np.asarray(synthetic_precip[:3])
    db = np.where(
        frames >= 0.1, 10 * np.log10(np.maximum(frames, 0.1)), -15.0
    ).astype(np.float32)
    velocity = np.zeros((2,) + db.shape[1:], np.float32)
    velocity[0], velocity[1] = 2.0, 1.0
    kwargs = dict(
        n_ens_members=4, n_cascade_levels=6, precip_thr=-10.0,
        kmperpixel=1.0, timestep=5, seed=7, domain="spectral",
        member_chunk=2,
    )
    f = nowcasts.get_method("steps")
    out_inner = np.asarray(f(db, velocity, 3, **kwargs))
    monkeypatch.setenv("PYSTEPS_TPU_OUTER_CHUNK_BYTES", "1")
    out_outer = np.asarray(f(db, velocity, 3, **kwargs))
    assert out_outer.shape == out_inner.shape
    np.testing.assert_allclose(out_inner, out_outer, atol=1e-4)
