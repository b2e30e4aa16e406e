"""Multi-device sharding tests on the virtual 8-device CPU mesh
(the reference has no distributed machinery to mirror — SURVEY.md §2.17)."""

import jax
import numpy as np
import pytest

from helpers import make_synthetic_sequence
from pysteps_tpu import nowcasts
from pysteps_tpu.parallel import ens_sharding, make_mesh, shard_ensemble


def test_make_mesh_axes():
    mesh = make_mesh(ens=4, y=2, x=1)
    assert mesh.axis_names == ("ens", "y", "x")
    assert mesh.devices.shape == (4, 2, 1)


def test_shard_ensemble_places_on_devices():
    mesh = make_mesh(ens=8)
    arr = np.arange(8 * 4 * 4, dtype=np.float32).reshape(8, 4, 4)
    sharded = shard_ensemble(arr, mesh)
    assert len(sharded.sharding.device_set) == 8


def test_sharded_steps_matches_unsharded():
    frames = make_synthetic_sequence(n_frames=3, shape=(64, 64), velocity=(2.0, 1.0), seed=0)
    db = np.where(
        frames >= 0.1, 10 * np.log10(np.maximum(frames, 0.1)), -15.0
    ).astype(np.float32)
    velocity = np.zeros((2, 64, 64), np.float32)
    velocity[0], velocity[1] = 2.0, 1.0
    kwargs = dict(
        n_ens_members=8, n_cascade_levels=6, precip_thr=-10.0,
        kmperpixel=1.0, timestep=5, seed=11,
    )
    fc_plain = np.asarray(
        nowcasts.get_method("steps")(db, velocity, 2, **kwargs)
    )
    mesh = make_mesh(ens=8)
    fc_sharded = np.asarray(
        nowcasts.get_method("steps")(db, velocity, 2, mesh=mesh, **kwargs)
    )
    assert fc_sharded.shape == (8, 2, 64, 64)
    # the shard_map scan compiles a per-device-batch program whose fused
    # reductions reassociate float sums; the drift (last-bit scale) gets
    # amplified through the CDF matching at a few isolated pixels
    np.testing.assert_allclose(fc_plain, fc_sharded, atol=3e-2)


def test_sharded_warp_matches_single_device():
    from pysteps_tpu.ops.warp import warp_shifted
    from pysteps_tpu.parallel.halo import sharded_warp
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    m = n = 64
    field = jnp.asarray(rng.rand(m, n), jnp.float32)
    yy, xx = np.meshgrid(np.arange(m), np.arange(n), indexing="ij")
    disp = jnp.asarray(
        np.stack([2.0 + 0.5 * np.sin(yy / 10.0), -1.5 + 0.5 * np.cos(xx / 9.0)]),
        jnp.float32,
    )
    halo = 8
    ref = warp_shifted(field, disp, halo, cval=0.0)
    mesh = make_mesh(ens=1, y=8, x=1)
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else mesh:
        out = sharded_warp(field, disp, mesh, halo, cval=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_sharded_blending_matches_unsharded():
    frames = make_synthetic_sequence(
        n_frames=7, shape=(64, 64), velocity=(2.0, 1.0), seed=2
    )
    db = np.where(
        frames >= 0.1, 10 * np.log10(np.maximum(frames, 0.1)), -15.0
    ).astype(np.float32)
    velocity = np.zeros((2, 64, 64), np.float32)
    velocity[0], velocity[1] = 2.0, 1.0
    rng = np.random.RandomState(5)
    nwp = db[2:6] + 0.5 * rng.randn(4, 64, 64).astype(np.float32)

    from pysteps_tpu import blending

    kwargs = dict(
        n_ens_members=8, n_cascade_levels=6,
        precip_thr=-10.0, kmperpixel=1.0, seed=11,
    )
    fc_plain = np.asarray(
        blending.get_method("steps")(
            db[:3], nwp[None], velocity, velocity[None], 2, 5, **kwargs
        )
    )
    mesh = make_mesh(ens=8)
    fc_sharded = np.asarray(
        blending.get_method("steps")(
            db[:3], nwp[None], velocity, velocity[None], 2, 5,
            mesh=mesh, **kwargs,
        )
    )
    assert fc_sharded.shape == (8, 2, 64, 64)
    np.testing.assert_allclose(fc_plain, fc_sharded, atol=5e-3)


def test_spatially_sharded_blending_matches_unsharded():
    """Blending with grid rows sharded over "y" (halo advection, sharded
    noise, psum matching) vs the plain scan.  probmatching="mean" keeps
    both paths exact (the cdf paths use different matchers: sort-based
    vs PWL-histogram), so agreement is fp-tolerance tight."""
    frames = make_synthetic_sequence(
        n_frames=7, shape=(64, 64), velocity=(2.0, 1.0), seed=2
    )
    db = np.where(
        frames >= 0.1, 10 * np.log10(np.maximum(frames, 0.1)), -15.0
    ).astype(np.float32)
    velocity = np.zeros((2, 64, 64), np.float32)
    velocity[0], velocity[1] = 2.0, 1.0
    rng = np.random.RandomState(5)
    nwp = db[2:6] + 0.5 * rng.randn(4, 64, 64).astype(np.float32)

    from pysteps_tpu import blending

    kwargs = dict(
        n_ens_members=4, n_cascade_levels=6, precip_thr=-10.0,
        kmperpixel=1.0, seed=11, probmatching_method="mean",
    )
    fc_plain = np.asarray(
        blending.get_method("steps")(
            db[:3], nwp[None], velocity, velocity[None], 2, 5, **kwargs
        )
    )
    mesh = make_mesh(ens=2, y=4)
    fc_sharded = np.asarray(
        blending.get_method("steps")(
            db[:3], nwp[None], velocity, velocity[None], 2, 5,
            mesh=mesh, **kwargs,
        )
    )
    assert fc_sharded.shape == (4, 2, 64, 64)
    np.testing.assert_allclose(fc_plain, fc_sharded, atol=5e-3)


def test_spatially_sharded_blending_device_count_invariance():
    """The default blending config (cdf matching + resampled target
    distributions + BPS velocity perturbations) gives the same result on
    a (4 ens x 2 y) mesh as on a (1 x 2) mesh — the psum/PWL path is
    device-count invariant."""
    frames = make_synthetic_sequence(
        n_frames=7, shape=(64, 64), velocity=(2.0, 1.0), seed=9
    )
    db = np.where(
        frames >= 0.1, 10 * np.log10(np.maximum(frames, 0.1)), -15.0
    ).astype(np.float32)
    velocity = np.zeros((2, 64, 64), np.float32)
    velocity[0], velocity[1] = 2.0, 1.0
    rng = np.random.RandomState(5)
    nwp = db[2:6] + 0.5 * rng.randn(4, 64, 64).astype(np.float32)

    from pysteps_tpu import blending

    kwargs = dict(
        n_ens_members=4, n_cascade_levels=6, precip_thr=-10.0,
        kmperpixel=1.0, seed=3, vel_pert_method="bps",
    )
    out_small = np.asarray(
        blending.get_method("steps")(
            db[:3], nwp[None], velocity, velocity[None], 2, 5,
            mesh=make_mesh(ens=1, y=2), **kwargs,
        )
    )
    out_large = np.asarray(
        blending.get_method("steps")(
            db[:3], nwp[None], velocity, velocity[None], 2, 5,
            mesh=make_mesh(ens=4, y=2), **kwargs,
        )
    )
    assert np.isfinite(out_large).all()
    np.testing.assert_allclose(out_small, out_large, atol=5e-3)


def test_spatially_sharded_blending_y_shard_invariance_big_halo():
    """With BPS velocity perturbations the 4-sigma advection margin makes
    the required halo exceed the per-shard row count on fine meshes
    (64 rows / 8 shards = 8-row blocks).  The halo must NOT be clamped to
    m_loc (ADVICE r2, medium): results have to be invariant to the
    y-shard count, exercising the all_gather fallback of
    _exchange_rows."""
    frames = make_synthetic_sequence(
        n_frames=7, shape=(64, 64), velocity=(2.0, 1.0), seed=13
    )
    db = np.where(
        frames >= 0.1, 10 * np.log10(np.maximum(frames, 0.1)), -15.0
    ).astype(np.float32)
    velocity = np.zeros((2, 64, 64), np.float32)
    velocity[0], velocity[1] = 2.0, 1.0
    rng = np.random.RandomState(5)
    nwp = db[2:6] + 0.5 * rng.randn(4, 64, 64).astype(np.float32)

    from pysteps_tpu import blending

    kwargs = dict(
        n_ens_members=2, n_cascade_levels=6, precip_thr=-10.0,
        kmperpixel=1.0, seed=3, vel_pert_method="bps",
    )
    out_y2 = np.asarray(
        blending.get_method("steps")(
            db[:3], nwp[None], velocity, velocity[None], 2, 5,
            mesh=make_mesh(ens=1, y=2), **kwargs,
        )
    )
    out_y8 = np.asarray(
        blending.get_method("steps")(
            db[:3], nwp[None], velocity, velocity[None], 2, 5,
            mesh=make_mesh(ens=1, y=8), **kwargs,
        )
    )
    assert np.isfinite(out_y8).all()
    np.testing.assert_allclose(out_y2, out_y8, atol=5e-3)


def test_sharded_vet_matches_unsharded():
    frames = make_synthetic_sequence(
        n_frames=2, shape=(64, 64), velocity=(2.0, 1.0), seed=4
    )
    db = np.where(
        frames >= 0.1, 10 * np.log10(np.maximum(frames, 0.1)), -15.0
    ).astype(np.float32)

    from pysteps_tpu.motion.vet import vet

    kwargs = dict(
        sectors=((8, 4), (8, 4)), options={"maxiter": 40}, verbose=False
    )
    uv_plain = np.asarray(vet(db, **kwargs))
    mesh = make_mesh(ens=1, y=8)
    uv_sharded = np.asarray(vet(db, mesh=mesh, **kwargs))
    assert uv_sharded.shape == (2, 64, 64)
    # the psum reassociates the SSD sum, so the 120-step Adam trajectory
    # drifts slightly; agreement to ~0.1 px is sharded-vs-replicated parity
    np.testing.assert_allclose(uv_plain, uv_sharded, atol=0.1)


def test_distributed_verification_matches_serial():
    """psum-reduced accumulation over a case axis sharded on the mesh
    equals the serial accum/merge chain (SURVEY §2.16 streaming merges)."""
    from pysteps_tpu.verification import (
        detcatscores, parallel as vparallel, probscores, spatialscores,
    )

    rng = np.random.RandomState(3)
    C, m, n = 8, 32, 32
    pred = rng.gamma(1.0, 2.0, (C, m, n)).astype(np.float32)
    obs = rng.gamma(1.0, 2.0, (C, m, n)).astype(np.float32)
    ens = rng.gamma(1.0, 2.0, (C, 5, m, n)).astype(np.float32)
    mesh = make_mesh(ens=8)

    # det_cat: serial chain of per-case accums + merges
    serial = detcatscores.det_cat_fct_init(1.0)
    detcatscores.det_cat_fct_accum(serial, pred[:4], obs[:4])
    other = detcatscores.det_cat_fct_init(1.0)
    detcatscores.det_cat_fct_accum(other, pred[4:], obs[4:])
    serial = detcatscores.det_cat_fct_merge(serial, other)
    dist = vparallel.sharded_det_cat_accum(pred, obs, 1.0, mesh)
    for k in ("hits", "false_alarms", "misses", "correct_negatives"):
        assert int(dist[k]) == int(serial[k])
    s_csi = detcatscores.det_cat_fct_compute(serial, "CSI")
    d_csi = detcatscores.det_cat_fct_compute(dist, "CSI")
    np.testing.assert_allclose(d_csi, s_csi, rtol=1e-6)

    # CRPS
    serial_c = probscores.CRPS_init()
    for i in range(C):
        probscores.CRPS_accum(serial_c, ens[i], obs[i])
    dist_c = vparallel.sharded_crps_accum(ens, obs, mesh)
    np.testing.assert_allclose(
        probscores.CRPS_compute(dist_c), probscores.CRPS_compute(serial_c),
        rtol=1e-5,
    )

    # FSS at scale 4
    serial_f = spatialscores.fss_init(1.0, 4)
    for i in range(C):
        spatialscores.fss_accum(serial_f, pred[i], obs[i])
    dist_f = vparallel.sharded_fss_accum(pred, obs, 1.0, 4, mesh)
    np.testing.assert_allclose(
        spatialscores.fss_compute(dist_f), spatialscores.fss_compute(serial_f),
        rtol=1e-5,
    )


def test_dist_fft_matches_jnp():
    """Pencil-decomposed rfft2/irfft2 over y shards equals jnp.fft."""
    import functools

    from jax.sharding import PartitionSpec as P

    from pysteps_tpu.parallel.dist_fft import irfft2_local, rfft2_local

    mesh = make_mesh(ens=1, y=8)
    m, n = 64, 96
    f = np.random.RandomState(0).randn(m, n).astype(np.float32)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=P(None, "y", None),
        out_specs=P(None, "y", None),
    )
    def roundtrip(x):
        spec = rfft2_local(x[0], "y")
        return irfft2_local(spec, (m, n), "y")[None]

    out = np.asarray(roundtrip(f[None]))[0]
    np.testing.assert_allclose(out, f, atol=1e-5)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=P(None, "y", None),
        out_specs=P(None, None, "y"),
    )
    def fwd(x):
        return rfft2_local(x[0], "y")[None]

    spec = np.asarray(fwd(f[None]))[0]
    ref = np.fft.rfft2(f)
    np.testing.assert_allclose(spec[:, : n // 2 + 1], ref, atol=1e-3)


def test_spatially_sharded_steps_matches_single_device():
    """The fully y-sharded STEPS forecast (spectral column-sharded AR,
    distributed inverse FFT, psum CDF matching, halo advection) gives the
    same result on a (2 ens x 4 y) mesh as on one device."""
    from helpers import make_synthetic_sequence

    from pysteps_tpu.parallel import sharded_steps

    frames = make_synthetic_sequence(
        n_frames=6, shape=(128, 128), velocity=(2.0, 1.0), seed=3
    )
    db = 10.0 * np.log10(np.maximum(frames, 0.1))
    velocity = np.zeros((2, 128, 128), np.float32)
    velocity[0], velocity[1] = 2.0, 1.0

    kwargs = dict(
        n_ens_members=4, precip_thr=-10.0, kmperpixel=1.0, timestep=5, seed=7
    )
    out_multi = np.asarray(
        sharded_steps.forecast(db[:3], velocity, 3, make_mesh(ens=2, y=4), **kwargs)
    )
    out_single = np.asarray(
        sharded_steps.forecast(db[:3], velocity, 3, make_mesh(ens=1, y=1), **kwargs)
    )
    assert out_multi.shape == (4, 3, 128, 128)
    # inflow pixels are NaN (reference outval semantics); both layouts
    # must agree on the NaN set and on every finite value
    assert np.array_equal(np.isnan(out_multi), np.isnan(out_single))
    b = 3 * 2 + 2
    assert np.isfinite(out_multi[:, :, b:-b, b:-b]).all()
    np.testing.assert_allclose(
        np.nan_to_num(out_multi), np.nan_to_num(out_single), atol=0.01
    )

    # statistical sanity vs the standard (unsharded) STEPS model
    from pysteps_tpu import nowcasts

    std = np.asarray(
        nowcasts.get_method("steps")(
            db[:3], velocity, 3, n_cascade_levels=6, domain="spectral", **kwargs
        )
    )
    b = 3 * 2 + 2
    corr = np.corrcoef(
        out_multi[0, 0, b:-b, b:-b].ravel(), std[0, 0, b:-b, b:-b].ravel()
    )[0, 1]
    assert corr > 0.9, f"sharded vs standard member correlation {corr}"

    # BPS velocity perturbations: still device-count invariant, and the
    # perturbed members diverge from the unperturbed run
    out_vp_multi = np.asarray(
        sharded_steps.forecast(
            db[:3], velocity, 3, make_mesh(ens=2, y=4),
            vel_pert_method="bps", **kwargs,
        )
    )
    out_vp_single = np.asarray(
        sharded_steps.forecast(
            db[:3], velocity, 3, make_mesh(ens=1, y=1),
            vel_pert_method="bps", **kwargs,
        )
    )
    np.testing.assert_allclose(out_vp_multi, out_vp_single, atol=0.01)
    assert np.abs(out_vp_multi - out_multi).max() > 0.1
