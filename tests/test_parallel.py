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
    # partitioned reductions reassociate float sums; tolerance covers the
    # resulting last-bit drift amplified through the CDF matching
    np.testing.assert_allclose(fc_plain, fc_sharded, atol=5e-3)


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
