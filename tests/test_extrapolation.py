import jax.numpy as jnp
import numpy as np

from pysteps_tpu.extrapolation import semilagrangian
from pysteps_tpu.extrapolation.interface import get_method


def _gaussian_blob(shape, cy, cx, scale=10.0):
    yy, xx = np.meshgrid(np.arange(shape[0]), np.arange(shape[1]), indexing="ij")
    return np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * scale**2))


def test_constant_advection_moves_blob():
    shape = (128, 128)
    field = _gaussian_blob(shape, 64, 64)
    velocity = np.stack([np.full(shape, 2.0), np.full(shape, 1.0)])
    out = semilagrangian.extrapolate(field, velocity, 10, outval=0.0)
    assert out.shape == (10, 128, 128)
    # after 10 steps the blob centre should be at (64+10*1, 64+10*2)
    last = np.asarray(out[-1])
    iy, ix = np.unravel_index(np.argmax(last), shape)
    assert abs(iy - 74) <= 1 and abs(ix - 84) <= 1
    # mass approximately conserved while the blob stays inside
    np.testing.assert_allclose(last.sum(), field.sum(), rtol=0.01)


def test_incremental_displacement_matches_direct():
    shape = (64, 64)
    field = _gaussian_blob(shape, 32, 32, 6.0)
    rng = np.random.RandomState(0)
    velocity = np.stack(
        [1.5 + 0.2 * rng.randn(*shape), -0.8 + 0.2 * rng.randn(*shape)]
    ).astype(np.float32)
    direct = semilagrangian.extrapolate(field, velocity, 3, outval=0.0)
    # step-by-step with cached displacement
    disp = jnp.zeros((2,) + shape)
    outs = []
    for _ in range(3):
        warped, disp = semilagrangian.semilag_step(
            jnp.asarray(field, jnp.float32), jnp.asarray(velocity), disp, outval=0.0
        )
        outs.append(warped)
    np.testing.assert_allclose(
        np.asarray(direct), np.asarray(jnp.stack(outs)), atol=1e-4
    )


def test_irregular_timesteps():
    shape = (64, 64)
    field = _gaussian_blob(shape, 32, 32, 6.0)
    velocity = np.stack([np.full(shape, 1.0), np.full(shape, 0.0)])
    out = semilagrangian.extrapolate(field, velocity, [0.5, 1.5, 3.0], outval=0.0)
    assert out.shape == (3, 64, 64)
    iy, ix = np.unravel_index(np.argmax(np.asarray(out[-1])), shape)
    assert abs(ix - 35) <= 1


def test_return_displacement_only():
    shape = (32, 32)
    velocity = np.stack([np.full(shape, 1.0), np.full(shape, 2.0)])
    out, disp = semilagrangian.extrapolate(
        None, velocity, 4, return_displacement=True
    )
    assert out is None
    np.testing.assert_allclose(np.asarray(disp[0]), -4.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(disp[1]), -8.0, atol=0.15)


def test_eulerian_persistence():
    field = np.random.RandomState(0).rand(16, 16)
    out = get_method("eulerian")(field, None, 3)
    assert out.shape == (3, 16, 16)
    np.testing.assert_allclose(np.asarray(out[2]), field)


def test_cubic_interpolation_order3():
    shape = (64, 64)
    field = _gaussian_blob(shape, 32, 32, 6.0)
    velocity = np.stack([np.full(shape, 1.3), np.full(shape, -0.7)])
    out1 = np.asarray(
        semilagrangian.extrapolate(field, velocity, 2, outval=0.0, interp_order=1)
    )
    out3 = np.asarray(
        semilagrangian.extrapolate(field, velocity, 2, outval=0.0, interp_order=3)
    )
    assert out3.shape == (2, 64, 64)
    # cubic tracks the true translated Gaussian more closely than linear
    yy, xx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    truth = np.exp(
        -((yy - 32 + 1.4) ** 2 + (xx - 32 - 2.6) ** 2) / (2 * 6.0**2)
    )
    err1 = np.abs(out1[-1] - truth)[8:-8, 8:-8].max()
    err3 = np.abs(out3[-1] - truth)[8:-8, 8:-8].max()
    assert err3 < err1
