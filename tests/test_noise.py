import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pysteps_tpu.noise import fftgenerators, motion as noise_motion
from pysteps_tpu.utils import spectral


@pytest.fixture(scope="module")
def rain_field(synthetic_precip):
    # dB-like transform of the synthetic rain
    f = np.array(synthetic_precip[-1])
    f[f < 0.1] = 0.1
    return (10 * np.log10(f)).astype(np.float32)


def test_nonparam_filter_and_generation(rain_field):
    F = fftgenerators.initialize_nonparam_2d_fft_filter(rain_field)
    assert F["field"].shape == (256, 129)
    N = fftgenerators.generate_noise_2d_fft_filter(F, key=jax.random.PRNGKey(0))
    assert N.shape == (256, 256)
    np.testing.assert_allclose(float(jnp.mean(N)), 0.0, atol=1e-4)
    np.testing.assert_allclose(float(jnp.std(N)), 1.0, atol=1e-4)
    # different keys give different fields
    N2 = fftgenerators.generate_noise_2d_fft_filter(F, key=jax.random.PRNGKey(1))
    assert float(jnp.max(jnp.abs(N - N2))) > 0.1


def test_noise_spectrum_is_red(rain_field):
    """The correlated noise should inherit the input's red spectrum."""
    F = fftgenerators.initialize_nonparam_2d_fft_filter(rain_field)
    N = fftgenerators.generate_noise_2d_fft_filter(F, key=jax.random.PRNGKey(3))
    psd_noise = np.asarray(spectral.rapsd(N))
    # low wavenumbers carry far more power than high ones
    assert psd_noise[1:8].mean() > 10 * psd_noise[-16:].mean()


def test_param_filter(rain_field):
    F = fftgenerators.initialize_param_2d_fft_filter(rain_field)
    assert F["model"] == "power-law"
    assert len(F["pars"]) == 4
    # fitted slopes should be negative (red spectrum)
    assert F["pars"][2] < 0 and F["pars"][3] < 0
    N = fftgenerators.generate_noise_2d_fft_filter(F, key=jax.random.PRNGKey(0))
    assert N.shape == (256, 256)
    np.testing.assert_allclose(float(jnp.std(N)), 1.0, atol=1e-4)


def test_ssft_filter(rain_field):
    F = fftgenerators.initialize_nonparam_2d_ssft_filter(
        rain_field, win_size=(128, 128), overlap=0.3
    )
    assert F["field"].shape == (2, 2, 256, 256)
    N = fftgenerators.generate_noise_2d_ssft_filter(F, key=jax.random.PRNGKey(0))
    assert N.shape == (256, 256)
    np.testing.assert_allclose(float(jnp.std(N)), 1.0, atol=1e-3)


def test_nested_filter(rain_field):
    F = fftgenerators.initialize_nonparam_2d_nested_filter(
        rain_field, max_level=2
    )
    assert F["field"].shape == (4, 4, 256, 256)
    N = fftgenerators.generate_noise_2d_ssft_filter(F, key=jax.random.PRNGKey(0))
    assert N.shape == (256, 256)


def test_bps_velocity_perturbator():
    V = np.stack([np.full((64, 64), 2.0), np.full((64, 64), 1.0)])
    pert = noise_motion.initialize_bps(
        V, pixelsperkm=1.0, timestep=5.0, key=jax.random.PRNGKey(7)
    )
    dV10 = pert and noise_motion.generate_bps(pert, 10.0)
    dV60 = noise_motion.generate_bps(pert, 60.0)
    assert dV10.shape == (2, 64, 64)
    # magnitude grows with lead time
    assert float(jnp.abs(dV60).mean()) > float(jnp.abs(dV10).mean())


def test_noise_stddev_adjs(rain_field):
    from pysteps_tpu.cascade import bandpass_filters
    from pysteps_tpu.noise.utils import compute_noise_stddev_adjs

    bp = bandpass_filters.filter_gaussian((256, 256), 6)
    F = fftgenerators.initialize_nonparam_2d_fft_filter(rain_field)
    coeffs = compute_noise_stddev_adjs(
        rain_field, 10 * np.log10(0.1), float(rain_field.min()), bp,
        None, F, None, 5, key=jax.random.PRNGKey(0),
    )
    coeffs = np.asarray(coeffs)
    assert coeffs.shape == (6,)
    assert np.all(coeffs > 0) and np.all(np.isfinite(coeffs))
