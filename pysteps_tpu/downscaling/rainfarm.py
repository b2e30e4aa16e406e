"""
RainFARM stochastic downscaling (reference:
pysteps/downscaling/rainfarm.py; Rebora et al. 2006, D'Onofrio et al. 2014).

TPU-native: slope estimation, power-law phase-noise synthesis, spectral
fusion and kernel smoothing are all jnp FFT/conv ops; randomness comes
from a jax.random key.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pysteps_tpu.utils.dimension import aggregate_fields
from pysteps_tpu.utils.spectral import rapsd


def _gaussianize(precip, key):
    """Rank-order gaussianization (reference: rainfarm.py:28)."""
    flat = jnp.asarray(precip).ravel()
    order = jnp.argsort(flat)
    normal_sorted = jnp.sort(jax.random.normal(key, flat.shape))
    out = jnp.zeros_like(flat).at[order].set(normal_sorted)
    out = out.reshape(jnp.asarray(precip).shape)
    sd = jnp.std(out)
    return out / jnp.where(sd == 0, 1.0, sd)


def _compute_freq_array(array, ds_factor=1):
    freq_i = np.fft.fftfreq(array.shape[0] * ds_factor, d=1 / ds_factor)
    freq_j = np.fft.fftfreq(array.shape[1] * ds_factor, d=1 / ds_factor)
    return np.sqrt(freq_i[:, None] ** 2 + freq_j[None, :] ** 2)


def _log_slope(log_k, log_power_spectrum):
    """Mid-range log-log slope fit (reference: rainfarm.py:54)."""
    lk_min, lk_max = log_k.min(), log_k.max()
    lk_range = lk_max - lk_min
    sel = (lk_min + lk_range / 6 <= log_k) & (log_k <= lk_max - lk_range / 6)
    return -np.polyfit(log_k[sel], log_power_spectrum[sel], 1)[0]


def _estimate_alpha(array, k):
    """Spectral-slope estimate (reference: rainfarm.py:72)."""
    fp_abs = np.abs(np.fft.fft2(np.asarray(array)))
    with np.errstate(divide="ignore"):
        log_ps = np.log(fp_abs**2)
    valid = (k != 0) & np.isfinite(log_ps)
    return _log_slope(np.log(k[valid]), log_ps[valid])


def _compute_noise_field(freq_array_highres, alpha, key):
    """Power-law phase noise (reference: rainfarm.py:84)."""
    white = jax.random.uniform(key, freq_array_highres.shape)
    phases = jnp.exp(1j * 2 * jnp.pi * white)
    k = jnp.asarray(freq_array_highres)
    with np.errstate(divide="ignore"):
        amp = jnp.where(k > 0, k ** (-alpha / 2.0), 0.0)
    field = phases * amp
    field = field.at[0, 0].set(0.0)
    return jnp.real(jnp.fft.ifft2(field))


def _apply_spectral_fusion(array_low, array_high, freq_array_low, freq_array_high, ds_factor):
    """Merge low-res observations with high-res noise in the frequency
    domain (reference: rainfarm.py:100; D'Onofrio et al. 2014)."""
    nax = array_low.shape[0]
    nx = array_high.shape[0]
    k0 = nax // 2

    psd_low = float(np.asarray(rapsd(jnp.asarray(array_low)))[k0 - 1]) * nax**2
    psd_high = float(np.asarray(rapsd(jnp.asarray(array_high)))[k0 - 1]) * nx**2
    array_high = array_high * np.sqrt(psd_low / max(psd_high, 1e-30))

    fft_low = jnp.fft.fft2(jnp.asarray(array_low))
    fft_high = jnp.fft.fft2(jnp.asarray(array_high))

    fft_merged = jnp.zeros_like(fft_high)
    fft_merged = fft_merged.at[0:k0, 0:k0].set(fft_low[0:k0, 0:k0])
    fft_merged = fft_merged.at[nx - k0 : nx, 0:k0].set(fft_low[k0 : 2 * k0, 0:k0])
    fft_merged = fft_merged.at[0:k0, nx - k0 : nx].set(fft_low[0:k0, k0 : 2 * k0])
    fft_merged = fft_merged.at[nx - k0 : nx, nx - k0 : nx].set(
        fft_low[k0 : 2 * k0, k0 : 2 * k0]
    )
    fft_merged = fft_merged.at[k0, 0].set(jnp.conj(fft_merged[nx - k0, 0]))
    fft_merged = fft_merged.at[0, k0].set(jnp.conj(fft_merged[0, nx - k0]))

    freq_i = np.fft.fftfreq(nx, d=1 / ds_factor)
    freq_i = np.tile(freq_i, (nx, 1))
    freq_j = freq_i.T
    ddx = np.pi * (1 / nax - 1 / nx) / np.abs(freq_i[0, 1] - freq_i[0, 0])

    mask_high = freq_array_high**2 > freq_array_low[k0, k0] ** 2
    phase = jnp.exp(-1j * ddx * jnp.asarray(freq_i) - 1j * ddx * jnp.asarray(freq_j))
    fft_merged = fft_high * jnp.asarray(mask_high) + fft_merged * jnp.asarray(
        ~mask_high
    ) * phase
    return jnp.real(jnp.fft.ifft2(fft_merged)) / fft_merged.size


def _compute_kernel_radius(ds_factor):
    return int(round(ds_factor / np.sqrt(np.pi)))


def _make_tophat_kernel(ds_factor):
    radius = _compute_kernel_radius(ds_factor)
    mx, my = np.mgrid[-radius : radius + 0.01, -radius : radius + 0.01]
    tophat = ((mx**2 + my**2) <= radius**2).astype(float)
    return tophat / tophat.sum()


def _make_gaussian_kernel(ds_factor):
    radius = _compute_kernel_radius(ds_factor)
    sigma2 = (ds_factor / 2) ** 2
    x = np.arange(-radius, radius + 1)
    k1 = np.exp(-0.5 / sigma2 * x**2)
    k2 = np.outer(k1, k1)
    return k2 / k2.sum()


_make_kernel = {
    "gaussian": _make_gaussian_kernel,
    "tophat": _make_tophat_kernel,
    "uniform": _make_tophat_kernel,
}


def _balanced_spatial_average(array, kernel):
    """NaN-aware kernel average (reference: rainfarm.py:192)."""
    arr = jnp.asarray(array)
    valid = jnp.isfinite(arr)
    filled = jnp.where(valid, arr, 0.0)
    k = jnp.asarray(kernel, jnp.float32)[None, None]
    conv = jax.lax.conv_general_dilated(filled[None, None], k, (1, 1), "SAME")[0, 0]
    norm = jax.lax.conv_general_dilated(
        valid.astype(jnp.float32)[None, None], k, (1, 1), "SAME"
    )[0, 0]
    out = conv / jnp.maximum(norm, 1e-12)
    return jnp.where(valid, out, jnp.nan)


def downscale(
    precip,
    ds_factor,
    alpha=None,
    threshold=None,
    return_alpha=False,
    kernel_type=None,
    spectral_fusion=False,
    seed=None,
    key=None,
):
    """RainFARM spatial downscaling by ``ds_factor``
    (reference: rainfarm.py:212).  Returns (m*ds, n*ds)."""
    precip = np.asarray(precip, np.float64)
    if not np.isfinite(precip).all():
        raise ValueError("All values in 'precip' must be finite.")
    if not isinstance(ds_factor, int) or ds_factor <= 0:
        raise ValueError("'ds_factor' must be a positive integer.")
    if key is None:
        key = jax.random.PRNGKey(seed if seed is not None else 0)
    k_gauss, k_noise = jax.random.split(key)

    precip_transformed = (
        np.asarray(_gaussianize(precip, k_gauss)) if spectral_fusion else precip
    )

    freq_array = _compute_freq_array(precip_transformed)
    freq_array_highres = _compute_freq_array(precip_transformed, ds_factor)

    if alpha is None:
        alpha = _estimate_alpha(precip_transformed, freq_array)

    noise_field = _compute_noise_field(freq_array_highres, alpha, k_noise)

    if spectral_fusion:
        noise_field = noise_field / noise_field.shape[0] ** 2
        noise_field = jnp.exp(noise_field)
        noise_field = _apply_spectral_fusion(
            precip_transformed, np.asarray(noise_field), freq_array,
            freq_array_highres, ds_factor,
        )

    noise_field = noise_field / jnp.std(noise_field)
    noise_field = jnp.exp(noise_field)

    noise_lowres = aggregate_fields(noise_field, ds_factor, axis=(0, 1))

    precip_expanded = jnp.kron(
        jnp.asarray(precip), jnp.ones((ds_factor, ds_factor))
    )
    noise_lowres_expanded = jnp.kron(
        noise_lowres, jnp.ones((ds_factor, ds_factor))
    )

    if kernel_type:
        if kernel_type not in _make_kernel:
            raise ValueError(
                f"kernel type '{kernel_type}' is invalid, available: "
                f"{list(_make_kernel)}"
            )
        kernel = _make_kernel[kernel_type](ds_factor)
        precip_expanded = _balanced_spatial_average(precip_expanded, kernel)
        noise_lowres_expanded = _balanced_spatial_average(
            noise_lowres_expanded, kernel
        )

    norm_k0 = precip_expanded / jnp.maximum(noise_lowres_expanded, 1e-12)
    precip_highres = noise_field * norm_k0

    if threshold is not None:
        precip_highres = jnp.where(precip_highres < threshold, 0.0, precip_highres)

    if return_alpha:
        return precip_highres, alpha
    return precip_highres
