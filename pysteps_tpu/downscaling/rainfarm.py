"""
RainFARM stochastic downscaling (reference:
pysteps/downscaling/rainfarm.py; Rebora et al. 2006, D'Onofrio et al. 2014).

TPU-native: slope estimation, power-law phase-noise synthesis, spectral
fusion and kernel smoothing are all jnp FFT/conv ops; randomness comes
from a jax.random key.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pysteps_tpu.utils.dimension import aggregate_fields
from pysteps_tpu.utils.spectral import rapsd


@jax.jit
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
    domain (reference: rainfarm.py:100; D'Onofrio et al. 2014).
    Jit-traceable: PSD normalization stays on device."""
    nax = array_low.shape[0]
    nx = array_high.shape[0]
    k0 = nax // 2

    psd_low = rapsd(jnp.asarray(array_low))[k0 - 1] * nax**2
    psd_high = rapsd(jnp.asarray(array_high))[k0 - 1] * nx**2
    array_high = array_high * jnp.sqrt(psd_low / jnp.maximum(psd_high, 1e-30))

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


@partial(
    jax.jit,
    static_argnames=(
        "ds_factor", "kernel_type", "spectral_fusion", "use_threshold",
    ),
)
def _downscale_core(
    precip, precip_transformed, alpha, key, threshold,
    ds_factor, kernel_type, spectral_fusion, use_threshold,
):
    """One fused device program: noise synthesis, optional spectral
    fusion, kernel smoothing and coarse-aggregate conservation.  Eager
    op-by-op execution costs 30-60 ms per dispatch over the axon tunnel
    (and eager complex FFTs are unimplemented on the TPU path), so the
    whole pipeline traces into a single XLA executable; frequency grids
    and kernels are host-numpy closure constants (shape-static)."""
    m, n = precip.shape
    freq_array = _compute_freq_array(np.empty((m, n)))
    freq_array_highres = _compute_freq_array(np.empty((m, n)), ds_factor)

    noise_field = _compute_noise_field(freq_array_highres, alpha, key)

    if spectral_fusion:
        noise_field = noise_field / noise_field.shape[0] ** 2
        noise_field = jnp.exp(noise_field)
        noise_field = _apply_spectral_fusion(
            precip_transformed, noise_field, freq_array,
            freq_array_highres, ds_factor,
        )

    noise_field = noise_field / jnp.std(noise_field)
    noise_field = jnp.exp(noise_field)

    noise_lowres = aggregate_fields(noise_field, ds_factor, axis=(0, 1))

    precip_expanded = jnp.kron(precip, jnp.ones((ds_factor, ds_factor)))
    noise_lowres_expanded = jnp.kron(
        noise_lowres, jnp.ones((ds_factor, ds_factor))
    )

    if kernel_type:
        kernel = _make_kernel[kernel_type](ds_factor)
        precip_expanded = _balanced_spatial_average(precip_expanded, kernel)
        noise_lowres_expanded = _balanced_spatial_average(
            noise_lowres_expanded, kernel
        )

    norm_k0 = precip_expanded / jnp.maximum(noise_lowres_expanded, 1e-12)
    precip_highres = noise_field * norm_k0

    if use_threshold:
        precip_highres = jnp.where(
            precip_highres < threshold, 0.0, precip_highres
        )
    return precip_highres


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
    if kernel_type and kernel_type not in _make_kernel:
        raise ValueError(
            f"kernel type '{kernel_type}' is invalid, available: "
            f"{list(_make_kernel)}"
        )
    if key is None:
        key = jax.random.PRNGKey(seed if seed is not None else 0)
    k_gauss, k_noise = jax.random.split(key)

    precip_j = jnp.asarray(precip, jnp.float32)
    precip_transformed = (
        _gaussianize(precip_j, k_gauss) if spectral_fusion else precip_j
    )

    if alpha is None:
        # host-side slope fit (np.polyfit on the log-log PSD); one small
        # D2H of the gaussianized field when fusion is on
        freq_array = _compute_freq_array(precip)
        alpha = _estimate_alpha(
            np.asarray(precip_transformed) if spectral_fusion else precip,
            freq_array,
        )

    precip_highres = _downscale_core(
        precip_j, precip_transformed, jnp.float32(alpha), k_noise,
        jnp.float32(threshold if threshold is not None else 0.0),
        ds_factor=ds_factor, kernel_type=kernel_type,
        spectral_fusion=bool(spectral_fusion),
        use_threshold=threshold is not None,
    )

    if return_alpha:
        return precip_highres, alpha
    return precip_highres


def downscale_ensemble(
    precip,
    ds_factor,
    n_members,
    alpha=None,
    threshold=None,
    kernel_type=None,
    spectral_fusion=False,
    seed=None,
):
    """Batched RainFARM: ``n_members`` independent realizations in ONE
    device program (vmap over noise keys).  TPU-native extension of the
    reference's single-realization API (rainfarm.py:212) — ensemble
    downscaling of a nowcast otherwise pays per-call dispatch latency
    for every member.  Returns (n_members, m*ds, n*ds)."""
    precip = np.asarray(precip, np.float64)
    if not np.isfinite(precip).all():
        raise ValueError("All values in 'precip' must be finite.")
    key = jax.random.PRNGKey(seed if seed is not None else 0)
    k_gauss, k_noise = jax.random.split(key)
    precip_j = jnp.asarray(precip, jnp.float32)
    precip_transformed = (
        _gaussianize(precip_j, k_gauss) if spectral_fusion else precip_j
    )
    if alpha is None:
        freq_array = _compute_freq_array(precip)
        alpha = _estimate_alpha(
            np.asarray(precip_transformed) if spectral_fusion else precip,
            freq_array,
        )
    keys = jax.random.split(k_noise, n_members)
    return jax.vmap(
        lambda k: _downscale_core(
            precip_j, precip_transformed, jnp.float32(alpha), k,
            jnp.float32(threshold if threshold is not None else 0.0),
            ds_factor=ds_factor, kernel_type=kernel_type,
            spectral_fusion=bool(spectral_fusion),
            use_threshold=threshold is not None,
        )
    )(keys)
