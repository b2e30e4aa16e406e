"""
Local Lagrangian exceedance probability nowcast
(reference: pysteps/nowcasts/lagrangian_probability.py:20-130;
Germann & Zawadzki 2004).

Extrapolation nowcast -> binary exceedance -> circular-kernel smoothing
with a kernel radius growing linearly with lead time (one XLA conv per
lead time).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pysteps_tpu.nowcasts import extrapolation


def forecast(
    precip,
    velocity,
    timesteps,
    threshold,
    extrap_method="semilagrangian",
    extrap_kwargs=None,
    slope=5,
):
    """P(R >= threshold) with spatial scale = slope * leadtime
    (reference: lagrangian_probability.py:20).  Returns (T, m, n)."""
    # deterministic extrapolation
    precip_forecast = extrapolation.forecast(
        precip, velocity, timesteps,
        extrap_method=extrap_method, extrap_kwargs=extrap_kwargs,
    )
    if isinstance(timesteps, int):
        timesteps = np.arange(1, timesteps + 1)
    timesteps = np.asarray(timesteps, float)

    # kernel stack: one centred circular kernel per lead, padded to the
    # largest radius (host-numpy constant keyed by the lead list)
    r_max = int(np.ceil(max(float(slope * timesteps[-1]), 1.0)))
    k_sz = 2 * r_max + 1
    yy, xx = np.mgrid[-r_max : r_max + 1, -r_max : r_max + 1]
    kernels = np.stack([
        (yy**2 + xx**2 <= max(slope * t, 1.0) ** 2).astype(np.float32)
        for t in timesteps
    ])
    return _lagprob_core(
        jnp.asarray(precip_forecast), kernels, jnp.float32(threshold),
        k_sz=k_sz,
    )


@partial(jax.jit, static_argnames=("k_sz",))
def _lagprob_core(precip_forecast, kernels, threshold, k_sz):
    """All leads in ONE device program.  The growing circular kernels
    (up to (2*slope*T+1)^2 taps) make direct spatial convolution
    VPU-bound and the reference's per-lead loop dispatch-bound on TPU;
    here the T neighborhood averages are one batched FFT convolution,
    zero-padded so the result matches SAME zero-boundary semantics, with
    a NaN-validity normalization (reference semantics:
    lagrangian_probability.py:85-110 mean filter over valid pixels)."""
    T, m, n = precip_forecast.shape
    r = (k_sz - 1) // 2
    # FFT size: next multiple of 256 covering the linear-conv support
    P_m = int(-((m + k_sz - 1) // -256) * 256)
    P_n = int(-((n + k_sz - 1) // -256) * 256)

    valid = jnp.isfinite(precip_forecast)
    exceed = jnp.where(
        valid & (precip_forecast >= threshold), 1.0, 0.0
    ).astype(jnp.float32)
    validf = valid.astype(jnp.float32)

    fields = jnp.concatenate([exceed, validf], axis=0)  # (2T, m, n)
    F = jnp.fft.rfft2(fields, s=(P_m, P_n))
    Kf = jnp.fft.rfft2(jnp.asarray(kernels), s=(P_m, P_n))
    Kf2 = jnp.concatenate([Kf, Kf], axis=0)
    conv = jnp.fft.irfft2(F * Kf2, s=(P_m, P_n))
    # kernels are centred at (r, r) in their grid: the SAME-aligned
    # window sum for output pixel (i, j) sits at (i + r, j + r)
    conv = jax.lax.dynamic_slice(conv, (0, r, r), (2 * T, m, n))
    num, den = conv[:T], conv[T:]
    # clip FFT roundoff (|error| ~1e-7 of the window sum) into [0, 1]
    prob = jnp.clip(num / jnp.maximum(den, 1e-8), 0.0, 1.0)
    return jnp.where(den > 0.5, prob, jnp.nan)
