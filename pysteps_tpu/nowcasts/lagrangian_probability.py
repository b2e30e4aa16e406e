"""
Local Lagrangian exceedance probability nowcast
(reference: pysteps/nowcasts/lagrangian_probability.py:20-130;
Germann & Zawadzki 2004).

Extrapolation nowcast -> binary exceedance -> circular-kernel smoothing
with a kernel radius growing linearly with lead time (one XLA conv per
lead time).
"""

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
    precip_forecast = jnp.asarray(precip_forecast)
    if isinstance(timesteps, int):
        timesteps = np.arange(1, timesteps + 1)
    timesteps = np.asarray(timesteps, float)

    outs = []
    for i, t in enumerate(timesteps):
        exceed = (precip_forecast[i] >= threshold).astype(jnp.float32)
        valid = jnp.isfinite(precip_forecast[i]).astype(jnp.float32)
        radius = max(slope * t, 1.0)
        kernel = _circle_kernel(radius)
        num = _conv2d_same(exceed * valid, kernel)
        den = _conv2d_same(valid, kernel)
        P = jnp.where(den > 0, num / jnp.maximum(den, 1e-8), jnp.nan)
        outs.append(P)
    return jnp.stack(outs)


def _circle_kernel(radius):
    r = int(np.ceil(radius))
    yy, xx = np.mgrid[-r : r + 1, -r : r + 1]
    return jnp.asarray((yy**2 + xx**2 <= radius**2).astype(np.float32))


def _conv2d_same(field, kernel):
    return jax.lax.conv_general_dilated(
        field[None, None], kernel[None, None], (1, 1), "SAME"
    )[0, 0]
