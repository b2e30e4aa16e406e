"""
ANVIL nowcast: autoregressive nowcasting using VIL
(reference: pysteps/nowcasts/anvil.py:37-505; Pulkkinen, Chandrasekar,
van Lier-Walqui & Harkema 2020).

Key features (reference docstring): ARI(p,1) integrated AR on differenced
cascades, spatially localized AR parameters via Gaussian moving-window
correlations, empirical localized R(VIL) regression, rain-rate mask.

TPU-native: localized correlations and the R(VIL) regression are separable
Gaussian convolutions; the per-pixel ARI update is a fused broadcast
multiply-add over (levels, lags, m, n); the lead-time loop is a lax.scan.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from pysteps_tpu import cascade
from pysteps_tpu.extrapolation.semilagrangian import integrate_displacement, model_warp
from pysteps_tpu.nowcasts.steps import _lagrangian_alignment
from pysteps_tpu.timeseries import autoregression


def _gaussian_kernel1d(radius):
    half = int(max(round(4.0 * radius), 1))
    x = jnp.arange(-half, half + 1, dtype=jnp.float32)
    k = jnp.exp(-(x**2) / (2.0 * float(radius) ** 2))
    return k / jnp.sum(k)


def _gauss_filter(field, k1d):
    f = field[None, None]
    out = jax.lax.conv_general_dilated(f, k1d[None, None, :, None], (1, 1), "SAME")
    out = jax.lax.conv_general_dilated(out, k1d[None, None, None, :], (1, 1), "SAME")
    return out[0, 0]


def _gauss_filter_batch(fields, k1d):
    """Separable Gaussian filtering of a (B, m, n) stack as ONE conv
    pair — per-field convs with the 4-sigma (radius 50 -> 401-tap)
    kernel compile pathologically when replicated dozens of times."""
    f = fields[:, None]
    out = jax.lax.conv_general_dilated(f, k1d[None, None, :, None], (1, 1), "SAME")
    out = jax.lax.conv_general_dilated(out, k1d[None, None, None, :], (1, 1), "SAME")
    return out[:, 0]


def _moving_window_corrcoef(x, y, window_radius, mask):
    """Zero-mean localized correlation (reference: anvil.py:389)."""
    w = mask.astype(jnp.float32)
    x = jnp.where(mask, x, 0.0)
    y = jnp.where(mask, y, 0.0)
    if window_radius is not None:
        k = _gaussian_kernel1d(window_radius)
        n = _gauss_filter(w, k)
        ssx = _gauss_filter(x * x, k)
        ssy = _gauss_filter(y * y, k)
        sxy = _gauss_filter(x * y, k)
    else:
        n = jnp.mean(w)
        ssx, ssy, sxy = jnp.mean(x * x), jnp.mean(y * y), jnp.mean(x * y)
    n = jnp.maximum(n, 1e-6)
    stdx = jnp.sqrt(ssx / n)
    stdy = jnp.sqrt(ssy / n)
    cov = sxy / n
    ok = (stdx > 1e-8) & (stdy > 1e-8) & (n > 1e-3)
    return jnp.where(ok, cov / jnp.maximum(stdx * stdy, 1e-12), 0.0)


def _estimate_ar1_params(gamma):
    """ARI(1,1) per-pixel parameters (reference: anvil.py helper)."""
    return jnp.stack([1.0 + gamma[0], -gamma[0], jnp.zeros_like(gamma[0])])


def _estimate_ar2_params(gamma):
    """ARI(2,1) per-pixel parameters (reference: anvil.py helper)."""
    denom = jnp.maximum(1.0 - gamma[0] * gamma[0], 1e-8)
    pd1 = gamma[0] * (1.0 - gamma[1]) / denom
    pd2 = (gamma[1] - gamma[0] * gamma[0]) / denom
    return jnp.stack([1.0 + pd1, -pd1 + pd2, -pd2, jnp.zeros_like(pd1)])


def _r_vil_regression(vil, r, window_radius):
    """Localized linear regression R = a*VIL + b (reference: anvil.py:431)."""
    vil = jnp.where(jnp.isfinite(vil), vil, 0.0)
    r = jnp.where(jnp.isfinite(r), r, 0.0)
    mask_vil = vil > 10.0
    mask_obs = mask_vil & (r > 0.1)
    vilm = jnp.where(mask_obs, vil, 0.0)
    rm = jnp.where(mask_obs, r, 0.0)
    k = _gaussian_kernel1d(window_radius)
    n = _gauss_filter(mask_obs.astype(jnp.float32), k)
    sx = _gauss_filter(vilm, k)
    sx2 = _gauss_filter(vilm * vilm, k)
    sxy = _gauss_filter(vilm * rm, k)
    sy = _gauss_filter(rm, k)
    det = sx2 * n - sx * sx
    ok = (jnp.abs(det) > 1e-8) & (n > 0.01)
    c = 1.0 / jnp.where(ok, det, 1.0)
    a = jnp.where(ok & mask_vil, c * (n * sxy - sx * sy), 0.0)
    b = jnp.where(ok & mask_vil, c * (-sx * sxy + sx2 * sy), 0.0)
    return a, b


def _alignment_validity(velocity, p1, n_iter=1, max_disp=None):
    """Validity masks of the Lagrangian alignment: the reference extrapolates
    with ``outval=np.nan`` (reference: extrapolation/semilagrangian.py:25),
    so pixels advected from outside the domain are NaN and excluded from the
    ANVIL mask (reference: anvil.py:232-235).  Warping a ones-field with
    cval=0 through the same displacement chain reproduces that boundary
    strip without putting NaNs through the FFT decomposition."""
    ones = jnp.ones(velocity.shape[1:], jnp.float32)
    outs = []
    for i in range(p1):
        disp = jnp.zeros_like(velocity)
        for _ in range(p1 - 1 - i):
            disp = integrate_displacement(
                velocity, disp, 1.0, n_iter=n_iter, max_disp=max_disp
            )
        outs.append(
            model_warp(ones, disp, max_disp=max_disp, interp_order=1, cval=0.0)
        )
    return jnp.stack(outs)


def _iterate_ari_localized(window, phi):
    """One ARI step with per-pixel parameters.

    window: (k, p, m, n); phi: (k, p+1, m, n) — lag i uses phi[:, i] on
    window[:, -(i+1)] (innovation term phi[:, -1] is zero for ANVIL).
    """
    p = window.shape[1]
    coeffs = phi[:, :p][:, ::-1]  # align oldest-first
    x_new = jnp.sum(window * coeffs, axis=1)
    return jnp.concatenate([window[:, 1:], x_new[:, None]], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("ar_order", "ar_window_radius", "n_iter", "interp_order"),
)
def _anvil_init(vil_j, velocity_j, weights_2d, finite_all, ar_order,
                ar_window_radius, n_iter, interp_order):
    """Fused ANVIL initialization (reference: anvil.py:389-470):
    Lagrangian alignment + validity, non-normalized cascade
    decomposition, Gaussian moving-window lag correlations of the
    differenced cascades, lag-2 adjustment and the localized ARI
    parameter solve — one compiled program."""
    from pysteps_tpu.cascade.decomposition import decompose_core

    p1, m, n = vil_j.shape
    vil_aligned = _lagrangian_alignment(
        vil_j, velocity_j, n_iter=n_iter, interp_order=interp_order
    )
    valid = _alignment_validity(velocity_j, p1, n_iter=n_iter)
    mask = finite_all & jnp.all(valid > 0.9999, axis=0)
    rr_auto_mask = (vil_j[-1] < 0.1) & mask

    vil_dec = jnp.stack(
        [
            decompose_core(vil_aligned[i], weights_2d, normalize=False)[0]
            for i in range(p1)
        ],
        axis=1,
    )  # (k, t, m, n)
    vil_diff = jnp.diff(vil_dec, axis=1)
    # localized lag correlations, all filtered fields batched into one
    # separable conv pair (k levels x ar_order lags x {y^2, x*y} + x^2
    # + the window-weight field)
    k_levels = vil_diff.shape[0]
    k1d = _gaussian_kernel1d(ar_window_radius)
    xs = vil_diff[:, -1]  # (k, m, n)
    ys = jnp.stack(
        [vil_diff[:, -(j + 2)] for j in range(ar_order)], axis=1
    )  # (k, p, m, n)
    fields = jnp.concatenate(
        [
            jnp.ones((1, m, n), jnp.float32),
            xs * xs,
            (ys * ys).reshape(-1, m, n),
            (xs[:, None] * ys).reshape(-1, m, n),
        ],
        axis=0,
    )
    filt = _gauss_filter_batch(fields, k1d)
    n_w = jnp.maximum(filt[0], 1e-6)
    ssx = filt[1 : 1 + k_levels]
    ssy = filt[1 + k_levels : 1 + k_levels * (1 + ar_order)].reshape(
        k_levels, ar_order, m, n
    )
    sxy = filt[1 + k_levels * (1 + ar_order) :].reshape(
        k_levels, ar_order, m, n
    )
    stdx = jnp.sqrt(ssx / n_w)[:, None]
    stdy = jnp.sqrt(ssy / n_w)
    cov = sxy / n_w
    ok = (stdx > 1e-8) & (stdy > 1e-8) & (n_w > 1e-3)
    gamma = jnp.where(
        ok, cov / jnp.maximum(stdx * stdy, 1e-12), 0.0
    )  # (k, ar_order, m, n)
    if ar_order == 2:
        g2 = autoregression.adjust_lag2_corrcoef2(gamma[:, 0], gamma[:, 1])
        gamma = jnp.stack([gamma[:, 0], g2], axis=1)
        phi = jax.vmap(_estimate_ar2_params)(gamma)
    else:
        phi = jax.vmap(_estimate_ar1_params)(gamma)
    window0 = vil_dec[:, -(ar_order + 1):]
    return window0, phi, mask, rr_auto_mask


@functools.partial(
    jax.jit,
    static_argnames=("int_steps", "use_rvil", "apply_rainrate_mask", "n_iter", "interp_order", "max_disp"),
)
def _anvil_scan(
    window0, velocity, phi, mask, rainrate_mask, r_vil_a, r_vil_b,
    domain_mask, int_steps, use_rvil, apply_rainrate_mask,
    n_iter, interp_order, max_disp=None,
):
    m, n = velocity.shape[1:]
    displacement0 = jnp.zeros((2, m, n), jnp.float32)

    def step(carry, _):
        window, displacement = carry
        window = _iterate_ari_localized(window, phi)
        vil_f = jnp.sum(window[:, -1], axis=0)  # non-normalized recompose
        vil_f = jnp.where(mask, vil_f, jnp.nan)
        if use_rvil:
            rr = r_vil_a * vil_f + r_vil_b
        else:
            rr = vil_f
            if apply_rainrate_mask:
                rr = jnp.where(rainrate_mask, 0.0, rr)
        rr = jnp.maximum(rr, 0.0)
        displacement = integrate_displacement(
            velocity, displacement, 1.0, n_iter=n_iter, max_disp=max_disp
        )
        out = model_warp(
            rr, displacement, max_disp=max_disp, interp_order=interp_order,
            cval=jnp.nan,
        )
        out = jnp.where(domain_mask, jnp.nan, out)
        return (window, displacement), out

    _, outputs = jax.lax.scan(step, (window0, displacement0), None, length=int_steps)
    return outputs


def forecast(
    vil,
    velocity,
    timesteps,
    rainrate=None,
    n_cascade_levels=6,
    extrap_method="semilagrangian",
    ar_order=2,
    ar_window_radius=50,
    r_vil_window_radius=3,
    fft_method="numpy",
    apply_rainrate_mask=True,
    num_workers=1,
    extrap_kwargs=None,
    filter_kwargs=None,
    measure_time=False,
):
    """ANVIL forecast with the reference's signature
    (reference: anvil.py:37).  vil: (ar_order+2, m, n)."""
    t0 = time.time()
    vil = np.asarray(vil, dtype=np.float32)
    if vil.ndim != 3 or vil.shape[0] != ar_order + 2:
        raise ValueError(
            f"vil must have shape (ar_order+2, m, n); got {vil.shape}"
        )
    if ar_order not in (1, 2):
        raise ValueError("ar_order must be 1 or 2")
    extrap_kwargs = dict(extrap_kwargs or {})
    filter_kwargs = filter_kwargs or {}
    m, n = vil.shape[1:]

    domain_mask = ~np.isfinite(vil[-1])
    rainrate_mask0 = (
        jnp.asarray(vil[-1] < 0.1) if (rainrate is None and apply_rainrate_mask)
        else jnp.zeros((m, n), dtype=bool)
    )
    if rainrate is not None:
        r_vil_a, r_vil_b = _r_vil_regression(
            jnp.asarray(vil[-1]), jnp.asarray(rainrate, jnp.float32),
            r_vil_window_radius,
        )
    else:
        r_vil_a = r_vil_b = jnp.zeros((m, n), jnp.float32)

    vil_filled = np.where(np.isfinite(vil), vil, np.nan)
    vil_j = jnp.asarray(np.nan_to_num(vil_filled, nan=0.0))
    finite_all = jnp.all(jnp.isfinite(jnp.asarray(vil_filled)), axis=0)
    velocity_j = jnp.asarray(velocity, jnp.float32)

    bp_filter = cascade.get_method("gaussian")((m, n), n_cascade_levels, **filter_kwargs)
    weights_2d = bp_filter["weights_2d"].astype(jnp.float32)

    # the whole init — alignment, validity, decomposition, localized lag
    # correlations and the per-pixel AR solve — is ONE fused jit: the
    # eager per-level/per-lag loops cost ~180 tunnel dispatches (~9 s of
    # the previous ~11 s warm forecast)
    window0, phi, mask, rr_auto_mask = _anvil_init(
        vil_j, velocity_j, weights_2d, finite_all,
        int(ar_order), int(ar_window_radius),
        int(extrap_kwargs.get("n_iter", 1)),
        int(extrap_kwargs.get("interp_order", 1)),
    )
    if rainrate is None and apply_rainrate_mask:
        rainrate_mask0 = rr_auto_mask

    if isinstance(timesteps, int):
        int_steps = timesteps
        subsel = None
    else:
        subsel = list(timesteps)
        int_steps = int(np.ceil(max(subsel)))

    init_time = time.time() - t0

    on_cpu = jax.default_backend() == "cpu"
    vmax = float(np.max(np.abs(np.asarray(velocity)))) if np.asarray(velocity).size else 0.0
    max_disp = max(int(np.ceil(int_steps * (vmax + 0.5))) + 2, 3)
    if on_cpu or max_disp > min(m, n) // 3:
        max_disp = None
    t1 = time.time()
    out = _anvil_scan(
        window0, velocity_j, phi, mask, rainrate_mask0, r_vil_a, r_vil_b,
        jnp.asarray(domain_mask), int_steps, rainrate is not None,
        bool(apply_rainrate_mask),
        extrap_kwargs.get("n_iter", 1), extrap_kwargs.get("interp_order", 1),
        max_disp=max_disp,
    )
    out.block_until_ready()
    loop_time = time.time() - t1

    if subsel is not None:
        frames = []
        for t_sub in subsel:
            if t_sub == int(t_sub):
                frames.append(out[int(t_sub) - 1])
            else:
                t_int = int(np.ceil(t_sub))
                lo = out[t_int - 2] if t_int >= 2 else out[0]
                hi = out[t_int - 1]
                w = t_sub - (t_int - 1)
                frames.append((1 - w) * lo + w * hi)
        out = jnp.stack(frames)

    if measure_time:
        return out, init_time, loop_time
    return out
