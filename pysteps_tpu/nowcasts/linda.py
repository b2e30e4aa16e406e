"""
LINDA: Lagrangian integro-difference equation model with autoregression
(reference: pysteps/nowcasts/linda.py:62-1511; Pulkkinen, Chandrasekar &
Niemi 2021).

Model structure (reference: _linda_deterministic_init:1062, _update:1410):
feature detection (<= max 25 cells) -> per-feature localized ARI(p,1) on
Lagrangian-differenced fields -> per-feature anisotropic Gaussian
convolution kernels (the IDE component) -> composite convolution blended
by per-feature window weights -> probabilistic mode adds per-cell
lognormal forecast-error perturbations.

TPU-native redesign:
- Features are a fixed-size padded set; window weights are a static
  (F, m, n) stack.
- The composite convolution evaluates ALL feature kernels in one grouped
  convolution (F kernels on a shared support) followed by a weighted sum —
  one conv op instead of the reference's per-kernel masked scipy convolve
  (linda.py:1396).
- Kernel parameters (anisotropic Gaussian) are fitted by a vmapped Adam
  loop on the weighted least-squares objective, replacing scipy.optimize
  per-cell fits (linda.py:673).
- The forecast loop is a lax.scan; ensemble members vmap.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from pysteps_tpu.extrapolation.semilagrangian import (
    integrate_displacement,
    model_warp,
)
from pysteps_tpu.feature import shitomasi
from pysteps_tpu.noise.fftgenerators import _spectral_white
from pysteps_tpu.noise.motion import (
    _laplace,
    get_default_params_bps_par,
    get_default_params_bps_perp,
)
from pysteps_tpu.nowcasts.steps import _lagrangian_alignment
from pysteps_tpu.ops.warp import warp

# static zero-pad margin for the SAME FFT convolutions: covers the
# half-support of the widest kernel the reference's optimizer box allows
# (sigma2 = ratio*sigma1 <= 50 px; wrap-around tail exp(-160^2/50^2) < 4e-5)
_KERNEL_PAD = 160


def _compute_window_weights(coords, grid_height, grid_width, window_radius):
    """Gaussian window weights around each feature
    (reference: linda.py:562)."""
    coords = np.asarray(coords, float)
    yy, xx = np.meshgrid(
        np.arange(grid_height, dtype=float), np.arange(grid_width, dtype=float),
        indexing="ij",
    )
    if coords.shape[0] == 1:
        return np.ones((1, grid_height, grid_width))
    w = np.stack(
        [
            np.exp(
                -0.5
                * (((yy - cy) ** 2 + (xx - cx) ** 2) / window_radius**2)
            )
            for cy, cx in coords
        ]
    )
    return w + 1e-6


def _kernel_ft(params, pm, pn):
    """rfft2 of the normalized anisotropic Gaussian kernel, evaluated
    analytically on the padded grid.

    The reference renders the kernel spatially on an adaptive cutoff-6
    bounding box (_compute_kernel_anisotropic, linda.py:463-490) — its
    fitted sigma2 = ratio*sigma1 can reach 50 px under the optimizer box,
    far beyond any practical static spatial support.  The closed-form
    transform exp(-pi^2 (sigma1^2 fu^2 + sigma2^2 fv^2)) represents any
    sigma exactly, keeps shapes static for jit, and is real-positive
    (even-symmetric kernel), so the per-feature convolutions are one
    real multiply in the spectrum.

    params: (phi, log_sigma1, log_ratio) in the reference's
    exp(-x'^2/sigma1^2 - y'^2/sigma2^2) convention with bounds
    sigma1 in [0.1, 10], ratio in [0.2, 5]
    (reference: _estimate_convol_params, linda.py:715)."""
    phi = params[0]
    sigma1 = jnp.clip(jnp.exp(params[1]), 0.1, 10.0)
    sigma2 = jnp.clip(jnp.exp(params[2]), 0.2, 5.0) * sigma1
    fy = jnp.fft.fftfreq(pm)[:, None].astype(jnp.float32)
    fx = jnp.fft.rfftfreq(pn)[None, :].astype(jnp.float32)
    c, s = jnp.cos(phi), jnp.sin(phi)
    fu = c * fx + s * fy
    fv = -s * fx + c * fy
    return jnp.exp(
        -(jnp.pi**2) * ((sigma1 * fu) ** 2 + (sigma2 * fv) ** 2)
    )


def _conv_kernels(field, kernels_ft):
    """SAME zero-padded convolution of one field with every feature
    kernel -> (F, m, n): pad by _KERNEL_PAD, multiply by the analytic
    kernel transforms, crop.

    A single-channel wide spatial conv is VPU-bound on TPU (~30-45 ms at
    256^2 — it dominated the benched LINDA scan); the FFT formulation is
    ~2 batched transforms.  A zero margin >= the kernel half-support
    makes the circular FFT convolution exactly equal to SAME zero-padded
    convolution (wraparound taps land in the zero margin)."""
    m, n = field.shape
    fpad = jnp.pad(field, ((0, _KERNEL_PAD), (0, _KERNEL_PAD)))
    return jnp.fft.irfft2(
        jnp.fft.rfft2(fpad)[None] * kernels_ft, s=fpad.shape
    )[:, :m, :n]


def _conv_mask_norm(kernels, mask):
    """Per-kernel normalizer of the reference's masked convolution
    (reference: _masked_convolution, linda.py:1396-1407): the SAME
    convolution of the finite-mask indicator.  Dividing by it makes
    boundary (and masked-out-adjacent) pixels proper weighted means
    instead of zero-damped sums — without it the one-step hindcast is
    systematically smoother near edges, which deflated the fitted
    lognormal error shape s by ~17% and the ensemble spread with it."""
    return jnp.maximum(_conv_kernels(mask.astype(jnp.float32), kernels), 1e-6)


def _composite_convolution(field, kernels, weights, norm=None):
    """Localized convolution: FFT conv over all feature kernels + weighted
    sum (reference: _composite_convolution, linda.py:403).  With ``norm``
    (from _conv_mask_norm) this matches the reference's mask-renormalized
    convolution for fields that are finite on the mask."""
    out = _conv_kernels(field, kernels)
    if norm is not None:
        out = out / norm
    return jnp.sum(out * weights, axis=0)


@functools.partial(jax.jit, static_argnames=("n_steps", "lr"))
def _fit_kernels(src, dst, weights, mask, n_steps=150, lr=0.1):
    """Fit per-feature kernel params (phi, log sigma1, log ratio) by
    weighted LSQ with Adam, replacing the reference's per-feature scipy
    least_squares with the same optimizer box and start point
    (_estimate_convol_params, linda.py:673-740: p0 = (0, 1, 1),
    sigma1 in [0.1, 10], ratio in [0.2, 5]).  The prediction uses the
    same mask-renormalized SAME convolution as the forecast loop; the
    src and mask spectra are computed once and amortized over the fit."""
    m_, n_ = src.shape
    pm, pn = m_ + _KERNEL_PAD, n_ + _KERNEL_PAD
    maskf = mask.astype(jnp.float32)
    pad = ((0, _KERNEL_PAD), (0, _KERNEL_PAD))
    src_hat = jnp.fft.rfft2(jnp.pad(jnp.where(mask, src, 0.0), pad))
    mask_hat = jnp.fft.rfft2(jnp.pad(maskf, pad))
    dstm = jnp.where(mask, dst, 0.0)

    def loss_one(params, w):
        kf = _kernel_ft(params, pm, pn)
        pred = jnp.fft.irfft2(kf * src_hat, s=(pm, pn))[:m_, :n_]
        norm = jnp.fft.irfft2(kf * mask_hat, s=(pm, pn))[:m_, :n_]
        pred = pred / jnp.maximum(norm, 1e-6)
        # the reference restricts each feature's residuals to
        # mask & weight > 1e-3 with sqrt(weight) scaling (linda.py:686)
        return jnp.sum(w * (w > 1e-3) * maskf * (pred - dstm) ** 2)

    def fit_one(w):
        params0 = jnp.zeros(3, jnp.float32)  # phi=0, sigma1=1, ratio=1
        import optax

        opt = optax.adam(lr)
        state0 = opt.init(params0)

        def step(carry, _):
            p, s = carry
            g = jax.grad(loss_one)(p, w)
            updates, s = opt.update(g, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s), None

        (p, _), _ = jax.lax.scan(step, (params0, state0), None, length=n_steps)
        return p

    params = jax.vmap(fit_one)(weights)
    return jax.vmap(lambda p: _kernel_ft(p, pm, pn))(params)


@jax.jit
def _fit_psi(src, dst, weights, mask):
    """Per-feature AR(1) coefficient by weighted least squares
    (reference: _estimate_ar1_params, linda.py:594).  Returns (F,)."""
    maskf = mask.astype(jnp.float32)

    def one(w):
        wm = w * maskf
        num = jnp.sum(wm * src * dst)
        den = jnp.maximum(jnp.sum(wm * src * src), 1e-12)
        # the reference solves a *bounded* scalar minimization with
        # psi in [-0.98, 0.98] (reference: linda.py:604) — the bound is
        # load-bearing: the unconstrained LSQ often exceeds 1, which makes
        # the integrated ARI explosive
        return jnp.clip(num / den, -0.98, 0.98)

    return jax.vmap(one)(weights)  # (F,)


@jax.jit
def _fit_psi2(src1, src2, dst, weights, mask):
    """Per-feature AR(2) coefficients by weighted 2x2 least squares
    (reference: _estimate_ar2_params, linda.py:623).  src1 is the lag-1
    predictor, src2 the lag-2 predictor.  Returns (F, 2)."""
    maskf = mask.astype(jnp.float32)

    def one(w):
        wm = w * maskf
        a11 = jnp.sum(wm * src1 * src1)
        a12 = jnp.sum(wm * src1 * src2)
        a22 = jnp.sum(wm * src2 * src2)
        b1 = jnp.sum(wm * src1 * dst)
        b2 = jnp.sum(wm * src2 * dst)
        det = jnp.maximum(a11 * a22 - a12 * a12, 1e-12)
        psi1 = (a22 * b1 - a12 * b2) / det
        psi2 = (a11 * b2 - a12 * b1) / det
        # project onto the reference's stationarity polygon
        # (reference: linda.py:633-641): psi1+psi2 <= 0.98,
        # psi2-psi1 <= 0.98, |psi1| <= 1.98, |psi2| <= 0.98
        psi2 = jnp.clip(psi2, -0.98, 0.98)
        psi1 = jnp.clip(
            psi1, jnp.maximum(-1.98, psi2 - 0.98), jnp.minimum(1.98, 0.98 - psi2)
        )
        return jnp.stack([psi1, psi2])

    return jax.vmap(one)(weights)  # (F, 2)


def _fit_lognorm_constrained(err, mask):
    """MLE of the shape parameter of a mean-one-constrained lognormal
    (reference: _fit_dist, linda.py:889-897): maximize the likelihood of
    ``lognorm(s, loc=-0.5 s^2)`` over the masked error samples."""
    from scipy import optimize, stats

    vals = err[mask]

    def negll(s):
        p = stats.lognorm.pdf(vals, s, -0.5 * s**2)
        p = np.where(p > 1e-300, p, 1e-300)
        return -np.sum(np.log(p))

    s_opt = optimize.minimize_scalar(
        negll, bounds=(1e-3, 20.0), method="Bounded"
    ).x
    return float(s_opt), float(-0.5 * s_opt**2)


def _weighted_err_std(f, w):
    """Weighted std of multiplicative errors around 1, omitting near-one
    values (reference: _weighted_std, linda.py:1455-1465)."""
    mask = np.abs(f - 1.0) > 1e-4
    n_nz = np.count_nonzero(mask)
    if n_nz == 0:
        return np.nan
    c = (f[mask].size - 1.0) / n_nz
    return float(
        np.sqrt(np.sum(w[mask] * (f[mask] - 1.0) ** 2) / (c * np.sum(w[mask])))
    )


def _sample_acf(field):
    """Sample spatial ACF via the Wiener-Khinchin relation
    (reference: _compute_sample_acf, linda.py:555-561)."""
    f = np.fft.rfft2((field - np.mean(field)) / np.std(field))
    return np.fft.irfft2(np.abs(f * np.conj(f)), s=field.shape) / field.size


def _acf_to_gaussian(r, s):
    """Map a lognormal-space correlation to the Gaussian copula space.

    The reference computes this mapping by numerical double integration
    (_compute_inverse_acf_mapping, linda.py:436-460); for the lognormal
    marginal the mapping is the classical closed form
    rho = log(1 + r (e^{s^2} - 1)) / s^2."""
    e = np.expm1(s**2)
    return np.log(np.maximum(1.0 + r * e, 1e-6)) / max(s**2, 1e-12)


def _fit_parametric_acf(acf):
    """Fit the anisotropic exponential ACF c*exp(-sqrt(r'^2)) to the sample
    estimate (reference: _fit_acf + _compute_parametric_acf,
    linda.py:527-553,864-887)."""
    from scipy import optimize

    m, n = acf.shape
    x = np.fft.ifftshift(np.arange(-(n // 2), n - n // 2))
    y = np.fft.ifftshift(np.arange(-(m // 2), m - m // 2))
    gx, gy = np.meshgrid(x, y)

    def parametric(p):
        c, phi, sigma1, ratio = p
        sigma2 = ratio * sigma1
        phi_r = phi / 180.0 * np.pi
        u = (np.cos(phi_r) * gx + np.sin(phi_r) * gy) / sigma1
        v = (-np.sin(phi_r) * gx + np.cos(phi_r) * gy) / sigma2
        return c * np.exp(-np.sqrt(u * u + v * v))

    def resid(p):
        return (acf - parametric(p)).ravel()

    p_opt = optimize.least_squares(
        resid, np.array((1.0, 0.0, 1.0, 1.0)),
        bounds=((0.01, -np.inf, 0.1, 0.2), (10.0, np.inf, 10.0, 5.0)),
        method="trf", ftol=1e-6, xtol=1e-4, gtol=1e-6,
    )
    return parametric(p_opt.x)


def _tukey_feature_window(m, n, ci, cj, r, alpha=0.5):
    """Separable Tukey window centred on a feature
    (reference: _window_tukey, linda.py:1468-1496)."""
    j, i = np.meshgrid(np.arange(n), np.arange(m))
    out = np.ones((m, n))
    for d, rr in ((np.abs(i - ci), r), (np.abs(j - cj), r)):
        w = np.zeros((m, n))
        inside = d <= rr
        flat = d <= alpha * rr
        ramp = inside & ~flat
        w[ramp] = 0.5 * (
            1.0 + np.cos(np.pi * (d[ramp] - alpha * rr) / ((1.0 - alpha) * rr))
        )
        w[flat] = 1.0
        out *= w
    return out


def _estimate_error_model(
    err, feature_coords, shape, errdist_window_radius, acf_window_radius,
    localization_window_radius,
):
    """Per-feature forecast-error marginals + correlation structure
    (reference: _estimate_perturbation_params, linda.py:749-862).

    err: multiplicative one-step hindcast errors with NaN outside the
    validity mask.  Returns the pytree consumed by
    _generate_error_perturbations."""
    m, n = shape
    n_feat = feature_coords.shape[0]
    mask_finite = np.isfinite(err)
    err = np.where(mask_finite, err, 1.0)

    weights_dist = _compute_window_weights(
        feature_coords, m, n, errdist_window_radius
    )

    s_list, loc_list, std_list, ampl_list = [], [], [], []
    for i in range(n_feat):
        if n_feat > 1:
            weights_acf = _tukey_feature_window(
                m, n, feature_coords[i, 0], feature_coords[i, 1],
                acf_window_radius,
            )
        else:
            weights_acf = np.ones((m, n))
        mask = mask_finite & (weights_dist[i] > 0.1)
        valid = (
            np.sum(mask) > 10
            and np.sum(np.abs(err[mask] - 1.0) >= 1e-3) > 10
        )
        if valid:
            s, loc = _fit_lognorm_constrained(err, mask)
            mask_acf = weights_acf > 1e-4
            std = _weighted_err_std(err[mask_acf], weights_dist[i][mask_acf])
            valid = np.isfinite(std)
        if valid:
            acf = _acf_to_gaussian(
                _sample_acf(weights_acf * (err - 1.0) / std), s
            )
            acf = _fit_parametric_acf(acf)
            ampl = np.sqrt(np.abs(np.fft.rfft2(acf)))
        else:
            s, loc, std = 1e-10, 1e-10, 0.0
            ampl = np.full((m, n // 2 + 1), 1e-10)
        s_list.append(s)
        loc_list.append(loc)
        std_list.append(std)
        ampl_list.append(ampl)

    weights = _compute_window_weights(
        feature_coords, m, n, localization_window_radius
    )
    weights /= np.sum(weights, axis=0)
    return {
        "s": jnp.asarray(s_list, jnp.float32),
        "loc": jnp.asarray(loc_list, jnp.float32),
        "std": jnp.asarray(std_list, jnp.float32),
        "ampl": jnp.asarray(np.stack(ampl_list), jnp.float32),
        "weights": jnp.asarray(weights, jnp.float32),
    }


def _generate_error_perturbations(key, pert_params, shape):
    """Per-feature lognormal, ACF-filtered multiplicative perturbation field
    (reference: _generate_perturbations, linda.py:903-941).

    One white spectrum is drawn and filtered by each feature's fitted ACF
    amplitude spectrum; the standardized Gaussian field maps to the
    feature's constrained lognormal via exp(s*x) + loc (the closed form of
    ``lognorm.ppf(norm.cdf(x), s, loc)``), and the fields composite with
    the interpolation weights."""
    m, n = shape
    white = _spectral_white(key, shape)

    def per_feature(ampl, s_i, loc_i, std_i):
        x = jnp.fft.irfft2(ampl * white, s=shape)
        x = x / jnp.maximum(jnp.std(x), 1e-12)
        pert = jnp.exp(s_i * x) + loc_i
        return jnp.where(std_i > 0.0, pert, 1.0)

    perts = jax.vmap(per_feature)(
        pert_params["ampl"], pert_params["s"], pert_params["loc"],
        pert_params["std"],
    )
    return jnp.sum(pert_params["weights"] * perts, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("int_steps", "add_perturbations", "E", "shape", "vel_pert"),
)
def _linda_scan(
    diff_window, forecast0, velocity, kernels_1, kernels_2, norm_1, norm_2,
    interp_weights, psi_field, mask_adv, member_keys, pert_params, int_steps,
    add_perturbations, E, shape, vel_pert=False, vp_coeffs=None,
    eps_par=None, eps_perp=None, V_n=None, V_perp=None, vsf=1.0,
    timestep_min=1.0,
):
    m, n = shape
    maskf = mask_adv.astype(jnp.float32)
    diffs0 = jnp.broadcast_to(diff_window, (E,) + diff_window.shape)
    fc0 = jnp.broadcast_to(forecast0, (E, m, n))
    disp0 = jnp.zeros((E, 2, m, n), jnp.float32)

    def step(carry, t):
        diffs, fc, keys, disp = carry
        t_total = (t + 1.0) * timestep_min

        def member(key, d_j, f_j, disp_j, eps_par_j, eps_perp_j):
            key, k_pert = jax.random.split(key)
            # ARI iterate on the differenced fields with per-pixel psi maps:
            # d_new = sum_i psi_i * d[-(i+1)]
            p = psi_field.shape[0]
            d_new = jnp.sum(psi_field * d_j[-p:][::-1], axis=0)
            d_j = jnp.concatenate([d_j[1:], d_new[None]], axis=0)
            f_j = f_j + d_j[-1]
            # convolve differences and the forecast (IDE smoothing) — with
            # the reference's mask renormalization (masked fields are
            # zeroed, sums renormalized by the convolved mask)
            d_j = jnp.stack(
                [
                    _composite_convolution(
                        d_j[i] * maskf, kernels_1, interp_weights, norm_1
                    )
                    for i in range(d_j.shape[0])
                ]
            )
            f_j = _composite_convolution(
                f_j * maskf, kernels_2, interp_weights, norm_2
            )
            out = jnp.maximum(f_j, 0.0)
            out = jnp.where(mask_adv, out, jnp.nan)
            if add_perturbations:
                out = out * _generate_error_perturbations(
                    k_pert, pert_params, shape
                )
            # BPS velocity perturbation (reference: linda.py:1371-1389)
            if vel_pert:
                a1, b1, c1 = vp_coeffs[0]
                a2, b2, c2 = vp_coeffs[1]
                g_par = a1 * t_total**b1 + c1
                g_perp = a2 * t_total**b2 + c2
                vel_j = velocity + (
                    eps_par_j * g_par * V_n + eps_perp_j * g_perp * V_perp
                ) / vsf
            else:
                vel_j = velocity
            # advect to Eulerian coordinates
            disp_j = integrate_displacement(vel_j, disp_j, 1.0)
            out_e = warp(out, disp_j, order=1, cval=jnp.nan)
            return key, d_j, f_j, disp_j, out_e

        if vel_pert:
            args = (keys, diffs, fc, disp, eps_par, eps_perp)
            fn = member
        else:
            fn = lambda k, d, f, dp: member(k, d, f, dp, None, None)  # noqa: E731
            args = (keys, diffs, fc, disp)
        keys, diffs, fc, disp, outs = jax.vmap(fn)(*args)
        return (diffs, fc, keys, disp), outs

    carry0 = (diffs0, fc0, member_keys, disp0)
    _, outputs = jax.lax.scan(step, carry0, jnp.arange(int_steps))
    return jnp.swapaxes(outputs, 0, 1)


@functools.partial(
    jax.jit, static_argnames=("ari_order", "n_iter", "interp_order")
)
def _linda_init_core(
    precip, velocity, weights_j, interp_weights, ari_order, n_iter=1,
    interp_order=1,
):
    """Fused LINDA initialization: Lagrangian alignment, differencing,
    both kernel fits, ARI coefficient fit, and the AR window — ONE XLA
    program.  The previous eager sequence cost ~20 dispatches at 30-60 ms
    each over the axon tunnel, dominating the benched wall time
    (reference spreads this over linda.py:1145-1282)."""
    precip_min = jnp.nanmin(precip)
    precip_filled = jnp.where(jnp.isfinite(precip), precip, precip_min)
    precip_lagr = _lagrangian_alignment(
        precip_filled, velocity, n_iter=n_iter, interp_order=interp_order
    )

    # Advection mask.  The reference aligns with outval="min" — pixels
    # advected in from outside the domain are treated as dry and VALID;
    # only advected *input NaNs* are masked (linda.py:1180-1186:
    # mask_adv = all finite over the ALIGNED fields, which are
    # NaN only where an input NaN landed).  Reproduce it by advecting
    # each frame's finiteness indicator along the same displacement
    # chain with cval=1 (outside-domain = valid); any pixel whose
    # stencil touched an input NaN drops below 1.
    p1 = precip.shape[0]
    fin = jnp.isfinite(precip).astype(jnp.float32)
    valid_frames = [fin[-1]]
    disp_v = jnp.zeros_like(velocity)
    for k in range(1, p1):
        disp_v = integrate_displacement(velocity, disp_v, 1.0, n_iter=n_iter)
        valid_frames.append(
            model_warp(
                fin[p1 - 1 - k], disp_v, interp_order=interp_order, cval=1.0
            )
        )
    mask_adv = jnp.all(jnp.stack(valid_frames) > 0.999, axis=0)
    maskf = mask_adv.astype(jnp.float32)
    precip_lagr_diff = jnp.diff(precip_lagr, axis=0) * maskf

    # kernel 1: evolution of the differenced field (reference: :1203)
    kernels_1 = _fit_kernels(
        precip_lagr_diff[-2], precip_lagr_diff[-1], weights_j, mask_adv
    )
    norm_1 = _conv_mask_norm(kernels_1, mask_adv)
    # convolve older differences (reference: :1220); diff_c excludes the
    # newest (raw) difference — it is the regression *source* set
    diff_c = [
        precip_lagr_diff[i] for i in range(precip_lagr_diff.shape[0] - 1)
    ]
    for i in range(len(diff_c)):
        for _ in range(ari_order - i):
            diff_c[i] = _composite_convolution(
                diff_c[i] * maskf, kernels_1, interp_weights, norm_1
            )

    # ARI parameters (reference: :1240)
    if ari_order == 1:
        psi_f = _fit_psi(diff_c[-1], precip_lagr_diff[-1], weights_j, mask_adv)
        psi_field = jnp.sum(interp_weights * psi_f[:, None, None], axis=0)[None]
    else:
        psi_f = _fit_psi2(
            diff_c[-1], diff_c[-2], precip_lagr_diff[-1], weights_j, mask_adv
        )  # (F, 2)
        psi_field = jnp.stack(
            [
                jnp.sum(interp_weights * psi_f[:, i, None, None], axis=0)
                for i in range(2)
            ]
        )

    # first forecast step + kernel 2 (reference: :1264-1282)
    p_ord = psi_field.shape[0]
    diff_stack = jnp.stack(diff_c[-p_ord:])
    d_new = jnp.sum(psi_field * diff_stack[::-1], axis=0)
    precip_fct = jnp.maximum(precip_lagr[-2] + d_new, 0.0)
    kernels_2 = _fit_kernels(
        precip_fct, precip_filled[-1], weights_j, mask_adv
    )
    norm_2 = _conv_mask_norm(kernels_2, mask_adv)

    # the main scan's AR state: the reference hands _linda_forecast the
    # NEWEST ari_order raw diffs (precip_lagr_diff[1:], linda.py:363) and
    # convolves window entry j (ari_order - j) times before the loop
    # (linda.py:978-984) — so for ari_order=1 the first prediction is
    # driven by the CONVOLVED newest difference, not the raw one
    win = [precip_lagr_diff[i] for i in range(1, precip_lagr_diff.shape[0])]
    for j in range(len(win)):
        for _ in range(ari_order - j):
            win[j] = _composite_convolution(
                win[j] * maskf, kernels_1, interp_weights, norm_1
            )
    diff_window = jnp.stack(win).astype(jnp.float32)
    return (
        kernels_1.astype(jnp.float32),
        kernels_2.astype(jnp.float32),
        norm_1.astype(jnp.float32),
        norm_2.astype(jnp.float32),
        psi_field.astype(jnp.float32),
        diff_window,
        mask_adv,
        precip_lagr[-1].astype(jnp.float32),
        jnp.stack(diff_c).astype(jnp.float32),
    )


def forecast(
    precip,
    velocity,
    timesteps,
    feature_method="blob",
    max_num_features=25,
    feature_kwargs=None,
    ari_order=1,
    kernel_type="anisotropic",
    localization_window_radius=None,
    errdist_window_radius=None,
    acf_window_radius=None,
    extrap_method="semilagrangian",
    extrap_kwargs=None,
    add_perturbations=True,
    pert_thrs=(0.5, 1.0),
    n_ens_members=10,
    vel_pert_method="bps",
    vel_pert_kwargs=None,
    kmperpixel=None,
    timestep=None,
    seed=None,
    num_workers=1,
    use_multiprocessing=False,
    measure_time=False,
    callback=None,
    return_output=True,
):
    """LINDA nowcast with the reference's signature (reference: linda.py:62).

    precip: (ari_order+2, m, n) rain-rate fields.  Returns (T, m, n) for
    the deterministic mode (add_perturbations=False) or
    (n_ens_members, T, m, n) for the probabilistic mode.
    """
    t0 = time.time()
    precip = np.asarray(precip, np.float32)
    if precip.ndim != 3 or precip.shape[0] < ari_order + 2:
        raise ValueError(
            f"precip must have >= ari_order+2 = {ari_order + 2} fields"
        )
    if ari_order not in (1, 2):
        raise ValueError("ari_order must be 1 or 2")
    extrap_kwargs = dict(extrap_kwargs or {})
    feature_kwargs = dict(feature_kwargs or {})
    m, n = precip.shape[1:]
    if localization_window_radius is None:
        localization_window_radius = 0.2 * min(m, n)

    precip = precip[-(ari_order + 2) :]
    precip_min = float(np.nanmin(precip))
    precip_filled = np.where(np.isfinite(precip), precip, precip_min)

    # --- feature detection (reference: :1098) ---
    if feature_method in ("blob", "shitomasi"):
        det_field = np.where(np.isfinite(precip[-1]), precip[-1], 0.0)
        if feature_method == "blob":
            from pysteps_tpu.feature import blob as blob_mod

            coords_xy = blob_mod.detection(
                det_field, max_num_features=max_num_features, **feature_kwargs
            )[:, :2]
        else:
            coords_xy = shitomasi.detection(
                det_field, max_num_features=max_num_features, **feature_kwargs
            )
        if len(coords_xy) == 0:
            feature_coords = np.zeros((1, 2))
        else:
            feature_coords = np.fliplr(np.asarray(coords_xy)[:, :2])  # (y, x)
    elif feature_method == "tstorm":
        # thunderstorm-cell centroids as LINDA features — a superset of
        # the reference, which restricts LINDA to {blob, shitomasi, domain}
        # (reference: linda.py:1097,1125) even though its feature registry
        # has tstorm; cells localize the kernels on convective objects
        from pysteps_tpu.feature import tstorm as tstorm_mod

        det_field = np.where(np.isfinite(precip[-1]), precip[-1], 0.0)
        coords_xy = tstorm_mod.detection(
            det_field, max_num_features=max_num_features, output_feat=True,
            **feature_kwargs,
        )
        if len(coords_xy) == 0:
            feature_coords = np.zeros((1, 2))
        else:
            feature_coords = np.fliplr(np.asarray(coords_xy)[:, :2])
    elif feature_method == "domain":
        feature_coords = np.zeros((1, 2))
    else:
        raise NotImplementedError(f"feature detector '{feature_method}'")
    print(f"Detected {feature_coords.shape[0]} features.")

    weights = _compute_window_weights(
        feature_coords, m, n, localization_window_radius
    )
    interp_weights = jnp.asarray(
        weights / weights.sum(axis=0, keepdims=True), jnp.float32
    )
    weights_j = jnp.asarray(weights, jnp.float32)

    # --- fused device init: alignment, differencing, kernel/ARI fits
    # (reference: :1145-1282) — one XLA program, see _linda_init_core ---
    velocity_j = jnp.asarray(velocity, jnp.float32)
    (
        kernels_1, kernels_2, norm_1, norm_2, psi_field, diff_window,
        mask_adv, precip_lagr_last, diff_c_stack,
    ) = _linda_init_core(
        jnp.asarray(precip), velocity_j, weights_j, interp_weights,
        ari_order=ari_order,
        n_iter=extrap_kwargs.get("n_iter", 1),
        interp_order=extrap_kwargs.get("interp_order", 1),
    )

    degenerate_pert = {
        "s": jnp.zeros(1, jnp.float32),
        "loc": jnp.zeros(1, jnp.float32),
        "std": jnp.zeros(1, jnp.float32),
        "ampl": jnp.zeros((1, m, n // 2 + 1), jnp.float32),
        "weights": jnp.ones((1, m, n), jnp.float32),
    }

    # --- perturbation parameters (probabilistic mode) ---
    if add_perturbations:
        if errdist_window_radius is None:
            errdist_window_radius = 0.15 * min(m, n)
        if acf_window_radius is None:
            acf_window_radius = 0.25 * min(m, n)
        # one-step deterministic hindcast from the inputs minus the last
        # frame, scored against the last observation
        # (reference: _linda_perturbation_init, :1325-1352)
        hind = _linda_scan(
            diff_c_stack,
            jnp.asarray(precip_filled[-2], jnp.float32),
            velocity_j, kernels_1, kernels_2, norm_1, norm_2,
            interp_weights, psi_field, mask_adv,
            jax.random.PRNGKey(0)[None], degenerate_pert, 1, False, 1, (m, n),
        )
        fct = np.asarray(hind[0, 0])
        obs = precip_filled[-1]
        err = fct / np.where(obs != 0, obs, np.nan)
        err_mask = ((fct >= pert_thrs[1]) & (obs >= pert_thrs[0])) | (
            (fct >= pert_thrs[0]) & (obs >= pert_thrs[1])
        )
        err = np.where(err_mask, err, np.nan)
        pert_params = _estimate_error_model(
            err, feature_coords, (m, n), errdist_window_radius,
            acf_window_radius, localization_window_radius,
        )
        E = n_ens_members
    else:
        pert_params = degenerate_pert
        E = 1

    # BPS velocity perturbations (reference: :1371-1389)
    vel_pert = bool(add_perturbations) and vel_pert_method is not None
    if vel_pert:
        if kmperpixel is None or timestep is None:
            raise ValueError(
                "vel_pert_method is set but kmperpixel or timestep is None"
            )
        vpk = dict(vel_pert_kwargs or {})
        p_par = tuple(
            float(v) for v in vpk.get("vp_par", get_default_params_bps_par())
        )
        p_perp = tuple(
            float(v) for v in vpk.get("vp_perp", get_default_params_bps_perp())
        )
        vsf = 60.0 / (timestep * (1.0 / kmperpixel))
        vkeys = jax.random.split(
            jax.random.PRNGKey((seed if seed is not None else 42) + 7),
            2 * n_ens_members,
        )
        eps_par = jax.vmap(_laplace)(vkeys[:n_ens_members])
        eps_perp = jax.vmap(_laplace)(vkeys[n_ens_members:])
        Nv = jnp.linalg.norm(velocity_j, axis=0)
        V_n = jnp.where(
            Nv[None] > 1e-12, velocity_j / jnp.maximum(Nv[None], 1e-12), 0.0
        )
        V_perp = jnp.stack([-V_n[1], V_n[0]])
        vp_coeffs = (p_par, p_perp)
    else:
        vp_coeffs = ((0.0,) * 3, (0.0,) * 3)
        vsf = 1.0
        eps_par = jnp.zeros(E)
        eps_perp = jnp.zeros(E)
        V_n = V_perp = jnp.zeros_like(velocity_j)

    member_keys = jax.vmap(
        lambda i: jax.random.fold_in(
            jax.random.PRNGKey(seed if seed is not None else 42), i
        )
    )(jnp.arange(E))

    if isinstance(timesteps, int):
        int_steps = timesteps
        subsel = None
    else:
        subsel = list(timesteps)
        int_steps = int(np.ceil(max(subsel)))

    init_time = time.time() - t0
    t1 = time.time()
    out = _linda_scan(
        diff_window,
        precip_lagr_last,
        velocity_j,
        kernels_1,
        kernels_2,
        norm_1,
        norm_2,
        interp_weights,
        psi_field,
        mask_adv,
        member_keys,
        pert_params,
        int_steps,
        bool(add_perturbations),
        E,
        (m, n),
        vel_pert=vel_pert,
        vp_coeffs=vp_coeffs,
        eps_par=eps_par,
        eps_perp=eps_perp,
        V_n=V_n,
        V_perp=V_perp,
        vsf=jnp.float32(vsf),
        timestep_min=jnp.float32(timestep if timestep else 1.0),
    )
    # completion only — np.asarray here fetched the full output stack
    # through the ~18 MB/s tunnel inside every timed call
    out.block_until_ready()
    loop_time = time.time() - t1

    if subsel is not None:
        frames = []
        for t_sub in subsel:
            if t_sub == int(t_sub):
                frames.append(out[:, int(t_sub) - 1])
            else:
                t_int = int(np.ceil(t_sub))
                lo = out[:, t_int - 2] if t_int >= 2 else out[:, 0]
                hi = out[:, t_int - 1]
                w = t_sub - (t_int - 1)
                frames.append((1 - w) * lo + w * hi)
        out = jnp.stack(frames, axis=1)

    if not add_perturbations:
        out = out[0]
    if callback is not None:
        arr = np.asarray(out)
        steps_axis = 0 if not add_perturbations else 1
        for t in range(arr.shape[steps_axis]):
            callback(arr[t] if not add_perturbations else arr[:, t])
    result = out if return_output else None
    if measure_time:
        return result, init_time, loop_time
    return result
