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

from pysteps_tpu.extrapolation.semilagrangian import integrate_displacement
from pysteps_tpu.feature import shitomasi
from pysteps_tpu.noise.fftgenerators import (
    _generate_fft_noise,
    initialize_nonparam_2d_fft_filter,
)
from pysteps_tpu.nowcasts.steps import _lagrangian_alignment
from pysteps_tpu.ops.warp import warp

_KERNEL_SIZE = 33  # static support for the per-feature kernels


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


def _render_kernel(params):
    """Anisotropic Gaussian kernel on the static support
    (reference: _compute_kernel_anisotropic, linda.py:465).

    params: (log_sigma1, log_sigma2, phi) — normalized to sum 1."""
    half = _KERNEL_SIZE // 2
    y, x = jnp.meshgrid(
        jnp.arange(-half, half + 1, dtype=jnp.float32),
        jnp.arange(-half, half + 1, dtype=jnp.float32),
        indexing="ij",
    )
    sigma1 = jnp.exp(params[0])
    sigma2 = jnp.exp(params[1])
    phi = params[2]
    c, s = jnp.cos(phi), jnp.sin(phi)
    u = c * x + s * y
    v = -s * x + c * y
    k = jnp.exp(-0.5 * ((u / jnp.maximum(sigma1, 0.3)) ** 2 + (v / jnp.maximum(sigma2, 0.3)) ** 2))
    return k / jnp.maximum(jnp.sum(k), 1e-12)


def _conv_same(field, kernel):
    return jax.lax.conv_general_dilated(
        field[None, None], kernel[None, None], (1, 1), "SAME"
    )[0, 0]


def _composite_convolution(field, kernels, weights):
    """Localized convolution: grouped conv over all feature kernels +
    weighted sum (reference: linda.py:403)."""
    F = kernels.shape[0]
    out = jax.lax.conv_general_dilated(
        jnp.broadcast_to(field[None, None], (1, F) + field.shape),
        kernels[:, None],
        (1, 1),
        "SAME",
        feature_group_count=F,
    )[0]
    return jnp.sum(out * weights, axis=0)


@functools.partial(jax.jit, static_argnames=("n_steps", "lr"))
def _fit_kernels(src, dst, weights, mask, n_steps=150, lr=0.1):
    """Fit per-feature kernel params by weighted LSQ with Adam
    (reference: _estimate_convol_params, linda.py:673)."""
    src = jnp.where(mask, src, 0.0)
    dst = jnp.where(mask, dst, 0.0)
    maskf = mask.astype(jnp.float32)

    def loss_one(params, w):
        k = _render_kernel(params)
        pred = _conv_same(src, k)
        return jnp.sum(w * maskf * (pred - dst) ** 2)

    def fit_one(w, key_init):
        params0 = jnp.asarray([jnp.log(2.0), jnp.log(2.0), 0.0])
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

    params = jax.vmap(lambda w: fit_one(w, None))(weights)
    kernels = jax.vmap(_render_kernel)(params)
    return kernels


@jax.jit
def _fit_psi(src, dst, weights, mask):
    """Per-feature AR(1) coefficient by weighted least squares
    (reference: _estimate_ar1_params, linda.py:594).  Returns (F,)."""
    maskf = mask.astype(jnp.float32)

    def one(w):
        wm = w * maskf
        num = jnp.sum(wm * src * dst)
        den = jnp.maximum(jnp.sum(wm * src * src), 1e-12)
        return jnp.clip(num / den, -1.2, 1.2)

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
        return jnp.clip(jnp.stack([psi1, psi2]), -1.5, 1.5)

    return jax.vmap(one)(weights)  # (F, 2)


@functools.partial(
    jax.jit, static_argnames=("int_steps", "add_perturbations", "E", "shape")
)
def _linda_scan(
    diff_window, forecast0, velocity, kernels_1, kernels_2, interp_weights,
    psi_field, mask_adv, member_keys, noise_filt, pert_std, int_steps,
    add_perturbations, E, shape,
):
    m, n = shape
    diffs0 = jnp.broadcast_to(diff_window, (E,) + diff_window.shape)
    fc0 = jnp.broadcast_to(forecast0, (E, m, n))
    disp0 = jnp.zeros((E, 2, m, n), jnp.float32)

    def step(carry, _):
        diffs, fc, keys, disp = carry

        def member(key, d_j, f_j, disp_j):
            key, k_pert = jax.random.split(key)
            # ARI iterate on the differenced fields with per-pixel psi maps:
            # d_new = sum_i psi_i * d[-(i+1)]
            p = psi_field.shape[0]
            d_new = jnp.sum(psi_field * d_j[-p:][::-1], axis=0)
            d_j = jnp.concatenate([d_j[1:], d_new[None]], axis=0)
            f_j = f_j + d_j[-1]
            # convolve differences and the forecast (IDE smoothing)
            d_j = jnp.stack(
                [
                    _composite_convolution(d_j[i], kernels_1, interp_weights)
                    for i in range(d_j.shape[0])
                ]
            )
            f_j = _composite_convolution(f_j, kernels_2, interp_weights)
            out = jnp.maximum(f_j, 0.0)
            out = jnp.where(mask_adv, out, jnp.nan)
            if add_perturbations:
                eps = _generate_fft_noise(k_pert, noise_filt, shape, False)
                out = out * jnp.exp(pert_std * eps)
            # advect to Eulerian coordinates
            disp_j = integrate_displacement(velocity, disp_j, 1.0)
            out_e = warp(out, disp_j, order=1, cval=jnp.nan)
            return key, d_j, f_j, disp_j, out_e

        keys, diffs, fc, disp, outs = jax.vmap(member)(keys, diffs, fc, disp)
        return (diffs, fc, keys, disp), outs

    carry0 = (diffs0, fc0, member_keys, disp0)
    _, outputs = jax.lax.scan(step, carry0, None, length=int_steps)
    return jnp.swapaxes(outputs, 0, 1)


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
    n_ens_members=40,
    vel_pert_method=None,
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

    # --- Lagrangian transform + differencing (reference: :1145-1186) ---
    velocity_j = jnp.asarray(velocity, jnp.float32)
    precip_lagr = _lagrangian_alignment(
        jnp.asarray(precip_filled), velocity_j,
        n_iter=extrap_kwargs.get("n_iter", 1),
        interp_order=extrap_kwargs.get("interp_order", 1),
    )
    mask_adv = jnp.all(jnp.isfinite(jnp.asarray(precip)), axis=0)
    precip_lagr_diff = jnp.diff(precip_lagr, axis=0)

    # --- kernel 1: evolution of the differenced field (reference: :1203) ---
    kernels_1 = _fit_kernels(
        precip_lagr_diff[-2], precip_lagr_diff[-1], weights_j, mask_adv
    )

    # convolve older differences (reference: :1220)
    diff_c = [precip_lagr_diff[i] for i in range(precip_lagr_diff.shape[0] - 1)]
    for i in range(len(diff_c)):
        for _ in range(ari_order - i):
            diff_c[i] = _composite_convolution(diff_c[i], kernels_1, interp_weights)

    # --- ARI parameters (reference: :1240) ---
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
        precip_fct, jnp.asarray(precip_filled[-1]), weights_j, mask_adv
    )

    # --- perturbation parameters (probabilistic mode) ---
    if add_perturbations:
        pert_gen = initialize_nonparam_2d_fft_filter(
            precip_filled, win_fun="tukey", rm_rdisc=True
        )
        noise_filt = jnp.asarray(pert_gen["field"], jnp.float32)
        # lognormal error scale from the one-step hindcast error
        err = jnp.log(
            jnp.maximum(precip_fct, 0.1) / jnp.maximum(jnp.asarray(precip_filled[-1]), 0.1)
        )
        pert_std = jnp.clip(
            jnp.sqrt(jnp.sum(mask_adv * err**2) / jnp.maximum(jnp.sum(mask_adv), 1)),
            0.05, 0.5,
        )
        E = n_ens_members
    else:
        noise_filt = jnp.ones((m, n // 2 + 1), jnp.float32)
        pert_std = jnp.float32(0.0)
        E = 1

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

    diff_window = jnp.stack(diff_c[-ari_order:])
    init_time = time.time() - t0
    t1 = time.time()
    out = _linda_scan(
        diff_window.astype(jnp.float32),
        jnp.asarray(precip_lagr[-1], jnp.float32),
        velocity_j,
        kernels_1.astype(jnp.float32),
        kernels_2.astype(jnp.float32),
        interp_weights,
        psi_field.astype(jnp.float32),
        mask_adv,
        member_keys,
        noise_filt,
        pert_std,
        int_steps,
        bool(add_perturbations),
        E,
        (m, n),
    )
    np.asarray(out)
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
