"""
Shared nowcast machinery (reference: pysteps/nowcasts/utils.py).

Jittable pieces: dilated masks (max-pool dilation instead of
scipy.binary_dilation), percentile masks (XLA sort), cascade stacking.
Host pieces: zero-precipitation early exit, irregular-timestep binning.
"""

import jax
import jax.numpy as jnp
import numpy as np


def _cross_dilate(field):
    """One step of connectivity-1 (diamond) grayscale dilation as two 1-D
    max-pools — compiles orders of magnitude faster than a 3x3 conv on
    some backends."""
    vert = jax.lax.reduce_window(
        field, -jnp.inf, jax.lax.max, (3, 1), (1, 1), "SAME"
    )
    horiz = jax.lax.reduce_window(
        field, -jnp.inf, jax.lax.max, (1, 3), (1, 1), "SAME"
    )
    return jnp.maximum(vert, horiz)


def binary_dilation(mask, kernel_or_radius):
    """Binary dilation by a diamond structuring element of the given radius
    (int), or an explicit diamond kernel whose radius is inferred from its
    size.  Implemented as iterated separable max-pools (the conv-based
    dilation compiles pathologically slowly on some TPU backends)."""
    if hasattr(kernel_or_radius, "ndim") and getattr(kernel_or_radius, "ndim", 0) == 2:
        radius = int(kernel_or_radius.shape[0]) // 2
    else:
        radius = int(kernel_or_radius)
    out = mask.astype(jnp.float32)
    for _ in range(max(radius, 1)):
        out = _cross_dilate(out)
    return out > 0


def compute_dilated_mask_from_field(field, thr, kr, r):
    """``compute_dilated_mask(field >= thr, kr, r)`` with the threshold
    fused into the TPU rim kernel (saves one field pass per member-step in
    the incremental-mask hot loop)."""
    from pysteps_tpu.ops.warp import _use_pallas

    if _use_pallas() and int(kr) >= 1 and field.ndim == 2:
        try:
            from pysteps_tpu.ops.pallas_dilate import (
                dilated_rim_from_field_pallas,
                whole_field_ok,
            )

            if whole_field_ok(field.shape):
                return dilated_rim_from_field_pallas(
                    field, thr, int(kr), int(r)
                )
        except Exception:  # noqa: BLE001 — Mosaic unavailable: XLA fallback
            pass
    return compute_dilated_mask(field >= thr, kr, r)


def compute_dilated_mask(input_mask, kr, r):
    """Buffered rain mask with a grayscale rim built by r iterative
    connectivity-1 dilations (reference: nowcasts/utils.py:69).

    On TPU the rim is computed as a bounded L1 distance transform in one
    Pallas kernel (ops/pallas_dilate.py) instead of ~2*(kr+r)
    reduce_window passes through HBM."""
    from pysteps_tpu.ops.warp import _use_pallas

    if _use_pallas() and int(kr) >= 1 and input_mask.ndim == 2:
        try:
            from pysteps_tpu.ops.pallas_dilate import dilated_rim_pallas

            return dilated_rim_pallas(input_mask, int(kr), int(r))
        except Exception:  # noqa: BLE001 — Mosaic unavailable: XLA fallback
            pass
    mask_dilated = binary_dilation(input_mask, kr)
    mask = mask_dilated.astype(jnp.float32)
    for _ in range(int(r)):
        mask_dilated = _cross_dilate(mask_dilated.astype(jnp.float32)) > 0
        mask = mask + mask_dilated
    return mask / jnp.maximum(jnp.max(mask), 1.0)


def dilation_kernel(mask_rim):
    """Diamond structuring element matching the reference's
    scipy.ndimage.generate_binary_structure + iterate pattern
    (reference: nowcasts/steps.py mask init)."""
    n = max(int(mask_rim), 1)
    yy, xx = np.mgrid[-n : n + 1, -n : n + 1]
    return (np.abs(yy) + np.abs(xx) <= n).astype(np.float32)


def compute_percentile_mask(precip, pct):
    """True for pixels above the intensity whose exceedance fraction equals
    ``pct`` (reference: nowcasts/utils.py:102)."""
    flat = jnp.sort(precip.ravel())
    n = flat.size
    # exceedance fraction of sorted values (descending index)
    i = jnp.clip(jnp.round((1.0 - pct) * n).astype(jnp.int32) - 1, 0, n - 1)
    thr = flat[i]
    return precip >= thr


def stack_cascades(precip_decomp, n_levels, convert_to_full_arrays=False):
    """Stack per-time decompositions into a (k, t, m, n) window array
    (reference: nowcasts/utils.py:612)."""
    del convert_to_full_arrays
    levels = jnp.stack([d["cascade_levels"] for d in precip_decomp], axis=1)
    return levels[:n_levels]


def zero_precipitation_forecast(
    n_ens_members, timesteps, precip, callback=None, return_output=True,
    measure_time=False, start_time_init=None,
):
    """All-zero forecast for the norain early exit
    (reference: nowcasts/utils.py:141)."""
    print("No precipitation above the threshold found in the radar field")
    print("The resulting forecast will contain only zeros")
    single = n_ens_members is None
    n_ens = 1 if single else n_ens_members
    num = timesteps if isinstance(timesteps, int) else len(timesteps)
    zero_value = float(np.nanmin(precip))
    frame = np.full(precip.shape[1:], zero_value, dtype=np.float32)
    out = np.stack([np.stack([frame] * num)] * n_ens)
    if callback is not None:
        for t in range(num):
            callback(out[:, t])
    result = None
    if return_output:
        result = out[0] if single else out
    if measure_time:
        import time

        elapsed = time.time() - start_time_init if start_time_init else 0.0
        return result, elapsed, 0.0
    return result


def binned_timesteps(timesteps):
    """Bin irregular timesteps into integer intervals
    (reference: nowcasts/utils.py:34).  Returns list-of-lists where bin t
    holds the requested lead times in (t-1, t]."""
    timesteps = list(timesteps)
    if any(np.diff(timesteps) <= 0):
        raise ValueError("timesteps is not in ascending order")
    if any(t < 0 for t in timesteps):
        raise ValueError("negative timesteps are not allowed")
    num_bins = int(np.ceil(max(timesteps)))
    bins = [[] for _ in range(num_bins + 1)]
    for i, t in enumerate(timesteps):
        b = int(np.ceil(t))
        bins[b].append(i)
    return bins


def create_timestep_range(timesteps):
    """Normalize a timesteps spec into an iterable of integer steps plus the
    originally requested (possibly fractional) lead times
    (reference: nowcasts/utils.py:247-262).

    Returns (timesteps, original_timesteps, timestep_type) where
    timestep_type is "int" for a plain count and "list" for irregular lists
    (binned into integer intervals via binned_timesteps).
    """
    if isinstance(timesteps, int):
        return range(timesteps + 1), None, "int"
    original_timesteps = [0] + list(timesteps)
    return binned_timesteps(original_timesteps), original_timesteps, "list"


def print_ar_params(phi):
    """AR parameter table (reference: nowcasts/utils.py:536)."""
    phi = np.asarray(phi)
    print("****************************************")
    print("* AR(p) parameters for cascade levels: *")
    print("****************************************")
    hdr = "| Level |" + "".join(
        f"   Phi-{k + 1}   |" for k in range(phi.shape[1] - 1)
    ) + "   Phi-0   |"
    print(hdr)
    print("-" * len(hdr))
    for i in range(phi.shape[0]):
        row = f"| {i + 1:5d} |" + "".join(
            f" {v: 8.6f} |" for v in phi[i]
        )
        print(row)


def print_corrcoefs(gamma):
    """Correlation-coefficient table (reference: nowcasts/utils.py:574)."""
    gamma = np.asarray(gamma)
    print("************************************************")
    print("* Correlation coefficients for cascade levels: *")
    print("************************************************")
    for i in range(gamma.shape[0]):
        print(
            f"| Level {i + 1}: "
            + " ".join(f"gamma_{k + 1}={v: .6f}" for k, v in enumerate(gamma[i]))
        )


def nowcast_main_loop(
    precip,
    velocity,
    state,
    timesteps,
    extrap_method,
    func,
    extrap_kwargs=None,
    velocity_pert_gen=None,
    params=None,
    ensemble=False,
    num_ensemble_members=1,
    callback=None,
    return_output=True,
    num_workers=1,
    measure_time=False,
):
    """Host-level main loop for custom advection-based models
    (reference: nowcasts/utils.py:265-533).

    The built-in models fuse this loop into their jitted scans; this
    generic version supports external ``func(state, params)`` iterators
    with irregular/fractional timesteps, temporal interpolation, cached
    per-member displacement chains and optional velocity perturbations.
    """
    import time as _time

    from pysteps_tpu import extrapolation as _extrap

    extrap_kwargs = dict(extrap_kwargs or {})
    extrapolator = _extrap.get_method(extrap_method)

    if isinstance(timesteps, int):
        bins = [[t] for t in range(timesteps + 1)]
        timestep_type = "int"
        original_timesteps = None
    else:
        original_timesteps = list(timesteps)
        bins = binned_timesteps(original_timesteps)
        timestep_type = "list"

    state_cur = state
    precip_forecast_prev = None
    displacement = None
    t_prev = 0.0
    t_total = 0.0
    out = None
    start_total = _time.time()

    for t, subtimestep_idx in enumerate(bins):
        if timestep_type == "list":
            subtimesteps = [original_timesteps[i] for i in subtimestep_idx]
        else:
            subtimesteps = [t] if t > 0 else []

        if t > 0 or (timestep_type == "list" and subtimesteps):
            precip_forecast_new, state_new = func(state_cur, params)
        else:
            precip_forecast_new, state_new = None, state_cur

        if precip_forecast_new is not None and not ensemble:
            precip_forecast_new = np.asarray(precip_forecast_new)[np.newaxis]
        elif precip_forecast_new is not None:
            precip_forecast_new = np.asarray(precip_forecast_new)

        for t_sub in subtimesteps:
            if t_sub <= 0:
                continue
            frac = t_sub - int(t_sub)
            if frac > 0.0 and precip_forecast_prev is not None:
                field_ip = (
                    (1.0 - frac) * precip_forecast_prev
                    + frac * precip_forecast_new
                )
            else:
                field_ip = precip_forecast_new
            t_diff = t_sub - t_prev
            t_total += t_diff
            if displacement is None:
                displacement = [None] * field_ip.shape[0]
            if out is None and return_output:
                out = [[] for _ in range(field_ip.shape[0])]
            cur = []
            for i in range(field_ip.shape[0]):
                ek = dict(extrap_kwargs)
                ek["displacement_prev"] = displacement[i]
                ek["allow_nonfinite_values"] = bool(
                    np.any(~np.isfinite(field_ip[i]))
                )
                vel = velocity
                if velocity_pert_gen is not None:
                    vel = velocity + velocity_pert_gen[i](t_total)
                ep, displacement[i] = extrapolator(
                    field_ip[i], vel, [t_diff], return_displacement=True, **ek
                )
                cur.append(np.asarray(ep[0]))
                if return_output:
                    out[i].append(np.asarray(ep[0]))
            if callback is not None:
                callback(np.stack(cur))
            t_prev = t_sub

        if not subtimesteps and t > 0:
            # advance the displacement chains by one step
            t_diff = t + 1 - t_prev
            t_total += t_diff
            if displacement is None:
                displacement = [None] * (
                    precip_forecast_new.shape[0] if precip_forecast_new is not None else 1
                )
            for i in range(len(displacement)):
                ek = dict(extrap_kwargs)
                ek["displacement_prev"] = displacement[i]
                _, displacement[i] = extrapolator(
                    None, velocity, [t_diff], return_displacement=True, **ek
                )
            t_prev = t + 1

        if precip_forecast_new is not None:
            precip_forecast_prev = precip_forecast_new
        state_cur = state_new

    if return_output and out is not None:
        out = np.stack([np.stack(o) for o in out])
        if not ensemble:
            out = out[0]
    if measure_time:
        return out, _time.time() - start_total
    return out
