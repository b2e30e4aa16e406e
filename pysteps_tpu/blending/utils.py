"""
Blending helpers (reference: pysteps/blending/utils.py).

The NWP cascade store uses compressed NPZ instead of the reference's
NetCDF (netCDF4 is not an available dependency; the stored content —
decomposed cascades, means, sigmas, motion, valid times — is identical).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from pysteps_tpu import cascade as cascade_module
from pysteps_tpu.cascade.decomposition import decompose_core
from pysteps_tpu.nowcasts.utils import _cross_dilate


def stack_cascades(R_d, donorm=True):
    """Stack decomposed cascades into arrays (levels, t, m, n) plus
    means/sigmas (reference: blending/utils.py:48)."""
    R_c = jnp.stack([R["cascade_levels"] for R in R_d], axis=1)
    mu = jnp.stack([jnp.asarray(R["means"]) for R in R_d], axis=1)
    sigma = jnp.stack([jnp.asarray(R["stds"]) for R in R_d], axis=1)
    if donorm:
        R_c = (R_c - mu[:, :, None, None]) / sigma[:, :, None, None]
    return R_c, mu, sigma


def blend_cascades(cascades_norm, weights):
    """Weighted blend of normalized cascades
    (reference: blending/utils.py:88).  cascades_norm: (components, k, m, n)
    or (components, k); weights: (components, k) broadcastable."""
    while weights.ndim < cascades_norm.ndim:
        weights = weights[..., None]
    return jnp.sum(weights * cascades_norm, axis=0)


def recompose_cascade(combined_cascade, combined_mean, combined_sigma):
    """Recompose a blended cascade with blended statistics
    (reference: blending/utils.py:149)."""
    return jnp.sum(
        combined_cascade * combined_sigma[:, None, None]
        + combined_mean[:, None, None],
        axis=0,
    )


def blend_optical_flows(flows, weights):
    """Weight-combine advection fields (reference: blending/utils.py:185)."""
    flows = jnp.stack(flows) if isinstance(flows, (list, tuple)) else jnp.asarray(flows)
    weights = jnp.asarray(weights)
    if weights.shape[0] != flows.shape[0]:
        raise ValueError(
            "weights dimension must match the number of flows: "
            f"{flows.shape[0]} != {weights.shape[0]}"
        )
    weights = weights / jnp.sum(weights)
    return jnp.sum(flows * weights[:, None, None, None], axis=0)


def decompose_NWP(
    R_NWP,
    NWP_model,
    analysis_time=None,
    timestep=None,
    valid_times=None,
    num_cascade_levels=6,
    num_workers=1,
    output_path=None,
    decomp_method="fft",
    fft_method="numpy",
    domain="spatial",
    normalize=True,
    compute_stats=True,
    compact_output=False,
):
    """Decompose a (T, m, n) NWP rainfall forecast into cascades and store
    them (reference: blending/utils.py:243 writes NetCDF; here NPZ)."""
    R_NWP = np.asarray(R_NWP, np.float32)
    T, m, n = R_NWP.shape
    bp_filter = cascade_module.get_method("gaussian")((m, n), num_cascade_levels)
    w2 = bp_filter["weights_2d"].astype(jnp.float32)

    dec = jax.jit(lambda f: decompose_core(f, w2, normalize=normalize))
    levels, means, stds = jax.vmap(dec)(jnp.asarray(R_NWP))

    out = {
        "cascade_levels": np.asarray(levels),
        "means": np.asarray(means),
        "stds": np.asarray(stds),
        "valid_times": np.asarray(valid_times if valid_times is not None else np.arange(T)),
    }
    if output_path is not None:
        os.makedirs(output_path, exist_ok=True)
        path = os.path.join(
            output_path, f"cascade_{NWP_model}_{analysis_time or 'latest'}.npz"
        )
        np.savez_compressed(path, **out)
        return path
    return out


def compute_store_nwp_motion(
    precip_nwp, oflow_method, analysis_time=None, nwp_model="model", output_path=None
):
    """Compute and store per-step NWP motion fields
    (reference: blending/utils.py:393)."""
    precip_nwp = np.asarray(precip_nwp)
    flows = []
    for t in range(precip_nwp.shape[0] - 1):
        flows.append(np.asarray(oflow_method(precip_nwp[t : t + 2])))
    flows.append(flows[-1])
    flows = np.stack(flows)
    if output_path is not None:
        os.makedirs(output_path, exist_ok=True)
        path = os.path.join(
            output_path, f"motion_{nwp_model}_{analysis_time or 'latest'}.npy"
        )
        np.save(path, flows)
        return path
    return flows


def load_NWP(input_nc_path_decomp, input_path_velocities, start_time=None, n_timesteps=None):
    """Load a stored NWP cascade + motion pair
    (reference: blending/utils.py:443)."""
    data = np.load(input_nc_path_decomp)
    velocities = np.load(input_path_velocities)
    decomp = {
        "cascade_levels": data["cascade_levels"],
        "means": data["means"],
        "stds": data["stds"],
        "valid_times": data["valid_times"],
        "domain": "spatial",
        "normalized": True,
    }
    if n_timesteps is not None:
        decomp["cascade_levels"] = decomp["cascade_levels"][: n_timesteps + 1]
        decomp["means"] = decomp["means"][: n_timesteps + 1]
        decomp["stds"] = decomp["stds"][: n_timesteps + 1]
        velocities = velocities[: n_timesteps + 1]
    return decomp, velocities


def compute_smooth_dilated_mask(
    original_mask,
    max_padding_size_in_px=0,
    gaussian_kernel_size=9,
    inverted=False,
    non_linear_growth_kernel_sizes=False,
):
    """Smooth dilated mask via Gaussian blur + graded dilations, normalized
    to [0, 1] (reference: blending/utils.py:561, which uses OpenCV — here
    separable max-pools + conv blur)."""
    if max_padding_size_in_px < 0:
        raise ValueError("max_padding_size_in_px must be >= 0")
    assert gaussian_kernel_size % 2

    mask = jnp.asarray(original_mask, bool)
    if inverted:
        mask = ~mask

    # Gaussian blur + threshold
    half = gaussian_kernel_size // 2
    x = jnp.arange(-half, half + 1, dtype=jnp.float32)
    sigma = 0.3 * ((gaussian_kernel_size - 1) * 0.5 - 1) + 0.8  # cv2 default
    k1 = jnp.exp(-(x**2) / (2 * sigma**2))
    k1 = k1 / jnp.sum(k1)
    f = mask.astype(jnp.float32)[None, None]
    f = jax.lax.conv_general_dilated(f, k1[None, None, :, None], (1, 1), "SAME")
    f = jax.lax.conv_general_dilated(f, k1[None, None, None, :], (1, 1), "SAME")
    binary = f[0, 0] > 0.5

    if non_linear_growth_kernel_sizes:
        lin = np.linspace(0, np.sqrt(max_padding_size_in_px), 10)
        sizes = sorted(set((lin**2).astype(int)))
    else:
        sizes = sorted(set(np.linspace(0, max_padding_size_in_px, 10, dtype=int)))

    final = jnp.zeros(binary.shape, jnp.float32)
    for size in sizes:
        dil = binary.astype(jnp.float32)
        for _ in range(max(size // 2, 0)):
            dil = _cross_dilate(dil)
        final = final + (dil > 0.5)
    return final / jnp.maximum(jnp.max(final), 1.0)


def check_norain(precip_arr, precip_thr=None, norain_thr=0.0):
    """Deprecated alias for utils.check_norain.check_norain
    (reference: blending/utils.py:536)."""
    import warnings

    from pysteps_tpu.utils.check_norain import check_norain as _check_norain

    warnings.warn(
        "pysteps_tpu.blending.utils.check_norain is deprecated; use "
        "pysteps_tpu.utils.check_norain.check_norain instead",
        DeprecationWarning,
    )
    return _check_norain(precip_arr, precip_thr, norain_thr, None)
