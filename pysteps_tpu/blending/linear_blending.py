"""
Linear / saliency blending of a nowcast with NWP
(reference: pysteps/blending/linear_blending.py:29-356; Hwang et al. 2015
for the saliency weights).

The per-timestep blend is pure elementwise math; the saliency ranking is
one XLA sort per field.
"""

import jax.numpy as jnp
import numpy as np

from pysteps_tpu.utils import conversion


def _ranked_salience(precip_nowcast, precip_nwp):
    """Dense-ranked normalized intensity difference in [0, 1]
    (reference: linear_blending.py:289)."""
    max_now = jnp.max(precip_nowcast)
    max_nwp = jnp.max(precip_nwp)
    norm_now = jnp.where(max_now > 0, precip_nowcast / jnp.maximum(max_now, 1e-12), 0.0)
    norm_nwp = jnp.where(max_nwp > 0, precip_nwp / jnp.maximum(max_nwp, 1e-12), 0.0)
    diff = (norm_now - norm_nwp).ravel()
    # dense ranking: rank of each unique value
    sorted_diff = jnp.sort(diff)
    is_new = jnp.concatenate([jnp.array([True]), sorted_diff[1:] != sorted_diff[:-1]])
    dense_of_sorted = jnp.cumsum(is_new)
    ranks = dense_of_sorted[jnp.searchsorted(sorted_diff, diff)]
    ranked = ranks.astype(jnp.float32) / jnp.maximum(ranks.max(), 1)
    return ranked.reshape(precip_nowcast.shape)


def _salience_weight(weight, ranked):
    """Salience weight (reference: linear_blending.py:326; Hwang2015)."""
    w = weight
    r = ranked
    term1 = (w * r) / jnp.maximum(w * r + (1 - w) * (1 - r), 1e-12)
    term2 = jnp.sqrt(r**2 + w**2) / jnp.maximum(
        jnp.sqrt(r**2 + w**2) + jnp.sqrt((1 - r) ** 2 + (1 - w) ** 2), 1e-12
    )
    return 0.5 * (term1 + term2)


def forecast(
    precip,
    precip_metadata,
    velocity,
    timesteps,
    timestep,
    nowcast_method,
    precip_nwp=None,
    precip_nwp_metadata=None,
    start_blending=120,
    end_blending=240,
    fill_nwp=True,
    saliency=False,
    nowcast_kwargs=None,
):
    """Linear/saliency blending (reference: linear_blending.py:29).

    Runs ``nowcast_method`` internally, converts both sources to mm/h, and
    ramps the NWP weight linearly from 0 at ``start_blending`` minutes to 1
    at ``end_blending`` minutes.
    """
    from pysteps_tpu import nowcasts

    nowcast_kwargs = dict(nowcast_kwargs or {})
    if precip_nwp is not None and precip_nwp.shape[-2:] != np.asarray(precip).shape[-2:]:
        raise ValueError("x/y dimensions of nowcast and NWP must match")

    nowcast_method_func = nowcasts.get_method(nowcast_method)
    if nowcast_method == "sseps":
        precip_nowcast = nowcast_method_func(
            precip, precip_metadata, velocity, timesteps, **nowcast_kwargs
        )
    else:
        precip_nowcast = nowcast_method_func(
            precip, velocity, timesteps, **nowcast_kwargs
        )
    precip_nowcast, _ = conversion.to_rainrate(precip_nowcast, precip_metadata)
    precip_nowcast = np.array(precip_nowcast)

    if precip_nwp is None:
        return precip_nowcast

    precip_nwp = np.asarray(precip_nwp, np.float32)
    if precip_nwp_metadata is not None and precip_nwp_metadata.get("transform") is not None:
        precip_nwp, _ = conversion.to_rainrate(precip_nwp, precip_nwp_metadata)
        precip_nwp = np.asarray(precip_nwp)

    ensemble_nowcast = precip_nowcast.ndim == 4
    ensemble_nwp = precip_nwp.ndim == 4
    if ensemble_nowcast or ensemble_nwp:
        n_now = precip_nowcast.shape[0] if ensemble_nowcast else 1
        n_nwp = precip_nwp.shape[0] if ensemble_nwp else 1
        n_max = max(n_now, n_nwp)
        if not ensemble_nowcast:
            precip_nowcast = np.repeat(precip_nowcast[None], n_max, axis=0)
        elif n_now < n_max:
            reps = [(n_max + i) // n_now for i in range(n_now)]
            precip_nowcast = np.repeat(precip_nowcast, reps, axis=0)
        if not ensemble_nwp:
            precip_nwp = np.repeat(precip_nwp[None], n_max, axis=0)
        elif n_nwp < n_max:
            reps = [(n_max + i) // n_nwp for i in range(n_nwp)]
            precip_nwp = np.repeat(precip_nwp, reps, axis=0)
        time_axis = 1
    else:
        time_axis = 0

    n_steps = precip_nowcast.shape[time_axis]
    precip_nwp = np.nan_to_num(precip_nwp, nan=0.0)
    nan_mask = np.isnan(precip_nowcast)
    if fill_nwp:
        nwp_cut = np.take(precip_nwp, np.arange(n_steps), axis=time_axis)
        precip_nowcast[nan_mask] = nwp_cut[nan_mask]
    else:
        precip_nowcast[nan_mask] = 0.0

    blended = np.zeros_like(precip_nwp)
    for i in range(precip_nwp.shape[time_axis]):
        t = (i + 1) * timestep
        weight_nwp = (t - start_blending) / (end_blending - start_blending)
        sl = [slice(None)] * precip_nwp.ndim
        sl[time_axis] = i
        sl = tuple(sl)
        now_i = precip_nowcast[sl] if i < n_steps else 0.0
        if weight_nwp <= 0.0:
            blended[sl] = now_i
        elif weight_nwp >= 1.0:
            blended[sl] = precip_nwp[sl]
        else:
            weight_nowcast = 1.0 - weight_nwp
            if saliency:
                ranked = _ranked_salience(
                    jnp.asarray(now_i), jnp.asarray(precip_nwp[sl])
                )
                ws = np.asarray(_salience_weight(weight_nowcast, ranked))
                blended[sl] = ws * now_i + (1 - ws) * precip_nwp[sl]
            else:
                blended[sl] = weight_nwp * precip_nwp[sl] + weight_nowcast * now_i
    return blended
