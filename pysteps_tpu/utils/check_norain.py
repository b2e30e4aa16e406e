"""
No-rain gating (reference: pysteps/utils/check_norain.py:6,59).

These run host-side before the jitted forecast: the branch they control is
data-dependent Python control flow (zero-forecast early exit / AR-order
reduction), deliberately kept out of the compiled graph.
"""

import numpy as np

from pysteps_tpu.utils import tapering


def check_norain(precip_arr, precip_thr=None, norain_thr=0.0, win_fun=None, printmsg=True):
    """Return True if the (tapered) rain fraction is <= ``norain_thr``
    (reference: check_norain.py:6)."""
    precip_arr = np.asarray(precip_arr)
    if win_fun is not None:
        taper = tapering.compute_window_function(
            precip_arr.shape[-2], precip_arr.shape[-1], win_fun
        )
    else:
        taper = np.ones(precip_arr.shape[-2:])
    masked = np.array(precip_arr, dtype=float)
    masked[..., taper == 0.0] = np.nanmin(precip_arr)
    if precip_thr is None:
        precip_thr = np.nanmin(masked)
    rain_frac = np.sum(masked > precip_thr) / masked.size
    norain = rain_frac <= norain_thr
    if printmsg:
        print(f"Rain fraction is: {rain_frac}, while minimum fraction is {norain_thr}")
    return bool(norain)


def check_previous_radar_obs(precip, ar_order, check_norain_kwargs=None):
    """Trim leading zero/constant frames before the AR fit and adapt
    ``ar_order`` (reference: check_norain.py:59)."""
    precip = np.asarray(precip)
    if precip.shape[0] < 2:
        raise ValueError("The radar input must have at least 2 time steps.")
    kw = check_norain_kwargs or {}
    norain_flags = [
        check_norain(
            obs,
            kw.get("precip_thr"),
            kw.get("norain_thr", 0.0),
            kw.get("win_fun"),
            False,
        )
        for obs in precip
    ]
    if norain_flags[-1] or not np.any(norain_flags):
        return precip, ar_order
    if norain_flags[-2]:
        # rain in latest but none in 2nd latest: treat as clutter, fall back
        # to a zero-precip AR(2) input
        precip = np.ones((3,) + precip.shape[1:]) * np.nanmin(precip)
        print(
            "[WARNING] Precip + no-precip in the 2 latest radar inputs; "
            "set to zero-precip radar input."
        )
        return precip, 2
    last_norain = int(np.max(np.nonzero(norain_flags)[0]))
    precip = precip[last_norain + 1 :]
    if precip.shape[0] - 1 < ar_order:
        print(
            f"[WARNING] Radar input only has {precip.shape[0]} usable steps; "
            f"ar_order reduced to {precip.shape[0] - 1}."
        )
    return precip, min(ar_order, precip.shape[0] - 1)
