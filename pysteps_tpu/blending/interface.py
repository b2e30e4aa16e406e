"""Blending registry (reference: pysteps/blending/interface.py:21-24)."""

import functools

from pysteps_tpu.blending import linear_blending, steps


def _get_pca_enkf():
    from pysteps_tpu.blending import pca_ens_kalman_filter

    return pca_ens_kalman_filter.forecast


_blending_methods = {
    "linear_blending": linear_blending.forecast,
    "salient_blending": functools.partial(linear_blending.forecast, saliency=True),
    "steps": steps.forecast,
}


def get_method(name):
    if name is None:
        raise ValueError("name is None")
    name = name.lower()
    if name == "pca_enkf":
        return _get_pca_enkf()
    try:
        return _blending_methods[name]
    except KeyError:
        raise ValueError(
            f"unknown blending method {name}; "
            f"available: {list(_blending_methods) + ['pca_enkf']}"
        ) from None
