"""Extrapolation registry (reference: pysteps/extrapolation/interface.py:107-111)."""

import jax.numpy as jnp
import numpy as np

from pysteps_tpu.extrapolation import semilagrangian


def eulerian_persistence(precip, velocity, timesteps, outval=np.nan, **kwargs):
    """Repeat the last field (reference: extrapolation/interface.py:41-93)."""
    del velocity, outval
    num = timesteps if isinstance(timesteps, int) else len(timesteps)
    out = jnp.repeat(jnp.asarray(precip)[None], num, axis=0)
    if kwargs.get("return_displacement", False):
        return out, jnp.zeros((2,) + precip.shape)
    return out


def _do_nothing(precip, velocity, timesteps, outval=np.nan, **kwargs):
    return None


_extrapolation_methods = {
    "eulerian": eulerian_persistence,
    "semilagrangian": semilagrangian.extrapolate,
    None: _do_nothing,
    "none": _do_nothing,
}


def get_method(name):
    if isinstance(name, str):
        name = name.lower()
    try:
        return _extrapolation_methods[name]
    except KeyError:
        raise ValueError(
            f"unknown extrapolation method {name}; "
            f"available: {list(_extrapolation_methods)}"
        ) from None
