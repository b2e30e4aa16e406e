"""Nowcast-method registry (reference: pysteps/nowcasts/interface.py:44-54)."""

from pysteps_tpu.nowcasts import (
    extrapolation,
    lagrangian_probability,
    sprog,
    steps,
)

_nowcast_methods = {
    "eulerian": None,  # filled below
    "extrapolation": extrapolation.forecast,
    "lagrangian": extrapolation.forecast,
    "lagrangian_probability": lagrangian_probability.forecast,
    "probability": lagrangian_probability.forecast,
    "sprog": sprog.forecast,
    "steps": steps.forecast,
}


def _eulerian_forecast(precip, velocity, timesteps, **kwargs):
    from pysteps_tpu.extrapolation.interface import eulerian_persistence

    return eulerian_persistence(precip, velocity, timesteps, **kwargs)


_nowcast_methods["eulerian"] = _eulerian_forecast


def _register_lazy():
    # anvil / linda / sseps are registered lazily to keep import light
    try:
        from pysteps_tpu.nowcasts import anvil

        _nowcast_methods["anvil"] = anvil.forecast
    except ImportError:
        pass
    try:
        from pysteps_tpu.nowcasts import sseps

        _nowcast_methods["sseps"] = sseps.forecast
    except ImportError:
        pass
    try:
        from pysteps_tpu.nowcasts import linda

        _nowcast_methods["linda"] = linda.forecast
    except ImportError:
        pass


_register_lazy()


def get_method(name):
    if name is None:
        raise ValueError("name is None")
    try:
        return _nowcast_methods[name.lower()]
    except KeyError:
        raise ValueError(
            f"unknown nowcasting method {name}; available: {list(_nowcast_methods)}"
        ) from None
