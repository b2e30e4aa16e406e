"""Cascade method registry (reference: pysteps/cascade/interface.py:14-17)."""

from pysteps_tpu.cascade import bandpass_filters, decomposition

_cascade_methods = {
    "fft": (decomposition.decomposition_fft, decomposition.recompose_fft),
    "gaussian": bandpass_filters.filter_gaussian,
    "uniform": bandpass_filters.filter_uniform,
}


def get_method(name):
    if name is None:
        raise ValueError("name is None")
    try:
        return _cascade_methods[name.lower()]
    except KeyError:
        raise ValueError(
            f"unknown cascade method {name}; available: {list(_cascade_methods)}"
        ) from None
