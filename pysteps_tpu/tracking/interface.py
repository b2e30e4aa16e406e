"""Tracking registry (reference: pysteps/tracking/interface.py:19-20)."""

from pysteps_tpu.tracking import lucaskanade


def _get_tdating():
    from pysteps_tpu.tracking import tdating

    return tdating.dating


def get_method(name):
    name = name.lower() if isinstance(name, str) else name
    if name == "lucaskanade":
        return lucaskanade.track_features
    if name == "tdating":
        return _get_tdating()
    raise ValueError(f"unknown tracking method {name}")
