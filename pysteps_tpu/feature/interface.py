"""Feature-detection registry (reference: pysteps/feature/interface.py:37-39)."""

from pysteps_tpu.feature import shitomasi


def _get_blob():
    from pysteps_tpu.feature import blob

    return blob.detection


def _get_tstorm():
    from pysteps_tpu.feature import tstorm

    return tstorm.detection


def get_method(name):
    name = name.lower() if isinstance(name, str) else name
    if name == "shitomasi":
        return shitomasi.detection
    if name == "blob":
        return _get_blob()
    if name == "tstorm":
        return _get_tstorm()
    raise ValueError(f"unknown feature detection method {name}")
