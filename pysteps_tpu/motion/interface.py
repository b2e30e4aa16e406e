"""Motion-method registry (reference: pysteps/motion/interface.py:36-46)."""

import numpy as np

from pysteps_tpu.motion.constant import constant
from pysteps_tpu.motion.darts import DARTS
from pysteps_tpu.motion.farneback import farneback
from pysteps_tpu.motion.lucaskanade import dense_lucaskanade
from pysteps_tpu.motion.proesmans import proesmans
from pysteps_tpu.motion.vet import vet


def _do_nothing(input_images, **kwargs):
    return np.zeros((2,) + np.asarray(input_images).shape[1:], dtype=np.float32)


_motion_methods = {
    "constant": constant,
    "darts": DARTS,
    "farneback": farneback,
    "lk": dense_lucaskanade,
    "lucaskanade": dense_lucaskanade,
    "proesmans": proesmans,
    "vet": vet,
    None: _do_nothing,
    "none": _do_nothing,
}


def get_method(name):
    if isinstance(name, str):
        name = name.lower()
    if name in ("brox", "clg"):
        raise NotImplementedError(f"method {name} not implemented")
    try:
        return _motion_methods[name]
    except KeyError:
        raise ValueError(
            f"unknown optical flow method {name}; "
            f"available: {list(_motion_methods)}"
        ) from None
