from pysteps_tpu.noise import fftgenerators, motion, utils  # noqa: F401
from pysteps_tpu.noise.interface import get_method  # noqa: F401
