from pysteps_tpu.downscaling import rainfarm  # noqa: F401
from pysteps_tpu.downscaling.interface import get_method  # noqa: F401
