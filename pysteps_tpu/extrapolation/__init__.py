from pysteps_tpu.extrapolation import semilagrangian  # noqa: F401
from pysteps_tpu.extrapolation.interface import get_method  # noqa: F401
