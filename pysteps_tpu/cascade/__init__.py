from pysteps_tpu.cascade import bandpass_filters, decomposition  # noqa: F401
from pysteps_tpu.cascade.interface import get_method  # noqa: F401
