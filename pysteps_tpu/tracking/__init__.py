from pysteps_tpu.tracking.interface import get_method  # noqa: F401
