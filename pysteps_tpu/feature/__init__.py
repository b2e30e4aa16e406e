from pysteps_tpu.feature.interface import get_method  # noqa: F401
