from pysteps_tpu.ops import warp  # noqa: F401
