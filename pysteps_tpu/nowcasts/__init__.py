from pysteps_tpu.nowcasts.interface import get_method  # noqa: F401
