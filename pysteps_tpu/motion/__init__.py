from pysteps_tpu.motion.interface import get_method  # noqa: F401
from pysteps_tpu.motion.lucaskanade import dense_lucaskanade  # noqa: F401
