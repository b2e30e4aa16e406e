from pysteps_tpu.blending import (  # noqa: F401
    clim,
    linear_blending,
    skill_scores,
    steps,
    utils,
)
from pysteps_tpu.blending.interface import get_method  # noqa: F401
