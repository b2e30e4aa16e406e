from pysteps_tpu.verification import (  # noqa: F401
    detcatscores,
    detcontscores,
    ensscores,
    probscores,
    spatialscores,
)
from pysteps_tpu.verification.interface import get_method  # noqa: F401
from pysteps_tpu.verification.probscores import CRPS  # noqa: F401
