from pysteps_tpu.utils import (  # noqa: F401
    arrays,
    check_norain,
    cleansing,
    conversion,
    dimension,
    fft,
    images,
    interpolate,
    pca,
    profiling,
    spectral,
    tapering,
    transformation,
)
from pysteps_tpu.utils.interface import get_method  # noqa: F401
