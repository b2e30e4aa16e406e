from pysteps_tpu.visualization import (  # noqa: F401
    animations,
    basemaps,
    motionfields,
    precipfields,
    spectral,
    thunderstorms,
    utils,
)
from pysteps_tpu.visualization.animations import animate  # noqa: F401
from pysteps_tpu.visualization.motionfields import (  # noqa: F401
    motion_plot,
    quiver,
    streamplot,
)
from pysteps_tpu.visualization.precipfields import plot_precip_field  # noqa: F401
from pysteps_tpu.visualization.spectral import plot_spectrum1d  # noqa: F401
