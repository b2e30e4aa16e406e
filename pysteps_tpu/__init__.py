"""
pysteps_tpu — a TPU-native framework for probabilistic precipitation nowcasting.

A ground-up re-design of the capabilities of pySTEPS/pysteps (reference:
/root/reference, v1.21.3) for TPU hardware: the compute path is pure JAX
(XLA/Pallas/shard_map), ensembles are vmapped/sharded over a device mesh,
lead-time loops are `lax.scan`s, and stochastic streams use `jax.random`
key folding.  The public API mirrors the reference's string-registry idiom
(`<package>.get_method(name)`) and the `forecast(precip, velocity,
timesteps, **kwargs)` model signatures so that a pysteps user can switch
with minimal friction (reference: pysteps/__init__.py, */interface.py).

Layout
------
- ``pysteps_tpu.ops``        low-level TPU kernels (warp/gather, FFT helpers,
                             sort-based CDF matching, windowed statistics)
- ``pysteps_tpu.utils``      numeric utilities (transforms, conversion,
                             tapering, spectral statistics, interpolation)
- ``pysteps_tpu.cascade``    FFT multiscale decomposition
- ``pysteps_tpu.extrapolation``  semi-Lagrangian advection
- ``pysteps_tpu.motion``     optical-flow solvers (LK, VET, DARTS, Proesmans,
                             Farneback, constant)
- ``pysteps_tpu.noise``      stochastic noise generators + perturbators
- ``pysteps_tpu.timeseries`` AR(p)/VAR(p) estimation and iteration
- ``pysteps_tpu.nowcasts``   forecast models (extrapolation, S-PROG, STEPS,
                             ANVIL, SSEPS, LINDA, lagrangian probability)
- ``pysteps_tpu.blending``   radar x NWP blending
- ``pysteps_tpu.postprocessing`` / ``verification`` / ``downscaling`` /
  ``feature`` / ``tracking`` / ``io`` / ``visualization``
- ``pysteps_tpu.parallel``   mesh construction and sharding helpers
"""

from pysteps_tpu.config import (  # noqa: F401
    config_fname,
    load_config_file,
    rcparams,
)
from pysteps_tpu import (  # noqa: F401
    blending,
    cascade,
    datasets,
    downscaling,
    extrapolation,
    feature,
    io,
    motion,
    noise,
    nowcasts,
    postprocessing,
    timeseries,
    tracking,
    utils,
    verification,
)

__version__ = "0.1.0"
