"""
Temporal/spatial aggregation and domain reshaping
(reference: pysteps/utils/dimension.py:25,120,219,342,454).

Block aggregations are single reshapes + reductions (one XLA fusion);
clip/square are host-side shape surgery done before jit boundaries.
"""

import numpy as np
import jax.numpy as jnp

_AGG = {
    "mean": jnp.mean,
    "sum": jnp.sum,
    "nanmean": jnp.nanmean,
    "nansum": jnp.nansum,
    "min": jnp.min,
    "max": jnp.max,
    "nanmin": jnp.nanmin,
    "nanmax": jnp.nanmax,
}


def aggregate_fields(data, window_size, axis=0, method="mean", trim=False):
    """Block-aggregate along one or several axes
    (reference: dimension.py:219)."""
    if np.ndim(axis) > 0 and np.ndim(window_size) == 0:
        # scalar window over several axes (reference: dimension.py:219
        # broadcasts the window size)
        window_size = [window_size] * len(np.atleast_1d(axis))
    if np.ndim(window_size) > 0:
        if len(window_size) != len(np.atleast_1d(axis)):
            raise ValueError("window_size and axis must have the same length")
        out = data
        for ws, ax in zip(window_size, np.atleast_1d(axis)):
            out = aggregate_fields(out, ws, axis=int(ax), method=method, trim=trim)
        return out

    window_size = int(window_size)
    if window_size <= 0:
        raise ValueError("window_size must be positive")
    data = jnp.asarray(data)
    n = data.shape[axis]
    if n % window_size:
        if not trim:
            raise ValueError(
                f"window_size {window_size} does not equally split axis of size {n}"
            )
        keep = (n // window_size) * window_size
        data = jnp.take(data, jnp.arange(keep), axis=axis)
        n = keep
    if method not in _AGG:
        raise ValueError(f"unknown method {method}")
    axis = axis % data.ndim
    new_shape = (
        data.shape[:axis] + (n // window_size, window_size) + data.shape[axis + 1 :]
    )
    return _AGG[method](data.reshape(new_shape), axis=axis + 1)


def aggregate_fields_time(R, metadata, time_window_min, ignore_nan=False):
    """Aggregate a (t,m,n) or (l,t,m,n) series in time
    (reference: dimension.py:25)."""
    metadata = dict(metadata)
    if time_window_min is None:
        return jnp.asarray(R), metadata
    R = jnp.asarray(R)
    axis = 0 if R.ndim == 3 else 1
    timestamps = metadata["timestamps"]
    delta = (timestamps[1] - timestamps[0]).seconds / 60
    if delta == time_window_min:
        return R, metadata
    if (R.shape[axis] * delta) % time_window_min:
        raise ValueError("time_window_min does not equally split R")
    nframes = int(time_window_min / delta)
    method = "mean" if metadata["unit"] == "mm/h" else "sum"
    if ignore_nan:
        method = "nan" + method
    R = aggregate_fields(R, nframes, axis=axis, method=method)
    metadata["accutime"] = time_window_min
    metadata["timestamps"] = timestamps[nframes - 1 :: nframes]
    return R, metadata


def aggregate_fields_space(R, metadata, space_window, ignore_nan=False):
    """Upscale fields spatially by block aggregation
    (reference: dimension.py:120).  ``space_window`` is in metadata units
    (e.g. metres) or a (ywin, xwin) tuple.
    """
    metadata = dict(metadata)
    if space_window is None:
        return jnp.asarray(R), metadata
    R = jnp.asarray(R)
    if R.ndim == 2:
        axes = (0, 1)
    elif R.ndim == 3:
        axes = (1, 2)
    else:
        axes = (2, 3)
    if np.isscalar(space_window):
        space_window = (space_window, space_window)
    ydelta = metadata["ypixelsize"]
    xdelta = metadata["xpixelsize"]
    nframes = (int(space_window[0] / ydelta), int(space_window[1] / xdelta))
    if (R.shape[axes[0]] % nframes[0]) or (R.shape[axes[1]] % nframes[1]):
        raise ValueError("space_window does not equally split R")
    method = "mean" if metadata["unit"] == "mm/h" else "sum"
    if ignore_nan:
        method = "nan" + method
    R = aggregate_fields(R, nframes[0], axis=axes[0], method=method)
    R = aggregate_fields(R, nframes[1], axis=axes[1], method=method)
    metadata["ypixelsize"] = space_window[0]
    metadata["xpixelsize"] = space_window[1]
    return R, metadata


def clip_domain(R, metadata, extent=None):
    """Clip fields to a geographical extent (x1, x2, y1, y2)
    (reference: dimension.py:342)."""
    metadata = dict(metadata)
    if extent is None:
        return jnp.asarray(R), metadata
    R = np.asarray(R)
    m, n = R.shape[-2:]
    x = metadata["x1"] + metadata["xpixelsize"] * (np.arange(n) + 0.5)
    if metadata.get("yorigin", "upper") == "upper":
        y = metadata["y2"] - metadata["ypixelsize"] * (np.arange(m) + 0.5)
    else:
        y = metadata["y1"] + metadata["ypixelsize"] * (np.arange(m) + 0.5)
    ix = (x >= extent[0]) & (x <= extent[1])
    iy = (y >= extent[2]) & (y <= extent[3])
    out = R[..., iy, :][..., ix]
    metadata["x1"] = float(x[ix].min() - 0.5 * metadata["xpixelsize"])
    metadata["x2"] = float(x[ix].max() + 0.5 * metadata["xpixelsize"])
    metadata["y1"] = float(y[iy].min() - 0.5 * metadata["ypixelsize"])
    metadata["y2"] = float(y[iy].max() + 0.5 * metadata["ypixelsize"])
    return jnp.asarray(out), metadata


def square_domain(R, metadata, method="pad", inverse=False):
    """Pad or crop fields to a square domain; invertible via metadata
    (reference: dimension.py:454)."""
    metadata = dict(metadata)
    R = jnp.asarray(R)
    if not inverse:
        m, n = R.shape[-2:]
        if m == n:
            return R, metadata
        metadata["orig_domain"] = (m, n)
        metadata["square_method"] = method
        if method == "pad":
            side = max(m, n)
            pm, pn = side - m, side - n
            pad = [(0, 0)] * (R.ndim - 2) + [
                (pm // 2, pm - pm // 2),
                (pn // 2, pn - pn // 2),
            ]
            R = jnp.pad(R, pad, mode="constant", constant_values=jnp.nanmin(R))
        elif method == "crop":
            side = min(m, n)
            i0, j0 = (m - side) // 2, (n - side) // 2
            R = R[..., i0 : i0 + side, j0 : j0 + side]
        else:
            raise ValueError(f"unknown method {method}")
        return R, metadata

    method = metadata.pop("square_method")
    m, n = metadata.pop("orig_domain")
    if method == "pad":
        side = R.shape[-1]
        pm, pn = side - m, side - n
        return R[..., pm // 2 : pm // 2 + m, pn // 2 : pn // 2 + n], metadata
    if method == "crop":
        raise ValueError("cannot invert a crop")
    raise ValueError(f"unknown method {method}")
