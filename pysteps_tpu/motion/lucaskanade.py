"""
Dense Lucas-Kanade optical flow (reference:
pysteps/motion/lucaskanade.py:38-279).

Pipeline (all OpenCV stages re-implemented natively):
morphological declutter -> Shi-Tomasi corners (feature/shitomasi.py) ->
pyramidal LK tracking (tracking/lucaskanade.py) -> outlier removal ->
declustering -> IDW/RBF interpolation to a dense (2, m, n) field.
"""

import time

import numpy as np

from pysteps_tpu.feature import shitomasi
from pysteps_tpu.tracking.lucaskanade import (  # noqa: F401 (track_features: API)
    track_features,
    track_features_batch,
)
from pysteps_tpu.utils import cleansing, images, interpolate


def dense_lucaskanade(input_images, lk_kwargs=None, fd_method="shitomasi",
                      fd_kwargs=None, interp_method="idwinterp2d",
                      interp_kwargs=None, dense=True, nr_std_outlier=3,
                      k_outlier=30, size_opening=3, decl_scale=20,
                      verbose=False, **kwargs):
    """Dense LK flow with the reference's signature
    (reference: motion/lucaskanade.py:38).  Returns (2, m, n), or (xy, uv)
    if dense=False.
    """
    input_images = np.asarray(input_images, dtype=np.float32)
    if input_images.ndim != 3 or input_images.shape[0] < 2:
        raise ValueError("input_images must be (T>=2, m, n)")
    lk_kwargs = lk_kwargs or {}
    fd_kwargs = fd_kwargs or {}
    interp_kwargs = dict(interp_kwargs or {})

    if verbose:
        print("Computing the motion field with the Lucas-Kanade method.")
        t0 = time.time()

    nr_fields = input_images.shape[0]
    domain_size = input_images.shape[1:]

    # the whole pipeline runs in THREE device dispatches regardless of
    # the number of frame pairs: one batched declutter, one batched
    # corner detection, one batched pyramidal-LK track (per-pair eager
    # stages cost one ~50 ms tunnel round-trip each)
    minvals = [
        float(np.nanmin(f)) if np.any(np.isfinite(f)) else 0.0
        for f in input_images
    ]
    filled = np.stack(
        [
            np.where(np.isfinite(f), f, mv)
            for f, mv in zip(input_images, minvals)
        ]
    )
    if size_opening is not None and size_opening > 0:
        # stays device-resident: the tracker consumes it directly (a
        # host round-trip costs ~0.2 s over the tunnel)
        cleaned = images.morph_opening_batch(filled, minvals, size_opening)
    else:
        cleaned = filled

    masked = np.where(
        np.isfinite(input_images[:-1]), input_images[:-1], np.nan
    )
    points_list = shitomasi.detection_batch(masked, **fd_kwargs)

    xy_all, uv_all = [], []
    if any(p.shape[0] for p in points_list):
        results = track_features_batch(
            cleaned[:-1], cleaned[1:], points_list, **lk_kwargs
        )
        for xy, uv in results:
            if xy.shape[0] > 0:
                xy_all.append(xy)
                uv_all.append(uv)

    if not xy_all:
        if dense:
            return np.zeros((2,) + domain_size, dtype=np.float32)
        return np.zeros((0, 2)), np.zeros((0, 2))

    xy = np.concatenate(xy_all)
    uv = np.concatenate(uv_all)

    # outlier removal (reference: utils/cleansing.py:124)
    if nr_std_outlier is not None and xy.shape[0] > 2:
        outliers = cleansing.detect_outliers(
            uv, nr_std_outlier, coord=xy, k=k_outlier, verbose=verbose
        )
        xy, uv = xy[~outliers], uv[~outliers]

    if not dense:
        return xy, uv

    # declustering (reference: utils/cleansing.py:21)
    if decl_scale is not None and decl_scale > 1 and xy.shape[0] > 1:
        xy, uv = cleansing.decluster(xy, uv, decl_scale, 1, verbose)

    if xy.shape[0] == 0:
        return np.zeros((2,) + domain_size, dtype=np.float32)

    # densify
    xgrid = np.arange(domain_size[1], dtype=np.float32)
    ygrid = np.arange(domain_size[0], dtype=np.float32)
    interp = (
        interpolate.rbfinterp2d
        if interp_method == "rbfinterp2d"
        else interpolate.idwinterp2d
    )
    uvgrid = np.asarray(interp(xy, uv, xgrid, ygrid, **interp_kwargs))

    if verbose:
        print(f"--- total time: {time.time() - t0:.2f} seconds ---")
    return uvgrid.astype(np.float32)
