"""
Shi-Tomasi corner detection (reference: pysteps/feature/shitomasi.py:26,
which wraps OpenCV goodFeaturesToTrack — here a from-scratch XLA
implementation).

Structure tensor via separable box filter -> minimum eigenvalue ->
quality-level threshold -> non-max suppression over min_distance (max
pool) -> top-k corners.  Fixed-size output (max_corners) with a validity
mask, so the detector is fully jittable.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _box_filter(field, size):
    k = jnp.ones((size, size), jnp.float32) / (size * size)
    return jax.lax.conv_general_dilated(
        field[None, None], k[None, None], (1, 1), "SAME"
    )[0, 0]


def _max_pool_same(field, size):
    return jax.lax.reduce_window(
        field, -jnp.inf, jax.lax.max, (size, size), (1, 1), "SAME"
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_corners", "min_distance", "block_size", "buffer_mask",
    ),
)
def _shitomasi_core(image, max_corners, quality_level, min_distance,
                    block_size, buffer_mask=0):
    # mask prep fused in (eager pre-ops cost one tunnel dispatch each)
    finite = jnp.isfinite(image)
    image = jnp.where(finite, image, jnp.nanmin(image))
    mask = finite
    if buffer_mask > 0:
        # shrink the valid mask by buffer_mask pixels (min-pool erosion)
        size = 2 * int(buffer_mask) + 1
        mask = (
            -jax.lax.reduce_window(
                -(mask.astype(jnp.float32)), -1.0, jax.lax.max,
                (size, size), (1, 1), "SAME",
            )
        ) > 0.5
    # Sobel gradients
    img = image.astype(jnp.float32)
    kx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32) / 8.0
    ky = kx.T
    gx = jax.lax.conv_general_dilated(img[None, None], kx[None, None], (1, 1), "SAME")[0, 0]
    gy = jax.lax.conv_general_dilated(img[None, None], ky[None, None], (1, 1), "SAME")[0, 0]

    # structure tensor smoothed over block_size
    Axx = _box_filter(gx * gx, block_size)
    Axy = _box_filter(gx * gy, block_size)
    Ayy = _box_filter(gy * gy, block_size)

    # minimum eigenvalue of [[Axx, Axy], [Axy, Ayy]]
    tr = (Axx + Ayy) / 2.0
    det_rad = jnp.sqrt(jnp.maximum(((Axx - Ayy) / 2.0) ** 2 + Axy**2, 0.0))
    min_eig = tr - det_rad
    min_eig = jnp.where(mask, min_eig, 0.0)

    # quality threshold relative to best corner
    thr = quality_level * jnp.max(min_eig)
    # non-max suppression within min_distance
    nms_size = 2 * int(min_distance) + 1
    is_peak = (min_eig >= _max_pool_same(min_eig, nms_size)) & (min_eig > thr)
    scores = jnp.where(is_peak, min_eig, -jnp.inf)

    flat = scores.ravel()
    top_scores, top_idx = jax.lax.top_k(flat, max_corners)
    ys, xs = jnp.unravel_index(top_idx, image.shape)
    valid = jnp.isfinite(top_scores) & (top_scores > 0)
    points = jnp.stack([xs, ys], axis=1).astype(jnp.float32)  # (N, 2) as (x, y)
    return points, valid


def detection(
    input_image,
    max_corners=1000,
    max_num_features=None,
    quality_level=0.01,
    min_distance=10,
    block_size=5,
    buffer_mask=5,
    use_cmask=True,
    return_mask_and_scores=False,
    **kwargs,
):
    """Shi-Tomasi corner detection with the reference's signature
    (reference: feature/shitomasi.py:26).

    Returns (N, 2) array of (x, y) corner coordinates (host-side, valid
    points only).  Use ``_shitomasi_core`` directly for the fixed-size
    jittable variant.
    """
    if max_num_features is not None:
        max_corners = max_num_features
    image = jnp.asarray(input_image, jnp.float32)
    buf = int(buffer_mask) if (use_cmask and buffer_mask > 0) else 0
    points, valid = _shitomasi_core(
        image, int(max_corners), float(quality_level),
        int(min_distance), int(block_size), buf,
    )
    points = np.asarray(points)[np.asarray(valid)]
    if return_mask_and_scores:
        mask = np.isfinite(np.asarray(input_image))
        return points, mask, None
    return points


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_corners", "min_distance", "block_size", "buffer_mask",
    ),
)
def _shitomasi_batch_core(images, max_corners, quality_level, min_distance,
                          block_size, buffer_mask=0):
    return jax.vmap(
        lambda img: _shitomasi_core(
            img, max_corners, quality_level, min_distance, block_size,
            buffer_mask,
        )
    )(images)


def detection_batch(input_images, max_corners=1000, max_num_features=None,
                    quality_level=0.01, min_distance=10, block_size=5,
                    buffer_mask=5, use_cmask=True, **kwargs):
    """Corner detection over a (T, m, n) stack in ONE dispatch.  Returns
    a list of (N_t, 2) arrays (valid corners per frame)."""
    if max_num_features is not None:
        max_corners = max_num_features
    buf = int(buffer_mask) if (use_cmask and buffer_mask > 0) else 0
    pts, valid = _shitomasi_batch_core(
        jnp.asarray(input_images, jnp.float32), int(max_corners),
        float(quality_level), int(min_distance), int(block_size), buf,
    )
    pts = np.asarray(pts)
    valid = np.asarray(valid)
    return [pts[t][valid[t]] for t in range(pts.shape[0])]
