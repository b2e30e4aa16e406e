"""
Motion-field plotting: quiver and streamplot
(reference: pysteps/visualization/motionfields.py:145,193).
"""

import matplotlib.pyplot as plt
import numpy as np


def quiver(uv_motion_field, ax=None, geodata=None, axis="on", step=20,
           quiver_kwargs=None, map_kwargs=None):
    """Quiver plot of a (2, m, n) motion field
    (reference: motionfields.py:145)."""
    uv = np.asarray(uv_motion_field)
    if ax is None:
        ax = plt.gca()
    quiver_kwargs = quiver_kwargs or {}
    m, n = uv.shape[1:]
    ys = np.arange(0, m, step)
    xs = np.arange(0, n, step)
    X, Y = np.meshgrid(xs, ys)
    U = uv[0][::step, ::step]
    V = uv[1][::step, ::step]
    ax.quiver(X, Y, U, -V, angles="xy", **quiver_kwargs)
    if axis == "off":
        ax.axis("off")
    return ax


def streamplot(uv_motion_field, ax=None, geodata=None, axis="on",
               streamplot_kwargs=None, map_kwargs=None):
    """Streamplot of a (2, m, n) motion field
    (reference: motionfields.py:193)."""
    uv = np.asarray(uv_motion_field)
    if ax is None:
        ax = plt.gca()
    streamplot_kwargs = streamplot_kwargs or {}
    m, n = uv.shape[1:]
    x = np.arange(n)
    y = np.arange(m)
    ax.streamplot(x, y, uv[0], -uv[1], **streamplot_kwargs)
    if axis == "off":
        ax.axis("off")
    return ax
