"""
Basemap plotting (reference: pysteps/visualization/basemaps.py:53,144).

Cartopy is not an available dependency; these entry points are gated and
`plot_geography` falls back to a plain axes with the domain extent.
"""

import matplotlib.pyplot as plt

from pysteps_tpu.exceptions import MissingOptionalDependency


def plot_geography(proj4str, extent, lw=0.5, drawlonlatlines=False,
                   drawlonlatlabels=True, scale="50m", subplot=None, **kwargs):
    """Geographic basemap (reference: basemaps.py:53).  Without cartopy,
    returns plain axes with the requested extent."""
    try:
        import cartopy  # noqa: F401
    except ImportError:
        ax = plt.gca() if subplot is None else plt.subplot(subplot)
        ax.set_xlim(extent[0], extent[1])
        ax.set_ylim(extent[2], extent[3])
        return ax
    raise NotImplementedError("cartopy basemap path not implemented")


def plot_map_cartopy(*args, **kwargs):
    """(reference: basemaps.py:144)"""
    raise MissingOptionalDependency(
        "cartopy is required for plot_map_cartopy but is not installed"
    )
