#!/usr/bin/env python
"""
Optical-flow comparison example (reference:
pysteps/examples/plot_optical_flow.py).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pysteps_tpu import datasets, motion
from pysteps_tpu.utils import transformation
from pysteps_tpu.visualization import plot_precip_field, quiver

precip, metadata = datasets.load_dataset("fmi", frames=9)
precip = np.asarray(precip)
precip_db, _ = transformation.dB_transform(precip, metadata, threshold=0.1)
precip_db = np.asarray(precip_db)

fig, axes = plt.subplots(2, 2, figsize=(10, 9))
for ax, method, frames in zip(
    axes.ravel(), ["LK", "VET", "DARTS", "proesmans"], [3, 2, 9, 2]
):
    V = np.asarray(
        motion.get_method(method)(precip_db[:frames], verbose=False)
    )
    plot_precip_field(precip[frames - 1], ax=ax, colorbar=False)
    quiver(V, ax=ax, step=25)
    ax.set_title(method)
fig.savefig("optical_flow_example.png", dpi=100, bbox_inches="tight")
print("wrote optical_flow_example.png")
