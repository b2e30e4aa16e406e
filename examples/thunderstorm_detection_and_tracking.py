#!/usr/bin/env python
"""
Thunderstorm cell detection and tracking example (reference:
pysteps/examples/thunderstorm_detection_and_tracking.py) — multi-threshold
cell detection (tstorm) plus DATing overlap tracking across frames.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pysteps_tpu import datasets
from pysteps_tpu.feature import tstorm
from pysteps_tpu.tracking import tdating
from pysteps_tpu.utils.conversion import to_reflectivity

precip, metadata = datasets.load_dataset("mch", frames=5)
refl, meta_z = to_reflectivity(np.asarray(precip), metadata)
refl = np.asarray(refl)
# scale into a convective-looking dBZ range for the 35 dBZ detector
refl = refl + (42.0 - np.nanpercentile(refl, 99.5))

timelist = list(range(refl.shape[0]))
track_list, cell_list, label_list = tdating.dating(refl, timelist, mintrack=2)
print(f"{len(cell_list)} frames processed, {len(track_list)} tracks found")

cells, labels = tstorm.detection(refl[-1], minref=35.0)
print(f"last frame: {len(cells)} cells detected")

fig, ax = plt.subplots(figsize=(7, 7))
ax.imshow(refl[-1], cmap="turbo", vmin=0, vmax=55)
for _, row in cells.iterrows():
    ax.plot(row["cen_x"], row["cen_y"], "k+", markersize=10)
for track in track_list:
    ax.plot(track["cen_x"], track["cen_y"], "-w", lw=1.5)
ax.set_title("cells (+) and DATing tracks (white)")
ax.axis("off")
plt.savefig("/tmp/thunderstorm_tracking.png", dpi=72)
print("wrote /tmp/thunderstorm_tracking.png")
