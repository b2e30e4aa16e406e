#!/usr/bin/env python
"""
RainFARM stochastic downscaling example (reference:
pysteps/examples/rainfarm_downscale.py) — downscale a coarse
precipitation field by a factor of 4 while preserving its power-law
spectrum and coarse-scale aggregates.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pysteps_tpu import datasets
from pysteps_tpu.downscaling import rainfarm
from pysteps_tpu.utils.dimension import aggregate_fields_space

precip, metadata = datasets.load_dataset("mch", frames=2)
field = np.asarray(precip[-1])

# upscale to a coarse grid first (so we have a reference fine field)
coarse = np.asarray(
    aggregate_fields_space(field[None], metadata, metadata["xpixelsize"] * 4)[0][0]
)

fine = np.asarray(rainfarm.downscale(coarse, ds_factor=4, threshold=0.1, seed=42))

fig, axes = plt.subplots(1, 3, figsize=(15, 5))
axes[0].imshow(np.log1p(field), cmap="viridis")
axes[0].set_title(f"original {field.shape}")
axes[1].imshow(np.log1p(coarse), cmap="viridis")
axes[1].set_title(f"coarse {coarse.shape}")
axes[2].imshow(np.log1p(fine), cmap="viridis")
axes[2].set_title(f"RainFARM x4 {fine.shape}")
for ax in axes:
    ax.axis("off")
plt.tight_layout()
plt.savefig("/tmp/rainfarm_downscale.png", dpi=72)
print("wrote /tmp/rainfarm_downscale.png")
