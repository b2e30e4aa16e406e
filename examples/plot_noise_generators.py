#!/usr/bin/env python
"""
Stochastic noise generators example (reference:
pysteps/examples/plot_noise_generators.py) — generate correlated noise
fields whose power spectrum matches the observed precipitation, with the
nonparametric, parametric and SSFT filters.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pysteps_tpu import datasets
from pysteps_tpu.noise import get_method
from pysteps_tpu.utils import transformation

precip, metadata = datasets.load_dataset("mch", frames=3)
db, _ = transformation.dB_transform(
    np.asarray(precip), metadata, threshold=0.1, zerovalue=-15.0
)
db = np.asarray(db)

fig, axes = plt.subplots(2, 2, figsize=(10, 10))
axes[0, 0].imshow(db[-1], cmap="viridis")
axes[0, 0].set_title("input (dB)")

for ax, name in zip(axes.flat[1:], ["nonparametric", "parametric", "ssft"]):
    init, generate = get_method(name)
    filt = init(db) if name != "ssft" else init(db, win_size=(128, 128))
    eps = np.asarray(generate(filt, seed=42))
    ax.imshow(eps, cmap="RdBu_r", vmin=-3, vmax=3)
    ax.set_title(f"{name} noise")

for ax in axes.flat:
    ax.axis("off")
plt.tight_layout()
plt.savefig("/tmp/noise_generators.png", dpi=72)
print("wrote /tmp/noise_generators.png")
