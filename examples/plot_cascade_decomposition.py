#!/usr/bin/env python
"""
Cascade decomposition example (reference:
pysteps/examples/plot_cascade_decomposition.py) — decompose a radar field
into spectrally separated levels and plot each with its bandpass filter.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pysteps_tpu import datasets
from pysteps_tpu.cascade.bandpass_filters import filter_gaussian
from pysteps_tpu.cascade.decomposition import decomposition_fft
from pysteps_tpu.utils import transformation
from pysteps_tpu.utils.spectral import rapsd

precip, metadata = datasets.load_dataset("mch", frames=3)
field = np.asarray(precip[-1])
field_db, _ = transformation.dB_transform(
    field[None], metadata, threshold=0.1, zerovalue=-15.0
)
field_db = np.asarray(field_db[0])

n_levels = 7
bp = filter_gaussian(field_db.shape, n_levels)
decomp = decomposition_fft(field_db, bp, normalize=True, compute_stats=True)
levels = np.asarray(decomp["cascade_levels"])

# radially averaged power spectrum of the input
psd, freqs = rapsd(field_db, return_freq=True)

fig, axes = plt.subplots(2, 4, figsize=(16, 8))
axes[0, 0].imshow(field_db, cmap="viridis")
axes[0, 0].set_title("input (dB)")
for k in range(n_levels):
    ax = axes.flat[k + 1]
    ax.imshow(levels[k], cmap="RdBu_r", vmin=-3, vmax=3)
    ax.set_title(
        f"level {k}: mu={float(decomp['means'][k]):.2f} "
        f"sigma={float(decomp['stds'][k]):.2f}"
    )
for ax in axes.flat:
    ax.axis("off")
plt.tight_layout()
plt.savefig("/tmp/cascade_decomposition.png", dpi=72)
print("wrote /tmp/cascade_decomposition.png")

fig2, ax = plt.subplots()
ax.loglog(freqs[1:], psd[1:])
ax.set_xlabel("frequency")
ax.set_ylabel("power")
ax.set_title("RAPSD of input field")
plt.savefig("/tmp/cascade_rapsd.png", dpi=72)
print("wrote /tmp/cascade_rapsd.png")
