#!/usr/bin/env python
"""
ANVIL and LINDA nowcast examples (reference:
pysteps/examples/anvil_nowcast.py, linda_nowcasts.py) — the two
deterministic/feature-based model families next to S-PROG.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pysteps_tpu import datasets, motion, nowcasts
from pysteps_tpu.visualization import plot_precip_field

precip, metadata = datasets.load_dataset("mch", frames=8)
# crop to 128x128 to keep the CPU-side example fast; on TPU the full
# domain runs in seconds
precip = np.asarray(precip)[:, :128, :128]
train, truth = precip[:4], precip[4:]

velocity = np.asarray(motion.get_method("LK")(10 * np.log10(np.maximum(train[-3:], 0.1))))

# ANVIL operates on rain rates (or VIL) directly — no dB transform
anvil_fc = np.asarray(
    nowcasts.get_method("anvil")(train, velocity, 3, ar_window_radius=25)
)

# LINDA: feature-based localized nowcast, deterministic mode
linda_fc = np.asarray(
    nowcasts.get_method("linda")(
        train[1:], velocity, 3, add_perturbations=False, feature_method="blob", max_num_features=8
    )
)

fig, axes = plt.subplots(1, 3, figsize=(15, 5))
plot_precip_field(truth[2], ax=axes[0], title="observed +3", colorbar=False)
plot_precip_field(anvil_fc[2], ax=axes[1], title="ANVIL +3", colorbar=False)
plot_precip_field(linda_fc[2], ax=axes[2], title="LINDA +3", colorbar=True)
plt.tight_layout()
plt.savefig("/tmp/anvil_linda_nowcasts.png", dpi=72)
print("wrote /tmp/anvil_linda_nowcasts.png")
