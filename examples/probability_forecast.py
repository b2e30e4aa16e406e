#!/usr/bin/env python
"""
Lagrangian probability forecast example (reference:
pysteps/examples/probability_forecast.py) — exceedance probabilities from
neighbourhood extrapolation (fast, no ensemble needed).
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

precip, metadata = datasets.load_dataset("mch", frames=6)
precip = np.asarray(precip)
train, truth = precip[:3], precip[3:]

velocity = np.asarray(motion.get_method("LK")(10 * np.log10(np.maximum(train, 0.1))))

thr = 1.0  # mm/h
prob = np.asarray(
    nowcasts.get_method("probability")(
        train[-1], velocity, 3, threshold=thr, slope=5
    )
)

fig, axes = plt.subplots(1, 3, figsize=(15, 5))
plot_precip_field(truth[2], ax=axes[0], title="observed +3", colorbar=False)
plot_precip_field(prob[2], ptype="prob", ax=axes[1], title=f"P(R > {thr} mm/h) +3")
axes[2].hist(prob[2].ravel(), bins=20)
axes[2].set_title("probability histogram")
plt.tight_layout()
plt.savefig("/tmp/probability_forecast.png", dpi=72)
print("wrote /tmp/probability_forecast.png")
