#!/usr/bin/env python
"""
Ensemble verification example (reference:
pysteps/examples/plot_ensemble_verification.py): run a STEPS ensemble,
verify with rank histogram, reliability diagram and ROC.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pysteps_tpu import datasets, motion, nowcasts
from pysteps_tpu.postprocessing import ensemblestats
from pysteps_tpu.utils import transformation
from pysteps_tpu.verification import ensscores, probscores
from pysteps_tpu.verification.plots import plot_ROC, plot_rankhist, plot_reldiag

precip, metadata = datasets.load_dataset("mch", frames=9)
precip = np.asarray(precip)
train_db, meta_db = transformation.dB_transform(
    precip[:3], metadata, threshold=0.1, zerovalue=-15.0
)
train_db = np.asarray(train_db)
velocity = motion.get_method("LK")(train_db)

n_leadtimes = 6
forecast_db = np.asarray(
    nowcasts.get_method("steps")(
        train_db, velocity, n_leadtimes,
        n_ens_members=12, precip_thr=meta_db["threshold"],
        kmperpixel=1.0, timestep=5, seed=42,
    )
)
forecast_r, _ = transformation.dB_transform(forecast_db, meta_db, inverse=True)
forecast_r = np.asarray(forecast_r)
obs = precip[3 : 3 + n_leadtimes]

# CRPS per lead time
for t in range(n_leadtimes):
    crps = probscores.CRPS(forecast_r[:, t], obs[t])
    print(f"+{(t + 1) * 5:3d} min: CRPS = {crps:.3f}")

fig, axes = plt.subplots(1, 3, figsize=(15, 4))
rh = ensscores.rankhist(forecast_r[:, -1], obs[n_leadtimes - 1], X_min=0.1)
plot_rankhist(rh, ax=axes[0])
P = np.asarray(ensemblestats.excprob(forecast_r[:, -1], 1.0))
plot_reldiag(probscores.reldiag(P, obs[n_leadtimes - 1], 1.0), ax=axes[1])
plot_ROC(probscores.ROC_curve(P, obs[n_leadtimes - 1], 1.0), ax=axes[2])
fig.savefig("ensemble_verification_example.png", dpi=100, bbox_inches="tight")
print("wrote ensemble_verification_example.png")
