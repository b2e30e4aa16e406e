#!/usr/bin/env python
"""
STEPS ensemble nowcast example (reference:
pysteps/examples/plot_steps_nowcast.py) — runs on the synthetic dataset so
it works offline; swap `datasets.load_dataset` for your own radar archive
via pysteps_tpu.io.
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
from pysteps_tpu.visualization import plot_precip_field

# --- load input data -----------------------------------------------------
precip, metadata = datasets.load_dataset("mch", frames=9)
train, truth = np.asarray(precip[:3]), np.asarray(precip[3:])

# transform to dB
train_db, meta_db = transformation.dB_transform(
    train, metadata, threshold=0.1, zerovalue=-15.0
)
train_db = np.asarray(train_db)

# --- motion estimation ---------------------------------------------------
velocity = motion.get_method("LK")(train_db)

# --- STEPS ensemble nowcast ---------------------------------------------
n_ens_members = 12
n_leadtimes = 6
forecast = nowcasts.get_method("steps")(
    train_db,
    velocity,
    n_leadtimes,
    n_ens_members=n_ens_members,
    n_cascade_levels=6,
    precip_thr=meta_db["threshold"],
    kmperpixel=1.0,
    timestep=5,
    noise_method="nonparametric",
    vel_pert_method="bps",
    mask_method="incremental",
    seed=24,
)

# back-transform to rain rate
forecast_r, _ = transformation.dB_transform(
    np.asarray(forecast), meta_db, inverse=True
)
forecast_r = np.asarray(forecast_r)

# --- plots ---------------------------------------------------------------
fig, axes = plt.subplots(2, 2, figsize=(10, 9))
plot_precip_field(truth[n_leadtimes - 1], ax=axes[0, 0], title="observation")
plot_precip_field(
    ensemblestats.mean(forecast_r[:, -1]), ax=axes[0, 1], title="ensemble mean"
)
P = ensemblestats.excprob(forecast_r[:, -1], 1.0)
plot_precip_field(
    np.asarray(P), ptype="prob", ax=axes[1, 0], title="P(R > 1 mm/h)"
)
plot_precip_field(forecast_r[0, -1], ax=axes[1, 1], title="member 0")
fig.savefig("steps_nowcast_example.png", dpi=100, bbox_inches="tight")
print("wrote steps_nowcast_example.png")
