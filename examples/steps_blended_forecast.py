#!/usr/bin/env python
"""
STEPS radar x NWP blending example (reference:
pysteps/examples/steps_blended_forecast.py) — blend a STEPS ensemble
extrapolation nowcast with an NWP forecast, with lead-time-dependent
skill weights.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pysteps_tpu import blending, datasets, motion
from pysteps_tpu.postprocessing import ensemblestats
from pysteps_tpu.utils import transformation
from pysteps_tpu.visualization import plot_precip_field

# radar observations (3 past frames) + a synthetic "NWP" run (the true
# future, slightly degraded, standing in for a real model forecast)
precip, metadata = datasets.load_dataset("mch", frames=9)
precip = np.asarray(precip)
db, meta_db = transformation.dB_transform(
    precip, metadata, threshold=0.1, zerovalue=-15.0
)
db = np.asarray(db)
radar_db = db[:3]
rng = np.random.RandomState(7)
nwp_db = db[2:8] + 0.5 * rng.randn(6, *db.shape[1:]).astype(np.float32)

velocity = np.asarray(motion.get_method("LK")(radar_db))
velocity_nwp = velocity.copy()

n_timesteps, n_members = 4, 6
forecast_db = blending.get_method("steps")(
    radar_db, nwp_db[None], velocity, velocity_nwp[None],
    n_timesteps, 5,
    n_ens_members=n_members, n_cascade_levels=6,
    precip_thr=meta_db["threshold"], kmperpixel=1.0,
    mask_method="incremental", probmatching_method="cdf",
    seed=24,
)
forecast_db = np.asarray(forecast_db)

# back-transform and plot the ensemble mean at the last lead time
forecast, _ = transformation.dB_transform(
    forecast_db, meta_db, inverse=True, threshold=meta_db["threshold"]
)
ens_mean = np.asarray(ensemblestats.mean(np.asarray(forecast)[:, -1]))

fig, axes = plt.subplots(1, 3, figsize=(15, 5))
plot_precip_field(precip[2 + n_timesteps], ax=axes[0], title="observed", colorbar=False)
plot_precip_field(ens_mean, ax=axes[1], title="blended ens. mean", colorbar=False)
prob = np.asarray(ensemblestats.excprob(np.asarray(forecast)[:, -1], 1.0))
plot_precip_field(prob, ptype="prob", ax=axes[2], title="P(R > 1 mm/h)", colorbar=True)
plt.tight_layout()
plt.savefig("/tmp/steps_blended_forecast.png", dpi=72)
print("wrote /tmp/steps_blended_forecast.png")
