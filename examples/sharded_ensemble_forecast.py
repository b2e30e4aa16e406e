#!/usr/bin/env python
"""
Multi-device ensemble nowcasting on a TPU mesh.

The framework's single distribution mechanism is a device mesh with axes
("ens", "y", "x") — ensemble members shard over "ens" (pure data
parallelism), grid rows over "y" (halo-exchange advection, distributed
FFTs, psum reductions inside the scan).  The same code runs on one chip,
a multi-chip slice, or — as here — a virtual CPU mesh for development:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python examples/sharded_ensemble_forecast.py

There is no reference analog: pysteps parallelizes members with a dask
thread pool on one node (pysteps/nowcasts/utils.py:464-512).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# fewer than 8 accelerator devices -> fall back to a virtual 8-device CPU
# mesh (the axon TPU plugin ignores the JAX_PLATFORMS env var, so the
# platform must be pinned through jax.config before the backend
# initializes — same mechanism as tests/conftest.py)
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
jax.config.update("jax_platforms", "cpu")

import numpy as np

from pysteps_tpu import datasets, motion, nowcasts
from pysteps_tpu.parallel import make_mesh
from pysteps_tpu.utils import transformation
from pysteps_tpu.verification import ensscores

precip, metadata = datasets.load_dataset("mch", frames=9)
precip = np.asarray(precip)
db, meta_db = transformation.dB_transform(
    precip, metadata, threshold=0.1, zerovalue=-15.0
)
db = np.asarray(db, np.float32)
velocity = motion.get_method("LK")(db[:3])

# --- members over all 8 devices ("ens") ------------------------------
mesh = make_mesh(ens=8)
ensemble = nowcasts.get_method("steps")(
    db[:3], velocity, 6,
    n_ens_members=16, n_cascade_levels=6,
    precip_thr=meta_db["threshold"], kmperpixel=1.0, timestep=5,
    seed=42, mesh=mesh,
)
print("ens-sharded STEPS:", np.asarray(ensemble).shape)

# --- members x grid rows (2 "ens" x 4 "y") ---------------------------
# the full member update runs with the grid partitioned: halo-exchange
# advection, sharded noise, psum CDF matching (parallel/sharded_steps.py)
from pysteps_tpu.parallel import sharded_steps

mesh2 = make_mesh(ens=2, y=4)
ens_sp = sharded_steps.forecast(
    db[:3], velocity, 6, mesh2,
    n_ens_members=8, n_cascade_levels=6,
    precip_thr=meta_db["threshold"], kmperpixel=1.0, timestep=5, seed=42,
)
print("y-sharded STEPS:", np.asarray(ens_sp).shape)

# rank-histogram sanity of the sharded ensemble against the held-out frame
obs_db = db[3 + 5]
rh = ensscores.rankhist_init(ens_sp.shape[0], meta_db["threshold"])
ensscores.rankhist_accum(rh, np.asarray(ens_sp)[:, 5], obs_db)
print("rank histogram:", np.round(ensscores.rankhist_compute(rh), 3))
