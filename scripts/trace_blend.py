"""Capture an XLA profiler trace of one blend-config forecast and print
the top device ops (same aggregation as trace_bench.py).

Usage: python scripts/trace_blend.py [side] [members] [top-N]
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pysteps_tpu.compilation_cache import enable

enable()

import numpy as np
import jax.numpy as jnp

import bench
from pysteps_tpu import blending
from pysteps_tpu.utils import profiling

side = int(sys.argv[1]) if len(sys.argv) > 1 else 256
members = int(sys.argv[2]) if len(sys.argv) > 2 else 96
top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 40

_, precip_db, velocity = bench._make_inputs(side, n_frames=4)
db = precip_db[:3]
rng = np.random.RandomState(1)
nwp = np.repeat(db[-1][None], bench.N_TIMESTEPS + 1, axis=0)
nwp = (nwp + 0.3 * rng.randn(*nwp.shape)).astype(np.float32)[None]


def fn(seed):
    return blending.steps.forecast(
        db, nwp, velocity, velocity[None], bench.N_TIMESTEPS, 5.0,
        n_ens_members=members, n_cascade_levels=8,
        precip_thr=-10.0, kmperpixel=1.0, seed=seed,
        noise_method="nonparametric", vel_pert_method=None,
    )


out = fn(43)
print("warmup checksum", float(jnp.nanmean(out)), flush=True)
del out

import time

t0 = time.time()
out = fn(44)
print("warm wall:", round(time.time() - t0, 3), "s",
      float(jnp.nanmean(out)), flush=True)
del out

logdir = "/tmp/pysteps_tpu_trace_blend"
os.system(f"rm -rf {logdir}")
with profiling.trace(logdir):
    out = fn(45)
    float(jnp.nanmean(out))

sys.argv = ["trace_agg.py", logdir, str(top_n)]
import trace_agg  # noqa: F401  (aggregates + prints on import)
