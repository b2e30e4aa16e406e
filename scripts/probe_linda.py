"""Phase-split a LINDA forecast call on the real TPU: feature detection /
fused init / scan, via measure_time plus host timers.

Usage: python scripts/probe_linda.py [side]
"""
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pysteps_tpu.compilation_cache import enable

enable()

import jax
import jax.numpy as jnp  # noqa: F401

import bench
from pysteps_tpu import nowcasts

side = int(sys.argv[1]) if len(sys.argv) > 1 else 256

precip, precip_db, velocity = bench._make_inputs(side, n_frames=4)
rain = precip[:3].astype("float32")

f = nowcasts.get_method("linda")


def run(seed):
    return f(
        rain, velocity, bench.N_TIMESTEPS, feature_method="domain",
        add_perturbations=False, measure_time=True,
    )


out, init_t, loop_t = run(0)
jax.block_until_ready(out)
for i in range(3):
    t0 = time.time()
    out, init_t, loop_t = run(i)
    float(jnp.nanmean(out))
    print(
        f"wall {time.time()-t0:.3f} s  init {init_t:.3f}  loop {loop_t:.3f}",
        flush=True,
    )
