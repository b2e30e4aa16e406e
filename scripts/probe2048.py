"""Probe: STEPS at 2048^2 on one chip (XLA-FFT path beyond matfft's
1024 window).  Usage: python scripts/probe2048.py [members] [side] [chunk]"""
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pysteps_tpu.compilation_cache import enable

enable()
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(ROOT, "tests"))
from helpers import make_synthetic_sequence

members = int(sys.argv[1]) if len(sys.argv) > 1 else 8
side = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 0
out_dtype = sys.argv[4] if len(sys.argv) > 4 else "float32"
T = 12

frames = make_synthetic_sequence(
    n_frames=3, shape=(side, side), velocity=(2.0, 1.0), seed=42
)
precip = np.asarray(frames)
precip_db = np.where(
    precip >= 0.1, 10.0 * np.log10(np.maximum(precip, 0.1)), -15.0
).astype(np.float32)
rng = np.random.RandomState(7)
precip_db += 0.1 * rng.randn(*precip_db.shape).astype(np.float32)
velocity = np.zeros((2, side, side), np.float32)
velocity[0], velocity[1] = 2.0, 1.0

from pysteps_tpu import nowcasts

kwargs = dict(
    n_ens_members=members,
    n_cascade_levels=8,
    precip_thr=-10.0,
    kmperpixel=1.0,
    timestep=5,
    noise_method="nonparametric",
    vel_pert_method="bps",
    mask_method="incremental",
    probmatching_method="cdf",
    domain="spectral",
    seed=42,
)
if chunk:
    kwargs["member_chunk"] = chunk
if out_dtype != "float32":
    kwargs["output_dtype"] = out_dtype

precip_db = jax.device_put(jnp.asarray(precip_db))
velocity = jax.device_put(jnp.asarray(velocity))
f = nowcasts.get_method("steps")

t0 = time.time()
out = f(precip_db, velocity, T, **kwargs)
print(f"first call (compile+run): {time.time()-t0:.1f} s", flush=True)
print("checksum", float(jnp.nanmean(out)), flush=True)
del out
t0 = time.time()
out = f(precip_db, velocity, T, **dict(kwargs, seed=43))
cs = float(jnp.nanmean(out))
dt = time.time() - t0
mf = members * T / dt
print(f"warm: {dt:.2f} s  = {mf:.1f} member-frames/s  checksum={cs:.4f}",
      flush=True)
