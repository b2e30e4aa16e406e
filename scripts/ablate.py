"""Ablation profiler for the STEPS hot loop (dev tool).

Runs the bench config with one feature dropped per run, each in a fresh
subprocess (a device fault poisons the process runtime), and prints the
per-config wall time.  The delta vs 'full' attributes cost to a feature;
isolated op timings mislead under XLA fusion (see CLAUDE.md).

Usage: python scripts/ablate.py [config ...]
"""

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ABLATIONS = {
    "full": {},
    "no_velpert": {"vel_pert_method": None},
    "no_mask": {"mask_method": None},
    "no_pm": {"probmatching_method": None},
    "no_noise": {"noise_method": None},
    "spatial": {"domain": "spatial"},
    "leads24": {"__timesteps": 24},
    "members192": {"__members": 192},
}


def run_child(name):
    sys.path.insert(0, os.path.join(ROOT, "tests"))
    sys.path.insert(0, ROOT)
    from pysteps_tpu.compilation_cache import enable

    enable()
    import importlib

    bench = importlib.import_module("bench")
    import jax.numpy as jnp

    from pysteps_tpu import nowcasts

    over = dict(ABLATIONS[name])
    n_members = over.pop("__members", 96)
    n_steps = over.pop("__timesteps", 12)
    precip_db, velocity = bench._make_inputs(512)
    kwargs = bench._steps_kwargs(n_members)
    kwargs.update(over)
    f = nowcasts.get_method("steps")
    out = f(precip_db, velocity, n_steps, **kwargs)
    float(jnp.nanmean(out))
    del out
    t0 = time.time()
    out = f(precip_db, velocity, n_steps, **dict(kwargs, seed=43))
    float(jnp.nanmean(out))
    dt = time.time() - t0
    print(f"RESULT {dt:.4f} mf/s={n_members * n_steps / dt:.1f}")


def main():
    names = sys.argv[1:] or list(ABLATIONS)
    for name in names:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", name],
            capture_output=True, text=True, timeout=3000, cwd=ROOT,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT")]
        if line:
            print(f"{name:12s} {line[0][7:]}")
        else:
            print(f"{name:12s} FAILED\n{proc.stderr[-300:]}")


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        run_child(sys.argv[2])
    else:
        main()
