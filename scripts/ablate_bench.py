"""Ablation profiler: time the bench STEPS config with one feature
removed per run (subprocess-isolated, like bench.py).  The per-feature
delta against the full config is the reliable cost attribution on the
axon TPU (isolated op timings mislead; see CLAUDE.md).

Usage: python scripts/ablate_bench.py [ablation ...]
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

ABLATIONS = {
    "full": {},
    "no_probmatch": {"probmatching_method": None},
    "no_mask": {"mask_method": None},
    "no_noise": {"noise_method": None, "noise_stddev_adj": None},
    "no_velpert": {"vel_pert_method": None},
    "spatial_domain": {"domain": "spatial"},
    "floor": {"noise_method": None, "noise_stddev_adj": None,
              "probmatching_method": None, "mask_method": None,
              "vel_pert_method": None},
    "floor_probmatch": {"noise_method": None, "noise_stddev_adj": None,
                        "mask_method": None, "vel_pert_method": None},
    "floor_mask": {"noise_method": None, "noise_stddev_adj": None,
                   "probmatching_method": None, "vel_pert_method": None},
}


def run_child(name):
    sys.path.insert(0, ROOT)
    from pysteps_tpu.compilation_cache import enable

    enable()
    import importlib

    bench = importlib.import_module("bench")
    from pysteps_tpu import nowcasts

    E = int(os.environ.get("ABL_E", "96"))
    T = int(os.environ.get("ABL_T", "0"))
    if T:
        bench.N_TIMESTEPS = T
    precip_db, velocity = bench._make_inputs(512)
    kwargs = bench._steps_kwargs(E)
    kwargs.update(ABLATIONS[name])
    import jax
    import jax.numpy as jnp

    # match bench.py: device-resident inputs (compute throughput)
    precip_db = jax.device_put(jnp.asarray(precip_db))
    velocity = jax.device_put(jnp.asarray(velocity))

    f = nowcasts.get_method("steps")
    out = f(precip_db, velocity, bench.N_TIMESTEPS, **kwargs)
    float(jnp.nanmean(out))
    del out
    t0 = time.time()
    out = f(precip_db, velocity, bench.N_TIMESTEPS, **dict(kwargs, seed=43))
    float(jnp.nanmean(out))
    print(f"RESULT {time.time() - t0:.4f}")


def main():
    names = sys.argv[1:] or list(ABLATIONS)
    results = {}
    for name in names:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", name],
            capture_output=True, text=True, timeout=3000, cwd=ROOT,
        )
        elapsed = None
        for line in proc.stdout.splitlines():
            if line.startswith("RESULT "):
                elapsed = float(line.split()[1])
        if elapsed is None:
            print(f"{name}: FAILED\n{proc.stderr[-400:]}", file=sys.stderr)
        results[name] = elapsed
        print(f"{name}: {elapsed}", flush=True)
    full = results.get("full")
    if full:
        for name, v in results.items():
            if v and name != "full":
                print(f"{name}: saves {full - v:+.3f}s ({(full - v) / full:+.1%})")
    print(json.dumps(results))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        run_child(sys.argv[2])
    else:
        main()
