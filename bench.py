"""
Benchmark: STEPS ensemble nowcast throughput (member-frames/s/chip).

Runs a 96-member, 12-lead-time STEPS nowcast on a synthetic radar sequence
on the available accelerator and prints ONE json line:
{"metric": ..., "value": N, "unit": "member-frames/s/chip", "vs_baseline": N}

Each candidate configuration runs in its own subprocess: a device fault
(e.g. OOM at the largest grid) poisons the TPU runtime for the rest of the
process, so fallback configs must start clean.

vs_baseline is the speedup over the reference pysteps (NumPy, CPU,
single-process) running the same configuration per member-frame.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

N_TIMESTEPS = 12
# (n_members, grid side, member_chunk): chunking bounds peak HBM at the
# largest grid
CONFIGS = [
    (96, 512, None),
    (96, 512, 24),
    (96, 256, None),
    (24, 256, None),
]


def _make_inputs(side):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from helpers import make_synthetic_sequence

    frames = make_synthetic_sequence(
        n_frames=3, shape=(side, side), velocity=(2.0, 1.0), seed=42
    )
    precip = np.asarray(frames[:3])
    precip_db = np.where(
        precip >= 0.1, 10.0 * np.log10(np.maximum(precip, 0.1)), -15.0
    ).astype(np.float32)
    # break the exact persistence of the synthetic translation (the
    # reference's unclamped Yule-Walker solve is singular at gamma == 1)
    rng = np.random.RandomState(7)
    precip_db += 0.1 * rng.randn(*precip_db.shape).astype(np.float32)
    velocity = np.zeros((2, side, side), np.float32)
    velocity[0], velocity[1] = 2.0, 1.0
    return precip_db, velocity


def _steps_kwargs(n_members):
    return dict(
        n_ens_members=n_members,
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


def run_child(n_members, side, member_chunk=None):
    """Run one config on the accelerator; print 'RESULT <elapsed>'."""
    from pysteps_tpu.compilation_cache import enable

    enable()
    from pysteps_tpu import nowcasts

    precip_db, velocity = _make_inputs(side)
    f = nowcasts.get_method("steps")
    kwargs = _steps_kwargs(n_members)
    if member_chunk:
        kwargs["member_chunk"] = member_chunk
    import jax
    import jax.numpy as jnp

    # device-resident inputs: this measures compute throughput (in a
    # production pipeline the radar fields are uploaded once and feed the
    # whole ensemble); over the axon tunnel (~18 MB/s) a per-call H2D of
    # the 5 MB inputs would otherwise dominate the per-forecast fixed cost
    precip_db = jax.device_put(jnp.asarray(precip_db))
    velocity = jax.device_put(jnp.asarray(velocity))

    out = f(precip_db, velocity, N_TIMESTEPS, **kwargs)  # warmup/compile
    float(jnp.nanmean(out))
    del out
    # measure compute throughput: the forecast stays on device (as it
    # would feed device-side post-processing / verification) and a scalar
    # reduction forces execution to complete (block_until_ready can return
    # early on remote-attached backends); a different seed forces a
    # distinct execution
    t0 = time.time()
    out = f(precip_db, velocity, N_TIMESTEPS, **dict(kwargs, seed=43))
    checksum = float(jnp.nanmean(out))
    print(f"RESULT {time.time() - t0:.4f} checksum={checksum:.4f}")


def run_reference(side, n_members, timesteps):
    from benchtools import import_reference_pysteps

    pysteps = import_reference_pysteps()
    if pysteps is None:
        return None
    from pysteps import nowcasts as ref_nowcasts

    precip_db, velocity = _make_inputs(side)
    t0 = time.time()
    ref_nowcasts.get_method("steps")(
        precip_db, velocity, timesteps,
        num_workers=1, **_steps_kwargs(n_members),
    )
    return time.time() - t0


def main():
    elapsed = None
    used = None
    for n_members, side, member_chunk in CONFIGS:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             str(n_members), str(side), str(member_chunk)],
            capture_output=True, text=True, timeout=3000,
            cwd=os.path.dirname(os.path.abspath(__file__)) or ".",
        )
        for line in proc.stdout.splitlines():
            if line.startswith("RESULT "):
                elapsed = float(line.split()[1])
                used = (n_members, side)
                break
        if elapsed is not None:
            break
        print(
            f"config {n_members}x{side} failed:\n{proc.stderr[-500:]}",
            file=sys.stderr,
        )
    if elapsed is None:
        print(json.dumps({"metric": "steps_throughput", "value": 0.0,
                          "unit": "member-frames/s/chip", "vs_baseline": None}))
        return

    used_members, used_side = used
    ours_rate = used_members * N_TIMESTEPS / elapsed

    ref_members = 8
    try:
        ref_elapsed = run_reference(used_side, ref_members, N_TIMESTEPS)
    except Exception as err:  # noqa: BLE001
        print(f"reference baseline failed: {err}", file=sys.stderr)
        ref_elapsed = None
    if ref_elapsed:
        vs_baseline = ours_rate / (ref_members * N_TIMESTEPS / ref_elapsed)
    else:
        vs_baseline = None

    print(
        json.dumps(
            {
                "metric": f"steps_{used_members}member_{used_side}px_throughput",
                "value": round(ours_rate, 2),
                "unit": "member-frames/s/chip",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--child":
        chunk = None
        if len(sys.argv) > 4 and sys.argv[4] not in ("None", ""):
            chunk = int(sys.argv[4])
        run_child(int(sys.argv[2]), int(sys.argv[3]), chunk)
    else:
        main()
