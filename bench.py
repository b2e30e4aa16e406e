"""
Benchmark: STEPS ensemble nowcast throughput (member-frames/s/chip).

Runs a 96-member, 12-lead-time STEPS nowcast on a 512x512 synthetic radar
sequence on the available accelerator and prints ONE json line:
{"metric": ..., "value": N, "unit": "member-frames/s/chip", "vs_baseline": N}

vs_baseline is the speedup over the reference pysteps (NumPy, CPU,
single-process) running the same configuration, measured per member-frame.
"""

import json
import sys
import time

import numpy as np

from pysteps_tpu.compilation_cache import enable as _enable_cache

_enable_cache()


def make_sequence(n_frames=3, shape=(512, 512), velocity=(2.0, 1.0), seed=42):
    sys.path.insert(0, "tests")
    from helpers import make_synthetic_sequence

    return make_synthetic_sequence(
        n_frames=n_frames, shape=shape, velocity=velocity, seed=seed
    )


N_MEMBERS = 96
N_TIMESTEPS = 12
SHAPE = (512, 512)


def run_ours(precip_db, velocity, n_members=N_MEMBERS, timesteps=N_TIMESTEPS):
    from pysteps_tpu import nowcasts

    kwargs = dict(
        n_ens_members=n_members,
        n_cascade_levels=8,
        precip_thr=-10.0,
        kmperpixel=1.0,
        timestep=5,
        noise_method="nonparametric",
        vel_pert_method="bps",
        mask_method="incremental",
        probmatching_method="cdf",
        seed=42,
    )
    f = nowcasts.get_method("steps")
    # warmup (compile)
    out = f(precip_db, velocity, timesteps, **kwargs)
    np.asarray(out)
    t0 = time.time()
    out = f(precip_db, velocity, timesteps, **kwargs)
    np.asarray(out)
    elapsed = time.time() - t0
    return elapsed


def run_reference(precip_db, velocity, n_members, timesteps):
    from benchtools import import_reference_pysteps

    pysteps = import_reference_pysteps()
    if pysteps is None:
        return None
    from pysteps import nowcasts as ref_nowcasts

    t0 = time.time()
    out = ref_nowcasts.get_method("steps")(
        precip_db,
        velocity,
        timesteps,
        n_ens_members=n_members,
        n_cascade_levels=8,
        precip_thr=-10.0,
        kmperpixel=1.0,
        timestep=5,
        noise_method="nonparametric",
        vel_pert_method="bps",
        mask_method="incremental",
        probmatching_method="cdf",
        seed=42,
        num_workers=1,
    )
    del out
    return time.time() - t0


def main():
    # try the target config first; back off if the device faults
    configs = [
        (N_MEMBERS, SHAPE),
        (48, SHAPE),
        (96, (256, 256)),
        (24, (256, 256)),
    ]
    elapsed = None
    for n_members, shape in configs:
        try:
            frames = make_sequence(shape=shape)
            precip = np.asarray(frames[:3])
            precip_db = np.where(
                precip >= 0.1, 10.0 * np.log10(np.maximum(precip, 0.1)), -15.0
            ).astype(np.float32)
            velocity = np.zeros((2,) + shape, np.float32)
            velocity[0], velocity[1] = 2.0, 1.0
            elapsed = run_ours(precip_db, velocity, n_members=n_members)
            used_members, used_shape = n_members, shape
            break
        except Exception as err:  # noqa: BLE001 — device faults: back off
            print(f"config {n_members}x{shape} failed: {err}", file=sys.stderr)
    if elapsed is None:
        print(json.dumps({"metric": "steps_throughput", "value": 0.0,
                          "unit": "member-frames/s/chip", "vs_baseline": None}))
        return
    member_frames = used_members * N_TIMESTEPS
    ours_rate = member_frames / elapsed

    # reference baseline: fewer members (CPU is slow), same per-member work
    ref_members = 8
    try:
        ref_elapsed = run_reference(precip_db, velocity, ref_members, N_TIMESTEPS)
    except Exception as err:  # noqa: BLE001
        print(f"reference baseline failed: {err}", file=sys.stderr)
        ref_elapsed = None
    if ref_elapsed is not None and ref_elapsed > 0:
        ref_rate = ref_members * N_TIMESTEPS / ref_elapsed
        vs_baseline = ours_rate / ref_rate
    else:
        vs_baseline = float("nan")

    print(
        json.dumps(
            {
                "metric": (
                    f"steps_{used_members}member_{used_shape[0]}px_throughput"
                ),
                "value": round(ours_rate, 2),
                "unit": "member-frames/s/chip",
                "vs_baseline": round(vs_baseline, 2)
                if np.isfinite(vs_baseline)
                else None,
            }
        )
    )


if __name__ == "__main__":
    main()
