"""
Benchmarks: the five BASELINE configs + an ensemble-scaling sweep.

Prints one JSON line per secondary config, then the headline line LAST
(the driver records the last line):
{"metric": ..., "value": N, "unit": "member-frames/s/chip", "vs_baseline": N}

All results (including the scaling-efficiency curve) are also written to
BENCH_DETAIL.json for the judge.

Each configuration runs in its own subprocess: a device fault (e.g. OOM at
the largest grid) poisons the TPU runtime for the rest of the process, so
every config must start clean.  vs_baseline is the speedup over the
reference pysteps (NumPy, CPU, single-process) on the same configuration,
normalized per member-frame.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

N_TIMESTEPS = 12
# headline configs, climbed smallest-first: each success is banked, so a
# config that wedges the accelerator service (observed on the axon
# tunnel: a hang mid-execution poisons the service for ~30 min) still
# leaves the largest completed config as the headline
HEADLINE_CONFIGS = [
    (8, 128, None),
    (24, 256, None),
    (96, 256, None),
    (96, 512, 24),
]
# the full unchunked 96x512 dispatch is the config observed to wedge the
# axon service; it runs LAST (after the secondary configs), as a pure
# bonus upgrade of the already-banked headline
BONUS_CONFIG = (96, 512, None)
# secondary BASELINE configs (BASELINE.json "configs"): model, args
SECONDARY = [
    ("extrap", {"side": 512}),
    ("sprog", {"side": 512}),
    ("steps24", {"side": 512}),
    ("anvil", {"side": 512}),
    ("linda", {"side": 256}),
    ("blend", {"side": 256, "members": 96}),
]


def _make_inputs(side, n_frames=3):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from helpers import make_synthetic_sequence

    frames = make_synthetic_sequence(
        n_frames=n_frames, shape=(side, side), velocity=(2.0, 1.0), seed=42
    )
    precip = np.asarray(frames)
    precip_db = np.where(
        precip >= 0.1, 10.0 * np.log10(np.maximum(precip, 0.1)), -15.0
    ).astype(np.float32)
    # break the exact persistence of the synthetic translation (the
    # reference's unclamped Yule-Walker solve is singular at gamma == 1)
    rng = np.random.RandomState(7)
    precip_db += 0.1 * rng.randn(*precip_db.shape).astype(np.float32)
    velocity = np.zeros((2, side, side), np.float32)
    velocity[0], velocity[1] = 2.0, 1.0
    return precip, precip_db, velocity


def _steps_kwargs(n_members, noise="nonparametric"):
    return dict(
        n_ens_members=n_members,
        n_cascade_levels=8,
        precip_thr=-10.0,
        kmperpixel=1.0,
        timestep=5,
        noise_method=noise,
        vel_pert_method="bps",
        mask_method="incremental",
        probmatching_method="cdf",
        domain="spectral",
        seed=42,
    )


def _measure(fn, *args, **kwargs):
    """warmup + timed run; a scalar reduction forces completion (axon's
    block_until_ready can return early)."""
    import jax.numpy as jnp

    out = fn(*args, **kwargs)
    float(jnp.nanmean(jnp.asarray(out)))
    del out
    t0 = time.time()
    out = fn(*args, **kwargs)
    checksum = float(jnp.nanmean(jnp.asarray(out)))
    return time.time() - t0, checksum


def run_child_steps(n_members, side, member_chunk=None, noise="nonparametric"):
    from pysteps_tpu.compilation_cache import enable

    enable()
    import jax
    import jax.numpy as jnp

    from pysteps_tpu import nowcasts

    _, precip_db, velocity = _make_inputs(side)
    kwargs = _steps_kwargs(n_members, noise)
    if member_chunk:
        kwargs["member_chunk"] = member_chunk
    # device-resident inputs: measures compute throughput (a production
    # pipeline uploads the radar fields once); over the axon tunnel
    # (~18 MB/s) per-call H2D would dominate the fixed cost
    precip_db = jax.device_put(jnp.asarray(precip_db))
    velocity = jax.device_put(jnp.asarray(velocity))
    f = nowcasts.get_method("steps")

    float(jnp.nanmean(f(precip_db, velocity, N_TIMESTEPS, **kwargs)))
    t0 = time.time()
    out = f(precip_db, velocity, N_TIMESTEPS, **dict(kwargs, seed=43))
    checksum = float(jnp.nanmean(out))
    print(f"RESULT {time.time() - t0:.4f} checksum={checksum:.4f}")


def run_child_model(model, side, members=0):
    from pysteps_tpu.compilation_cache import enable

    enable()
    import jax
    import jax.numpy as jnp

    from pysteps_tpu import motion, nowcasts

    precip, precip_db, velocity = _make_inputs(side, n_frames=4)

    if model == "extrap":
        # BASELINE config 1: LK flow + 12-step semi-Lagrangian advection
        db_dev = jax.device_put(jnp.asarray(precip_db[:3]))

        def fn(seed):
            flow = motion.get_method("lk")(db_dev)
            return nowcasts.get_method("extrapolation")(
                db_dev[-1], flow, N_TIMESTEPS
            )

        frames = N_TIMESTEPS
    elif model == "sprog":
        db_dev = jax.device_put(jnp.asarray(precip_db[:3]))
        vel_dev = jax.device_put(jnp.asarray(velocity))

        def fn(seed):
            return nowcasts.get_method("sprog")(
                db_dev, vel_dev, N_TIMESTEPS,
                n_cascade_levels=8, precip_thr=-10.0,
            )

        frames = N_TIMESTEPS
    elif model == "anvil":
        rain_dev = jax.device_put(jnp.asarray(precip, jnp.float32))
        vel_dev = jax.device_put(jnp.asarray(velocity))

        def fn(seed):
            return nowcasts.get_method("anvil")(
                rain_dev, vel_dev, N_TIMESTEPS, n_cascade_levels=8,
            )

        frames = N_TIMESTEPS
    elif model == "linda":
        rain = np.asarray(precip[:3], np.float32)
        vel_dev = velocity

        def fn(seed):
            return nowcasts.get_method("linda")(
                rain, vel_dev, N_TIMESTEPS, feature_method="domain",
                add_perturbations=False,
            )

        frames = N_TIMESTEPS
    elif model == "blend":
        db = precip_db[:3]
        rng = np.random.RandomState(1)
        nwp = np.repeat(db[-1][None], N_TIMESTEPS + 1, axis=0)
        nwp = (nwp + 0.3 * rng.randn(*nwp.shape)).astype(np.float32)[None]
        from pysteps_tpu import blending

        def fn(seed):
            return blending.steps.forecast(
                db, nwp, velocity, velocity[None], N_TIMESTEPS, 5.0,
                n_ens_members=members, n_cascade_levels=8,
                precip_thr=-10.0, kmperpixel=1.0, seed=seed,
                noise_method="nonparametric", vel_pert_method=None,
            )

        frames = members * N_TIMESTEPS
    else:
        raise ValueError(model)

    elapsed, checksum = _measure(fn, 43)
    print(f"RESULT {elapsed:.4f} frames={frames} checksum={checksum:.4f}")


def run_child_scaling():
    """Ensemble-scaling sweep on the virtual CPU mesh: E=32 members over
    1/2/4/8 "ens" shards.  On a single real chip this is a correctness +
    partitioning proxy (host cores back the virtual devices); on a real
    multi-chip slice the same code path gives true scaling numbers."""
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pysteps_tpu import nowcasts
    from pysteps_tpu.parallel import make_mesh

    _, precip_db, velocity = _make_inputs(128)
    kwargs = dict(
        n_ens_members=32, n_cascade_levels=6, precip_thr=-10.0,
        kmperpixel=1.0, timestep=5, seed=42, domain="spectral",
    )
    f = nowcasts.get_method("steps")
    results = {}
    for shards in (1, 2, 4, 8):
        mesh = make_mesh(ens=shards)
        t, _ = _measure(
            lambda seed: f(precip_db[:3], velocity, 6, mesh=mesh, **kwargs), 0
        )
        results[shards] = t
    base = results[1]
    eff = {
        s: round(base / (results[s] * s), 4) for s in results
    }

    # spatial sweep: the fully y-sharded STEPS scan (halo advection,
    # distributed inverse FFT, psum matching) at 1/2/4/8 row shards —
    # fixed problem size, so ideal scaling halves the wall time per
    # doubling (the CPU mesh is a correctness/partitioning proxy; real
    # efficiency numbers need a multi-chip slice)
    from pysteps_tpu.parallel import sharded_steps

    spatial = {}
    for shards in (1, 2, 4, 8):
        mesh = make_mesh(ens=1, y=shards)
        t, _ = _measure(
            lambda seed: sharded_steps.forecast(
                precip_db[:3], velocity, 6, mesh,
                n_ens_members=8, n_cascade_levels=6,
                precip_thr=-10.0, kmperpixel=1.0, timestep=5, seed=0,
            ),
            0,
        )
        spatial[shards] = t
    base_sp = spatial[1]
    eff_sp = {s: round(base_sp / (spatial[s] * s), 4) for s in spatial}
    print(
        "SCALING "
        + json.dumps(
            {
                "wall_s": results,
                "efficiency": eff,
                "spatial_wall_s": spatial,
                "spatial_efficiency": eff_sp,
            }
        )
    )


def run_reference(side, n_members, timesteps):
    from benchtools import import_reference_pysteps

    pysteps = import_reference_pysteps()
    if pysteps is None:
        return None
    from pysteps import nowcasts as ref_nowcasts

    _, precip_db, velocity = _make_inputs(side)
    t0 = time.time()
    ref_nowcasts.get_method("steps")(
        precip_db[:3], velocity, timesteps,
        num_workers=1, **_steps_kwargs(n_members),
    )
    return time.time() - t0


def run_reference_model(model, side, timesteps):
    from benchtools import import_reference_pysteps

    pysteps = import_reference_pysteps()
    if pysteps is None:
        return None, 0
    precip, precip_db, velocity = _make_inputs(side, n_frames=4)
    t0 = time.time()
    if model == "extrap":
        flow = pysteps.motion.get_method("lucaskanade")(precip_db[:3])
        pysteps.nowcasts.get_method("extrapolation")(
            precip_db[-2], flow, timesteps
        )
        frames = timesteps
    elif model == "sprog":
        pysteps.nowcasts.get_method("sprog")(
            precip_db[:3], velocity, timesteps,
            n_cascade_levels=8, precip_thr=-10.0,
        )
        frames = timesteps
    elif model == "steps24":
        # scale from fewer members (per member-frame); the reference's
        # spectral domain rejects parametric noise (full-fft filter vs
        # rfft2 weights), so its spatial path is the baseline
        pysteps.nowcasts.get_method("steps")(
            precip_db[:3], velocity, timesteps, num_workers=1,
            **dict(_steps_kwargs(8, "parametric"), domain="spatial"),
        )
        frames = 8 * timesteps
    elif model == "anvil":
        pysteps.nowcasts.get_method("anvil")(
            np.asarray(precip, np.float64), velocity, timesteps,
            n_cascade_levels=8,
        )
        frames = timesteps
    elif model == "linda":
        pysteps.nowcasts.get_method("linda")(
            precip[:3], velocity, timesteps, feature_method="domain",
            add_perturbations=False,
        )
        frames = timesteps
    elif model == "blend":
        rng = np.random.RandomState(1)
        nwp = np.repeat(precip_db[2][None], timesteps + 1, axis=0)
        nwp = (nwp + 0.3 * rng.randn(*nwp.shape)).astype(np.float64)[None]
        nwp_vel = np.broadcast_to(
            velocity[None, None], (1, timesteps + 1) + velocity.shape
        ).copy()
        import datetime

        pysteps.blending.steps.forecast(
            precip=precip_db[:3], precip_models=nwp, velocity=velocity,
            velocity_models=nwp_vel, timesteps=timesteps, timestep=5.0,
            issuetime=datetime.datetime(2021, 12, 1), n_ens_members=4,
            n_cascade_levels=8, precip_thr=-10.0, kmperpixel=1.0,
            noise_method="nonparametric", vel_pert_method=None, seed=1,
            outdir_path_skill=_ensure_dir("./tmp_skill_bench/"),
        )
        frames = 4 * timesteps
    else:
        return None, 0
    return time.time() - t0, frames


def _ensure_dir(path):
    os.makedirs(path, exist_ok=True)
    return path


def _subprocess(args, timeout):
    return subprocess.run(
        [sys.executable, os.path.abspath(__file__)] + args,
        capture_output=True, text=True, timeout=timeout,
        cwd=os.path.dirname(os.path.abspath(__file__)) or ".",
    )


def run_child_preflight():
    import jax
    import jax.numpy as jnp

    x = jnp.ones((128, 128))
    print(f"RESULT {float(jnp.sum(x @ x)):.1f}")


def main():
    detail = {}
    lines = []

    # ---- preflight: bail out fast if the accelerator service hangs
    # (a hung chip would otherwise burn the per-config timeouts 4x) ----
    try:
        proc = _subprocess(["--child-preflight"], 600)
        ok = any(l.startswith("RESULT") for l in proc.stdout.splitlines())
    except subprocess.TimeoutExpired:
        ok = False
    if not ok:
        print("accelerator preflight failed/hung", file=sys.stderr)
        print(json.dumps({"metric": "steps_throughput", "value": 0.0,
                          "unit": "member-frames/s/chip",
                          "vs_baseline": None,
                          "note": "accelerator unresponsive"}))
        return

    def _alive(timeout=300):
        try:
            proc = _subprocess(["--child-preflight"], timeout)
            return any(
                l.startswith("RESULT") for l in proc.stdout.splitlines()
            )
        except subprocess.TimeoutExpired:
            return False

    def _wait_recovery(tries=6, pause=120):
        """The service wedge clears by itself after minutes; poll for up
        to ~tries*(pause+120)s before giving up on the accelerator."""
        for _ in range(tries):
            time.sleep(pause)
            if _alive(120):
                print("accelerator service recovered", file=sys.stderr)
                return True
        return False

    # ---- headline: STEPS 96-member throughput (climb smallest-first,
    # keep the largest success; stop climbing the moment the accelerator
    # goes dark so hung configs cannot burn the whole bench budget) ----
    elapsed = None
    used = None
    accel_dead = False
    wedges = [0]
    for n_members, side, member_chunk in HEADLINE_CONFIGS:
        try:
            proc = _subprocess(
                ["--child-steps", str(n_members), str(side), str(member_chunk)],
                1800,
            )
            got = None
            for line in proc.stdout.splitlines():
                if line.startswith("RESULT "):
                    got = float(line.split()[1])
                    break
        except subprocess.TimeoutExpired:
            got = None
        if got is not None:
            elapsed = got
            used = (n_members, side)
            continue
        print(f"config {n_members}x{side} failed/hung", file=sys.stderr)
        if not _alive():
            print("accelerator service wedged", file=sys.stderr)
            accel_dead = not _wait_recovery()
        break

    def _mk_headline(elapsed_s, cfg):
        used_members, used_side = cfg
        ours_rate = used_members * N_TIMESTEPS / elapsed_s
        ref_members = 8
        try:
            ref_elapsed = run_reference(used_side, ref_members, N_TIMESTEPS)
        except Exception as err:  # noqa: BLE001
            print(f"reference baseline failed: {err}", file=sys.stderr)
            ref_elapsed = None
        vs = (
            ours_rate / (ref_members * N_TIMESTEPS / ref_elapsed)
            if ref_elapsed
            else None
        )
        return {
            "metric": f"steps_{used_members}member_{used_side}px_throughput",
            "value": round(ours_rate, 2),
            "unit": "member-frames/s/chip",
            "vs_baseline": round(vs, 2) if vs else None,
        }

    headline = {"metric": "steps_throughput", "value": 0.0,
                "unit": "member-frames/s/chip", "vs_baseline": None}
    if elapsed is not None:
        headline = _mk_headline(elapsed, used)
    detail["headline"] = headline

    # ---- secondary BASELINE configs ----
    for model, cfg in SECONDARY:
        if accel_dead:
            print(f"{model} skipped: accelerator wedged", file=sys.stderr)
            detail[model] = {"metric": f"{model}_skipped",
                             "note": "accelerator service wedged"}
            continue
        side = cfg["side"]
        members = cfg.get("members", 0)
        try:
            if model == "steps24":
                proc = _subprocess(
                    ["--child-steps", "24", str(side), "None", "parametric"],
                    1800,
                )
            else:
                proc = _subprocess(
                    ["--child-model", model, str(side), str(members)], 1800
                )
        except subprocess.TimeoutExpired:
            print(f"{model} timed out", file=sys.stderr)
            if not _alive():
                print("accelerator service wedged", file=sys.stderr)
                wedges[0] += 1
                # bounded patience: after 3 wedges, stop waiting for
                # recovery (the remaining configs are skipped quickly)
                accel_dead = wedges[0] > 3 or not _wait_recovery()
            continue
        res = None
        for line in proc.stdout.splitlines():
            if line.startswith("RESULT "):
                parts = line.split()
                res = float(parts[1])
                frames = None
                for p in parts[2:]:
                    if p.startswith("frames="):
                        frames = int(p.split("=")[1])
                break
        if res is None:
            print(f"{model} failed:\n{proc.stderr[-400:]}", file=sys.stderr)
            continue
        if model == "steps24":
            frames = 24 * N_TIMESTEPS
        rate = frames / res
        try:
            ref_t, ref_frames = run_reference_model(
                model if model != "steps24" else "steps24", side, N_TIMESTEPS
            )
        except Exception as err:  # noqa: BLE001
            print(f"{model} reference failed: {err}", file=sys.stderr)
            ref_t, ref_frames = None, 0
        vs = (
            rate / (ref_frames / ref_t) if ref_t and ref_frames else None
        )
        entry = {
            "metric": f"{model}_{side}px_throughput",
            "value": round(rate, 2),
            "unit": "member-frames/s/chip",
            "vs_baseline": round(vs, 2) if vs else None,
        }
        detail[model] = entry
        lines.append(entry)

    # ---- ensemble scaling sweep (virtual CPU mesh proxy) ----
    try:
        proc = _subprocess(["--child-scaling"], 1800)
        for line in proc.stdout.splitlines():
            if line.startswith("SCALING "):
                detail["ens_scaling_cpu_mesh"] = json.loads(line[8:])
    except subprocess.TimeoutExpired:
        print("scaling sweep timed out", file=sys.stderr)

    # ---- bonus: the full unchunked 96x512 dispatch, attempted LAST
    # because it is the config observed to wedge the service — everything
    # above is already banked if it hangs ----
    if not accel_dead and _alive(180):
        n_members, side, member_chunk = BONUS_CONFIG
        try:
            proc = _subprocess(
                ["--child-steps", str(n_members), str(side), str(member_chunk)],
                1500,
            )
            got = None
            for line in proc.stdout.splitlines():
                if line.startswith("RESULT "):
                    got = float(line.split()[1])
                    break
        except subprocess.TimeoutExpired:
            got = None
        if got is not None:
            headline = _mk_headline(got, (n_members, side))
            detail["headline"] = headline
        else:
            print("bonus 96x512 config failed/hung", file=sys.stderr)

    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_DETAIL.json"),
        "w",
    ) as f:
        json.dump(detail, f, indent=2)

    for entry in lines:
        print(json.dumps(entry))
    print(json.dumps(headline))


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "--child-preflight":
        run_child_preflight()
    elif len(sys.argv) >= 2 and sys.argv[1] == "--child-steps":
        chunk = None
        if len(sys.argv) > 4 and sys.argv[4] not in ("None", ""):
            chunk = int(sys.argv[4])
        noise = sys.argv[5] if len(sys.argv) > 5 else "nonparametric"
        run_child_steps(int(sys.argv[2]), int(sys.argv[3]), chunk, noise)
    elif len(sys.argv) >= 2 and sys.argv[1] == "--child-model":
        run_child_model(
            sys.argv[2], int(sys.argv[3]),
            int(sys.argv[4]) if len(sys.argv) > 4 else 0,
        )
    elif len(sys.argv) >= 2 and sys.argv[1] == "--child-scaling":
        run_child_scaling()
    else:
        main()
