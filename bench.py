"""
Benchmarks: the BASELINE configs, motion solvers, and scaling sweeps.

Evidence-loss-proof by design (round 2 lost everything to a driver
timeout):
  - every banked result prints its JSON line IMMEDIATELY, followed by a
    re-print of the current headline line (the driver records the LAST
    line, so the headline is always last no matter when we die);
  - BENCH_DETAIL.json is rewritten after every banked entry;
  - reference CPU baselines come from the committed REF_BASELINE.json
    (measured once by scripts/measure_ref_baseline.py) — never re-run
    inside the TPU budget;
  - a signal.alarm wall-clock cap (BENCH_BUDGET_S, default 4200 s)
    flushes everything and exits 0 before any plausible driver timeout.

Output contract: one JSON line per banked entry, headline LAST:
{"metric": ..., "value": N, "unit": "member-frames/s/chip", "vs_baseline": N}

Each configuration runs in its own subprocess: a device fault (e.g. OOM
at the largest grid) poisons the TPU runtime for the rest of the
process, so every config must start clean.  vs_baseline is the speedup
over the reference pysteps (NumPy, CPU, single-process) on the same
configuration, normalized per member-frame.
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
REF_PATH = os.path.join(ROOT, "REF_BASELINE.json")
DETAIL_PATH = os.path.join(ROOT, "BENCH_DETAIL.json")
BUDGET_S = int(os.environ.get("BENCH_BUDGET_S", "4200"))
T_START = time.time()

N_TIMESTEPS = 12
# headline configs, climbed smallest-first: each success is banked (and
# printed) immediately, so a config that wedges the accelerator service
# (observed on the axon tunnel: a hang mid-execution poisons the service
# for ~30 min) still leaves the largest completed config as the headline
HEADLINE_CONFIGS = [
    (8, 128, None),
    (24, 256, None),
    (96, 256, None),
    (96, 512, 24),
]
# large-grid configs toward the BASELINE.json 1-km CONUS north star;
# banked as their own entries (the 512 headline stays comparable across
# rounds), attempted after the headline climb
LARGE_CONFIGS = [
    # bf16 output (the large-grid operating point, same policy as 2048)
    # lets the in-scan member chunk widen 16 -> 32: r5 measured 2.65 s
    # (f32, mc=16) -> 2.12 s (bf16, mc=32); mc=48 RESOURCE_EXHAUSTED
    (96, 1024, 32),
    # CONUS-scale: 1-km ~2048^2 (BASELINE.json north star).  bf16 output
    # stack (f32 would be 19.3 GB > 15.75 GB HBM) + outer member chunks
    # of 4 (chunks of 6 and 8 measured RESOURCE_EXHAUSTED next to the
    # 9.7 GB output buffer)
    (96, 2048, 4),
]
# the full unchunked 96x512 dispatch is the config observed to wedge the
# axon service; it runs LAST, as a pure bonus upgrade of the already-
# banked-and-printed headline
BONUS_CONFIG = (96, 512, None)
# secondary BASELINE configs: model, args, REF_BASELINE key
SECONDARY = [
    ("extrap", {"side": 512}, "extrap_512"),
    ("sprog", {"side": 512}, "sprog_512"),
    ("steps24", {"side": 512}, "steps24ref_8m_512_spatial_parametric"),
    ("anvil", {"side": 512}, "anvil_512"),
    ("linda", {"side": 256}, "linda_256"),
    ("linda", {"side": 512}, "linda_512"),
    ("blend", {"side": 256, "members": 96}, "blend_256"),
    ("blend", {"side": 512, "members": 96}, "blend_512"),
    # CONUS-scale blending (BASELINE config #5): outer member chunks +
    # bf16 output mirror the STEPS large-grid policy
    ("blend", {"side": 1024, "members": 96}, "blend_1024"),
    ("blend", {"side": 2048, "members": 96}, "blend_2048"),
    ("sseps", {"side": 256, "members": 24}, "sseps_256"),
    ("sseps", {"side": 512, "members": 24}, "sseps_512"),
    ("lagprob", {"side": 512}, "lagprob_512"),
    ("pca_enkf", {"side": 256, "members": 24}, "pca_enkf_256"),
    ("rainfarm", {"side": 512}, "rainfarm_512"),
]
# per-model unit override for the banked rows (default member-frames/s)
UNIT_OVERRIDE = {"rainfarm": "fields/s"}
# motion solvers: ours on TPU vs the reference's OpenCV/Cython paths.
# vet/proesmans reference extensions cannot be built here (no Cython);
# REF_BASELINE records that, so their vs_baseline is null with a note.
MOTION = [
    ("lk", "motion_lucaskanade_512"),
    ("vet", "motion_vet_512"),
    ("proesmans", "motion_proesmans_512"),
    ("darts", "motion_darts_512"),
    ("farneback", "motion_farneback_512"),
]


# ---------------------------------------------------------------- inputs
def _make_inputs(side, n_frames=3):
    sys.path.insert(0, os.path.join(ROOT, "tests"))
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

    def _checksum(out):
        # host-numpy outputs (class-based wrappers): don't bill an H2D
        # upload of the full stack to the timed run
        if isinstance(out, np.ndarray):
            return float(np.nanmean(out))
        return float(jnp.nanmean(jnp.asarray(out)))

    out = fn(*args, **kwargs)
    _checksum(out)
    del out
    t0 = time.time()
    out = fn(*args, **kwargs)
    checksum = _checksum(out)
    return time.time() - t0, checksum


# ------------------------------------------------------------- children
def run_child_preflight():
    import jax  # noqa: F401
    import jax.numpy as jnp

    x = jnp.ones((128, 128))
    print(f"RESULT {float(jnp.sum(x @ x)):.1f}")


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
    if side >= 1024:
        # large-grid operating point: bf16 output stack (at 2048 a f32
        # stack would not even fit; at 1024 the freed headroom buys a
        # 2x-wider in-scan member chunk, +27% measured)
        kwargs["output_dtype"] = "bfloat16"
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

        extra = {}
        if side >= 1024:
            # large-grid operating point: the spatial cascade carry
            # (extrap+noise x AR(2) x 8 levels) is ~13 GB at 96x1024^2 —
            # outer member chunks + bf16 output, as for STEPS
            extra = dict(
                output_dtype="bfloat16",
                member_chunk=12 if side == 1024 else 2,
            )

        def fn(seed):
            return blending.steps.forecast(
                db, nwp, velocity, velocity[None], N_TIMESTEPS, 5.0,
                n_ens_members=members, n_cascade_levels=8,
                precip_thr=-10.0, kmperpixel=1.0, seed=seed,
                noise_method="nonparametric", vel_pert_method=None,
                **extra,
            )

        frames = members * N_TIMESTEPS
    elif model == "sseps":
        from pysteps_tpu import nowcasts as _nc

        meta = {
            "accutime": 5, "unit": "dBZ", "transform": "dB",
            "zerovalue": -15.0, "threshold": -10.0,
            "xpixelsize": 1000.0, "ypixelsize": 1000.0,
        }
        db = precip_db[:3]

        def fn(seed):
            return _nc.get_method("sseps")(
                db, dict(meta), velocity, N_TIMESTEPS,
                n_ens_members=members, n_cascade_levels=6,
                win_size=side // 2, vel_pert_method=None, seed=seed,
            )

        frames = members * N_TIMESTEPS
    elif model == "lagprob":
        rain_dev = jax.device_put(jnp.asarray(precip[2], jnp.float32))
        vel_dev = jax.device_put(jnp.asarray(velocity))

        def fn(seed):
            return nowcasts.get_method("lagrangian_probability")(
                rain_dev, vel_dev, N_TIMESTEPS, threshold=1.0, slope=2
            )

        frames = N_TIMESTEPS
    elif model == "pca_enkf":
        import datetime

        from pysteps_tpu.blending import pca_ens_kalman_filter

        db = precip_db
        t0 = datetime.datetime(2021, 6, 29, 12, 0)
        obs_ts = np.array([t0 - datetime.timedelta(minutes=5), t0])
        nwp_ts = np.array([
            t0 + datetime.timedelta(minutes=5 * i)
            for i in range(N_TIMESTEPS + 1)
        ])
        rng = np.random.RandomState(1)
        # device-resident NWP stack (same policy as the steps rows: a
        # production pipeline uploads the model fields once; the ~82 MB
        # per-call H2D over the axon tunnel is not model compute)
        nwp = jax.device_put(jnp.asarray(np.stack([
            np.repeat(db[2][None], N_TIMESTEPS + 1, axis=0)
            + 0.5 * rng.randn(N_TIMESTEPS + 1, side, side)
            for _ in range(members)
        ]).astype(np.float32)))

        def fn(seed):
            return pca_ens_kalman_filter.forecast(
                obs_precip=db[:2], obs_timestamps=obs_ts,
                nwp_precip=nwp, nwp_timestamps=nwp_ts,
                velocity=velocity, forecast_horizon=5 * N_TIMESTEPS,
                issuetime=t0, n_ens_members=members,
                n_cascade_levels=6, precip_thr=-10.0, norain_thr=0.01,
                noise_method="nonparametric", seed=seed,
            )

        frames = members * N_TIMESTEPS
    elif model == "rainfarm":
        from pysteps_tpu.downscaling import rainfarm

        # ensemble downscaling: 24 realizations of 128^2 -> x4 -> 512^2
        # in one vmapped device program (the reference loops 24 single
        # downscales; a single realization is dispatch-latency-bound)
        coarse = np.asarray(precip[2][::4, ::4], np.float64)

        def fn(seed):
            return rainfarm.downscale_ensemble(coarse, 4, 24, seed=seed)

        frames = 24
    else:
        raise ValueError(model)

    elapsed, checksum = _measure(fn, 43)
    print(f"RESULT {elapsed:.4f} frames={frames} checksum={checksum:.4f}")


def run_child_motion(method, side):
    """One dense-flow retrieval on TPU (warm executable, device inputs)."""
    from pysteps_tpu.compilation_cache import enable

    enable()
    import jax
    import jax.numpy as jnp

    from pysteps_tpu import motion

    n_frames = {"darts": 9, "proesmans": 2}.get(method, 3)
    _, precip_db, _ = _make_inputs(side, n_frames=n_frames)
    db = jax.device_put(jnp.asarray(precip_db))
    fn = motion.get_method(method)
    elapsed, checksum = _measure(fn, db)
    print(f"RESULT {elapsed:.4f} frames=1 checksum={checksum:.4f}")


def run_child_scaling():
    """WEAK-scaling sweeps on the virtual CPU mesh (fixed per-device work).

    The r3 strong-scaling proxy was uninterpretable (VERDICT r3 Weak #3):
    fixed TOTAL work spread over 8 virtual devices backed by 2 host cores
    measures the Amdahl floor of fixed per-call cost, not partition
    overhead.  Here per-device work is FIXED (members/device for the ens
    axis, rows/device for the y axis) while host compute capacity stays
    constant, so ideal wall time grows LINEARLY with shard count and

        efficiency(N) = N * t(1) / t(N)

    isolates partition overhead (collectives, halo recompute, padding
    waste) — the quantity that transfers to a real multi-chip slice.  The
    ICI cost model in docs/PERFORMANCE.md converts the per-step collective
    byte counts to v5e link time to extrapolate real-chip efficiency."""
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from pysteps_tpu import nowcasts
    from pysteps_tpu.parallel import make_mesh, sharded_steps

    def _best_of(fn, repeats):
        """warmup + best-of-N timed runs: the 2-core host oversubscribed
        with up to 8 virtual devices schedules noisily; min is the
        contention-free estimate."""
        import jax.numpy as jnp

        float(jnp.nanmean(jnp.asarray(fn())))
        best = None
        for _ in range(repeats):
            t0 = time.time()
            float(jnp.nanmean(jnp.asarray(fn())))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return best

    # one virtual device executes on ~one host core, so compute capacity
    # GROWS with shard count until the physical cores are covered —
    # ideal weak-scaling wall is N*t1/min(N, C), not N*t1 (measured:
    # 2-shard walls ~= 1-shard walls on this 2-core host)
    n_cores = os.cpu_count() or 2

    def _eff(wall):
        t1 = wall[1]
        return {
            s: round(s * t1 / (min(s, n_cores) * t), 4)
            for s, t in wall.items()
        }

    # --- ens axis: 12 members/device at 256^2 (the scan is pure data
    # parallelism over members; overhead = partitioned-program fixed cost)
    _, precip_db, velocity = _make_inputs(256)
    f = nowcasts.get_method("steps")
    ens_wall, ens_eff = {}, {}
    for shards in (1, 2, 4, 8):
        mesh = make_mesh(ens=shards)
        t = _best_of(
            lambda: f(
                precip_db[:3], velocity, 12, mesh=mesh,
                n_ens_members=12 * shards, n_cascade_levels=6,
                precip_thr=-10.0, kmperpixel=1.0, timestep=5, seed=42,
                domain="spectral",
            ),
            3,
        )
        ens_wall[shards] = round(t, 3)
    ens_eff = _eff(ens_wall)

    # --- y axis: 128 rows/device x 512 cols, E=8 (halo advection,
    # distributed FFT transposes, psum CDF matching all scale with rows)
    y_wall, y_eff = {}, {}
    for shards in (1, 2, 4, 8):
        rows = 128 * shards
        rng = np.random.RandomState(7)
        frames = np.stack([
            np.roll(np.roll(_weak_base_field(rows, 512), 2 * k, 0), k, 1)
            for k in range(3)
        ])
        pdb = np.where(
            frames >= 0.1, 10.0 * np.log10(np.maximum(frames, 0.1)), -15.0
        ).astype(np.float32) + 0.1 * rng.randn(3, rows, 512).astype(np.float32)
        vel = np.zeros((2, rows, 512), np.float32)
        vel[0], vel[1] = 2.0, 1.0
        mesh = make_mesh(ens=1, y=shards)
        t = _best_of(
            lambda: sharded_steps.forecast(
                pdb, vel, 6, mesh,
                n_ens_members=8, n_cascade_levels=6,
                precip_thr=-10.0, kmperpixel=1.0, timestep=5, seed=0,
            ),
            2,
        )
        y_wall[shards] = round(t, 3)
    y_eff = _eff(y_wall)

    print(
        "SCALING "
        + json.dumps(
            {
                "mode": "weak (fixed per-device work; one virtual device "
                        "executes on ~1 host core, so ideal wall = "
                        f"N*t1/min(N, {n_cores} cores); efficiency = "
                        "ideal/measured isolates partition overhead)",
                "ens_per_device": "12 members x 256^2 x 12 steps",
                "ens_wall_s": ens_wall,
                "ens_efficiency": ens_eff,
                "y_per_device": "128 rows x 512 cols x 8 members x 6 steps",
                "y_wall_s": y_wall,
                "y_efficiency": y_eff,
            }
        )
    )


def _weak_base_field(rows, cols):
    """Synthetic rain field at (rows, cols) for the weak-scaling sweep —
    same construction as tests/helpers.make_synthetic_sequence's base
    frame, inlined for rectangular shapes."""
    y = np.linspace(0, 4 * np.pi, rows)[:, None]
    x = np.linspace(0, 4 * np.pi, cols)[None, :]
    field = (
        10.0 * np.maximum(0.0, np.sin(y) * np.cos(0.7 * x))
        + 5.0 * np.maximum(0.0, np.cos(1.3 * y + 1.0) * np.sin(0.9 * x + 2.0))
    )
    rng = np.random.RandomState(13)
    field = field * (0.7 + 0.6 * rng.rand(rows, cols))
    return np.where(field > 1.0, field, 0.0).astype(np.float32)


# ------------------------------------------------------- main machinery
def _subprocess(args, timeout):
    return subprocess.run(
        [sys.executable, os.path.abspath(__file__)] + args,
        capture_output=True, text=True, timeout=timeout,
        cwd=ROOT or ".",
    )


def _child_result(proc):
    """Parse 'RESULT <elapsed> [frames=N] ...' from child stdout."""
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            parts = line.split()
            elapsed = float(parts[1])
            frames = None
            for p in parts[2:]:
                if p.startswith("frames="):
                    frames = int(p.split("=")[1])
            return elapsed, frames
    return None, None


_REF_STORE = None


def _ref_rate(key):
    """member-frames/s of the committed reference CPU baseline, or None."""
    global _REF_STORE
    if _REF_STORE is None:
        try:
            with open(REF_PATH) as f:
                _REF_STORE = json.load(f)
        except Exception:  # noqa: BLE001
            _REF_STORE = {}
    e = _REF_STORE.get(key)
    if not e or "elapsed_s" not in e:
        return None
    return e["frames"] / e["elapsed_s"]


class Bank:
    """Streams every banked result to stdout + BENCH_DETAIL.json the
    moment it exists, keeping the headline as the LAST printed line."""

    def __init__(self):
        self.detail = {}
        self.headline = {
            "metric": "steps_throughput", "value": 0.0,
            "unit": "member-frames/s/chip", "vs_baseline": None,
        }
        self.detail["headline"] = self.headline
        self._flush_detail()

    def _flush_detail(self):
        tmp = DETAIL_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.detail, f, indent=2)
        os.replace(tmp, DETAIL_PATH)

    def set_headline(self, entry):
        self.headline = entry
        self.detail["headline"] = entry
        self._flush_detail()
        print(json.dumps(entry), flush=True)

    def add(self, name, entry, print_line=True):
        self.detail[name] = entry
        self._flush_detail()
        if print_line and "value" in entry:
            print(json.dumps(entry), flush=True)
            # keep the headline as the last line for the driver
            print(json.dumps(self.headline), flush=True)

    def final_print(self):
        self._flush_detail()
        print(json.dumps(self.headline), flush=True)


def _remaining():
    return BUDGET_S - (time.time() - T_START)


def main():
    bank = Bank()

    def _on_alarm(signum, frame):
        print(f"bench budget ({BUDGET_S}s) exhausted; flushing",
              file=sys.stderr, flush=True)
        bank.add("budget_exhausted", {"after_s": round(time.time() - T_START)},
                 print_line=False)
        bank.final_print()
        sys.stdout.flush()
        os._exit(0)

    signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(BUDGET_S)

    # ---- preflight: bail out fast if the accelerator service hangs
    # (a hung chip would otherwise burn the per-config timeouts 4x) ----
    try:
        proc = _subprocess(["--child-preflight"], 600)
        ok = any(l.startswith("RESULT") for l in proc.stdout.splitlines())
    except subprocess.TimeoutExpired:
        ok = False
    if not ok:
        print("accelerator preflight failed/hung", file=sys.stderr)
        bank.set_headline(dict(bank.headline, note="accelerator unresponsive"))
        bank.final_print()
        return

    def _alive(timeout=300):
        try:
            proc = _subprocess(["--child-preflight"], timeout)
            return any(
                l.startswith("RESULT") for l in proc.stdout.splitlines()
            )
        except subprocess.TimeoutExpired:
            return False

    recovery_spent = [0.0]

    def _wait_recovery(tries=4, pause=90):
        """The service wedge clears by itself after minutes; poll with a
        GLOBAL cap (10 min total across the whole bench) so recovery
        sleeps can never dominate the budget."""
        for _ in range(tries):
            if recovery_spent[0] > 600 or _remaining() < 300:
                return False
            time.sleep(pause)
            recovery_spent[0] += pause
            if _alive(120):
                print("accelerator service recovered", file=sys.stderr)
                return True
        return False

    def _mk_headline(elapsed_s, cfg):
        used_members, used_side = cfg
        ours_rate = used_members * N_TIMESTEPS / elapsed_s
        ref = _ref_rate(f"steps_8m_{used_side}")
        return {
            "metric": f"steps_{used_members}member_{used_side}px_throughput",
            "value": round(ours_rate, 2),
            "unit": "member-frames/s/chip",
            "vs_baseline": round(ours_rate / ref, 2) if ref else None,
        }

    # ---- headline: STEPS 96-member throughput (climb smallest-first;
    # every success prints immediately; stop climbing the moment the
    # accelerator goes dark) ----
    accel_dead = False
    for n_members, side, member_chunk in HEADLINE_CONFIGS:
        if _remaining() < 240:
            break
        try:
            proc = _subprocess(
                ["--child-steps", str(n_members), str(side), str(member_chunk)],
                min(1800, max(240, int(_remaining()) - 120)),
            )
            got, _ = _child_result(proc)
        except subprocess.TimeoutExpired:
            got = None
        if got is not None:
            bank.set_headline(_mk_headline(got, (n_members, side)))
            continue
        print(f"config {n_members}x{side} failed/hung", file=sys.stderr)
        if not _alive():
            print("accelerator service wedged", file=sys.stderr)
            accel_dead = not _wait_recovery()
        break

    # ---- large-grid configs (CONUS-scale north star), banked as their
    # own entries so the 512 headline stays comparable across rounds ----
    for n_members, side, member_chunk in LARGE_CONFIGS:
        if accel_dead or _remaining() < 600:
            break
        try:
            proc = _subprocess(
                ["--child-steps", str(n_members), str(side), str(member_chunk)],
                min(2400, max(300, int(_remaining()) - 120)),
            )
            got, _ = _child_result(proc)
        except subprocess.TimeoutExpired:
            got = None
        if got is None:
            print(f"large config {n_members}x{side} failed/hung",
                  file=sys.stderr)
            if not _alive():
                accel_dead = not _wait_recovery()
            continue
        rate = n_members * N_TIMESTEPS / got
        ref = _ref_rate(f"steps_8m_{side}")
        bank.add(f"steps{n_members}_{side}", {
            "metric": f"steps_{n_members}member_{side}px_throughput",
            "value": round(rate, 2),
            "unit": "member-frames/s/chip",
            "vs_baseline": round(rate / ref, 2) if ref else None,
        })

    # ---- secondary BASELINE configs ----
    for model, cfg, ref_key in SECONDARY:
        if accel_dead:
            print(f"{model} skipped: accelerator wedged", file=sys.stderr)
            bank.add(model, {"metric": f"{model}_skipped",
                             "note": "accelerator service wedged"},
                     print_line=False)
            continue
        if _remaining() < 240:
            break
        side = cfg["side"]
        members = cfg.get("members", 0)
        try:
            if model == "steps24":
                proc = _subprocess(
                    ["--child-steps", "24", str(side), "None", "parametric"],
                    min(1500, max(240, int(_remaining()) - 120)),
                )
            else:
                proc = _subprocess(
                    ["--child-model", model, str(side), str(members)],
                    min(1500, max(240, int(_remaining()) - 120)),
                )
        except subprocess.TimeoutExpired:
            print(f"{model} timed out", file=sys.stderr)
            if not _alive():
                print("accelerator service wedged", file=sys.stderr)
                accel_dead = not _wait_recovery()
            continue
        res, frames = _child_result(proc)
        if res is None:
            print(f"{model} failed:\n{proc.stderr[-400:]}", file=sys.stderr)
            continue
        if model == "steps24":
            frames = 24 * N_TIMESTEPS
        rate = frames / res
        ref = _ref_rate(ref_key)
        bank.add(f"{model}_{side}", {
            "metric": f"{model}_{side}px_throughput",
            "value": round(rate, 3),
            "unit": UNIT_OVERRIDE.get(model, "member-frames/s/chip"),
            "vs_baseline": round(rate / ref, 2) if ref else None,
        })

    # ---- motion solvers (one dense-flow retrieval, 512 px) ----
    for method, ref_key in MOTION:
        if accel_dead or _remaining() < 200:
            break
        try:
            proc = _subprocess(
                ["--child-motion", method, "512"],
                min(900, max(200, int(_remaining()) - 120)),
            )
        except subprocess.TimeoutExpired:
            print(f"motion {method} timed out", file=sys.stderr)
            if not _alive():
                accel_dead = not _wait_recovery()
            continue
        res, _ = _child_result(proc)
        if res is None:
            print(f"motion {method} failed:\n{proc.stderr[-400:]}",
                  file=sys.stderr)
            continue
        rate = 1.0 / res
        ref = _ref_rate(ref_key)
        entry = {
            "metric": f"motion_{method}_512px_throughput",
            "value": round(rate, 3),
            "unit": "fields/s",
            "vs_baseline": round(rate / ref, 2) if ref else None,
        }
        if method in ("vet", "proesmans"):
            # honesty caveat: the baseline is a NumPy-vectorized port of
            # the reference's OpenMP Cython (unbuildable here); a
            # compiled prange kernel would plausibly run ~10-30x faster
            # than the port, so vs_baseline OVERSTATES the margin over
            # the real reference
            entry["note"] = (
                "baseline = NumPy-vectorized port of the reference "
                "Cython (_vet.pyx/_proesmans.pyx unbuildable, no "
                "Cython); the true margin over a compiled OpenMP "
                "reference is smaller"
            )
        elif ref is None:
            entry["note"] = "no reference baseline"
        bank.add(f"motion_{method}", entry)

    # ---- scaling sweeps (virtual CPU mesh proxy; no TPU involved) ----
    if _remaining() > 300:
        try:
            proc = _subprocess(
                ["--child-scaling"],
                min(1500, max(300, int(_remaining()) - 120)),
            )
            for line in proc.stdout.splitlines():
                if line.startswith("SCALING "):
                    bank.add("ens_scaling_cpu_mesh", json.loads(line[8:]),
                             print_line=False)
        except subprocess.TimeoutExpired:
            print("scaling sweep timed out", file=sys.stderr)

    # ---- bonus: the full unchunked 96x512 dispatch, attempted LAST
    # because it is the config observed to wedge the service — everything
    # above is already banked and printed if it hangs ----
    if not accel_dead and _remaining() > 400 and _alive(180):
        n_members, side, member_chunk = BONUS_CONFIG
        try:
            proc = _subprocess(
                ["--child-steps", str(n_members), str(side), str(member_chunk)],
                min(1500, max(300, int(_remaining()) - 60)),
            )
            got, _ = _child_result(proc)
        except subprocess.TimeoutExpired:
            got = None
        if got is not None:
            cand = _mk_headline(got, (n_members, side))
            if cand["value"] > bank.headline["value"]:
                bank.set_headline(cand)
            else:
                bank.add("bonus_unchunked_96x512", cand)
        else:
            print("bonus 96x512 config failed/hung", file=sys.stderr)

    signal.alarm(0)
    bank.final_print()


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
    elif len(sys.argv) >= 2 and sys.argv[1] == "--child-motion":
        run_child_motion(sys.argv[2], int(sys.argv[3]))
    elif len(sys.argv) >= 2 and sys.argv[1] == "--child-scaling":
        run_child_scaling()
    else:
        main()
