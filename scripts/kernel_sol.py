"""Per-kernel speed-of-light accounting on the real TPU.

Measures achieved HBM GB/s (and MXU GFLOP/s where matmuls dominate) for
the hot Pallas/matmul kernels against the v5e-1 peaks (819 GB/s HBM,
197 TFLOP/s bf16), at 512^2 and 2048^2.  Each kernel runs inside one jit
as a serial lax.scan (output feeds the next input) so per-dispatch
latency amortizes and XLA cannot elide iterations; a vmap over a member
batch reproduces in-scan batching.

Usage: python scripts/kernel_sol.py [side] [batch] [iters]
Prints one JSON line per kernel: name, wall us/call, bytes, GB/s, %peak.
"""

import functools
import json
import sys
import time

sys.path.insert(0, ".")

from pysteps_tpu.compilation_cache import enable

enable()

import jax
import jax.numpy as jnp
import numpy as np

HBM_PEAK = 819.0  # GB/s, v5e
MXU_PEAK = 197e12  # bf16 FLOP/s, v5e


_checksum = jax.jit(lambda a: jnp.sum(jnp.abs(a).astype(jnp.float32)))


def timed(fn, *args, iters):
    out = fn(*args)
    # force completion through the axon tunnel with a scalar reduction
    # (eager complex reductions are unimplemented on the axon path)
    float(_checksum(jax.tree.leaves(out)[0]))
    t0 = time.time()
    out = fn(*args)
    float(_checksum(jax.tree.leaves(out)[0]))
    wall = time.time() - t0
    return wall / iters


def scan_loop(body, x0, iters, batch):
    """jit(vmap(scan(body))) with a serial data dependency."""

    @jax.jit
    def run(x):
        def step(c, _):
            return body(c), None

        def one(xj):
            c, _ = jax.lax.scan(step, xj, None, length=iters)
            return c

        return jax.vmap(one)(x)

    return run


def report(name, us, mbytes, flops=0.0, note=""):
    gbs = (mbytes / 1e3) / (us / 1e6) if us > 0 else 0.0
    row = {
        "kernel": name,
        "us_per_call": round(us, 2),
        "MB_touched": round(mbytes, 2),
        "GBps": round(gbs, 1),
        "pct_HBM_peak": round(100 * gbs / HBM_PEAK, 1),
    }
    if flops:
        gf = flops / (us / 1e6) / 1e9
        row["GFLOPs"] = round(gf, 1)
        row["pct_MXU_peak"] = round(100 * gf * 1e9 / MXU_PEAK, 1)
    if note:
        row["note"] = note
    print(json.dumps(row), flush=True)
    return row


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    m = n = side
    mb = m * n * 4 / 1e6
    key = jax.random.PRNGKey(0)
    field = jax.random.normal(key, (batch, m, n), jnp.float32)
    D = 48

    # displacement planes for the fused warp
    dy = 7.3 * jnp.ones((batch, m, n), jnp.float32)
    disp_t = jnp.stack(
        [4.2 * jnp.ones((batch, n, m)), 7.3 * jnp.ones((batch, n, m))], axis=1
    )

    rows = {}

    # --- fused Pallas warp (vertical + transpose + horizontal + transpose)
    from pysteps_tpu.ops.pallas_warp import warp_fused_pallas

    def warp_body(c):
        return warp_fused_pallas(c[0], c[1], c[2], D, 0.0), c[1], c[2]

    run = scan_loop(warp_body, (field, dy[0], disp_t[0]), iters, batch)
    us = timed(run, (field, dy, disp_t), iters=iters) / batch * 1e6
    # min traffic: field r/w through 2 resample passes + 2 transposes +
    # 3 displacement plane reads
    rows["pallas_warp_fused"] = report(
        "pallas_warp_fused", us, 11 * mb,
        note="2 resamples + 2 XLA transposes + 3 disp planes",
    )

    # --- PWL CDF match: apply kernel alone, then the full matcher
    from pysteps_tpu.ops import pallas_histmatch as ph

    rng = np.random.RandomState(0)
    edges = jnp.asarray(np.sort(rng.randn(ph.K)), jnp.float32)
    w = jnp.asarray(rng.randn(8, ph.K) * 1e-3, jnp.float32)
    q0 = jnp.float32(0.0)

    def pwl_body(c):
        return ph.pwl_apply(c, edges, w, q0)

    run = scan_loop(pwl_body, field[0], iters, batch)
    us = timed(run, field, iters=iters) / batch * 1e6
    rows["pallas_pwl_apply"] = report(
        "pallas_pwl_apply", us, 2 * mb,
        flops=2 * m * n * 8 * ph.K, note="read+write; (8,K) MXU tile",
    )

    target_np = np.sort(rng.randn(m * n)).astype(np.float32)
    target = jnp.asarray(target_np)
    tstate = jax.jit(ph.prepare_target)(target, jnp.float32(target_np[0]))

    def match_body(c):
        return ph.match_cdf_pwl(c, tstate)

    run = scan_loop(match_body, field[0], iters, batch)
    us = timed(run, field, iters=iters) / batch * 1e6
    rows["match_cdf_pwl_full"] = report(
        "match_cdf_pwl_full", us, 3 * mb,
        note="apply + tail count + LUT build (subsample sort)",
    )

    # --- dilated rim mask
    from pysteps_tpu.nowcasts.utils import compute_dilated_mask_from_field

    def rim_body(c):
        mask = compute_dilated_mask_from_field(c, 0.5, 10, 10)
        return c + 0.0 * mask  # keep serial dependency on the field

    run = scan_loop(rim_body, field[0], iters, batch)
    us = timed(run, field, iters=iters) / batch * 1e6
    rows["dilated_rim"] = report(
        "dilated_rim", us, 2 * mb, note="threshold+dilate+rim weights"
    )

    # --- inverse + forward DFT matmul (spectral<->spatial hop)
    from pysteps_tpu.ops import matfft

    spec = jax.jit(jnp.fft.rfft2)(field)

    def ifft_body(c):
        x = matfft.irfft2_mat(c, (m, n))
        return matfft.rfft2_mat(x)

    run = scan_loop(ifft_body, spec[0], iters, batch)
    us = timed(run, spec, iters=iters) / batch * 1e6
    # bf16x3 DFT matmuls: ~2 x (2 x m*n*(m+n)) complex MACs x 3 passes
    flops = 2 * 2 * 4 * m * n * (m + n) * 3
    rows["matfft_roundtrip"] = report(
        "matfft_roundtrip", us, (2 * 2.1 + 2) * mb, flops=flops,
        note="irfft2+rfft2 DFT-matmul pair",
    )

    out = {
        "side": side, "batch": batch, "iters": iters,
        "rows": {k: v for k, v in rows.items()},
    }
    with open(f"KERNEL_SOL_{side}.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
