"""Per-kernel speed-of-light accounting on the real TPU.

Measures achieved HBM GB/s (and MXU utilization where matmuls dominate)
for the hot kernels against the v5e-1 peaks (819 GB/s HBM, 197 TFLOP/s
bf16), at a given grid size.

Methodology (r5 — the naive harness misled twice):
- body runs inside ONE jit as ``lax.scan`` over a batched (members-
  first) op, matching the model scans' structure; ``vmap(scan)`` was
  measured 4x slower than ``scan(vmap)`` and is NOT representative;
- two runs at different iteration counts are DIFFERENCED, cancelling
  the ~30-60 ms dispatch + scalar-fetch round trip of the axon tunnel
  (at 12 iterations that overhead alone inflated per-call times ~2x);
- a serial data dependency threads the scan so XLA cannot elide
  iterations; best-of-3 walls absorb the ~±3% chip noise.

Reference point: an XLA elementwise-copy chain achieves ~330 GB/s and
an XLA transpose ~660 GB/s on this chip — treat ~650-800 GB/s as the
practical streaming ceiling, not the 819 GB/s spec sheet.

Usage: python scripts/kernel_sol.py [side] [batch]
Prints one JSON line per kernel and writes KERNEL_SOL_<side>.json.
"""

import json
import sys
import time

sys.path.insert(0, ".")

from pysteps_tpu.compilation_cache import enable

enable()

import jax
import jax.numpy as jnp
import numpy as np

HBM_PEAK = 819.0  # GB/s, v5e spec
MXU_PEAK = 197e12  # bf16 FLOP/s, v5e spec

_checksum = jax.jit(lambda a: jnp.sum(jnp.abs(a).astype(jnp.float32)))


def bench(body, x0, batch, i1=8, i2=40):
    """us per member-call, differenced across two iteration counts."""

    def mk(iters):
        @jax.jit
        def run(x):
            def step(c, _):
                return jax.vmap(body)(c), None

            c, _ = jax.lax.scan(step, x, None, length=iters)
            return c

        return run

    r1, r2 = mk(i1), mk(i2)
    for r in (r1, r2):
        float(_checksum(r(x0)))

    def t(r):
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            float(_checksum(r(x0)))
            best = min(best, time.time() - t0)
        return best

    return (t(r2) - t(r1)) / (i2 - i1) / batch * 1e6


def report(rows, name, us, mbytes, flops=0.0, note=""):
    gbs = (mbytes / 1e3) / (us / 1e6) if us > 0 else 0.0
    row = {
        "kernel": name,
        "us_per_member_call": round(us, 1),
        "MB_touched": round(mbytes, 2),
        "GBps": round(gbs, 1),
        "pct_HBM_spec": round(100 * gbs / HBM_PEAK, 1),
    }
    if flops:
        gf = flops / (us / 1e6) / 1e9
        row["GFLOPs"] = round(gf, 1)
        row["pct_MXU_spec"] = round(100 * gf * 1e9 / MXU_PEAK, 1)
    if note:
        row["note"] = note
    print(json.dumps(row), flush=True)
    rows[name] = row


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    m = n = side
    mb = m * n * 4 / 1e6
    rng = np.random.RandomState(0)
    field = jnp.asarray(rng.randn(batch, m, n).astype(np.float32) * 3)
    rows = {}

    # --- streaming ceiling reference points ---
    us = bench(lambda c: c * 1.0000001 + 1e-9, field, batch)
    report(rows, "xla_elementwise", us, 2 * mb,
           note="read+write chain; the practical streaming reference")
    us = bench(lambda c: jnp.swapaxes(c, 0, 1) * 1.0000001, field, batch)
    report(rows, "xla_transpose", us, 2 * mb)

    # --- fused warp (vertical+horizontal resample + 2 transposes) ---
    from pysteps_tpu.ops.pallas_warp import warp_fused_pallas

    dy = jnp.asarray(np.full((m, n), 7.3), jnp.float32)
    disp_t = jnp.stack([jnp.full((n, m), 4.2), jnp.full((n, m), 7.3)])
    us = bench(
        lambda c: warp_fused_pallas(c, dy, disp_t, 48, 0.0), field, batch
    )
    report(rows, "pallas_warp_fused", us, 11 * mb,
           note="2 resamples + 2 XLA transposes + 3 disp planes")

    # --- PWL matcher: apply kernel, then full matcher with LUT build ---
    from pysteps_tpu.ops import pallas_histmatch as ph

    edges = jnp.asarray(np.sort(rng.randn(ph.K)), jnp.float32)
    w = jnp.asarray(rng.randn(8, ph.K) * 1e-3, jnp.float32)
    q0 = jnp.float32(0.0)
    us = bench(lambda c: ph.pwl_apply(c, edges, w, q0), field, batch)
    report(rows, "pallas_pwl_apply", us, 2 * mb,
           flops=2 * m * n * 8 * ph.K,
           note="flat 128-edge compare cube (VPU-bound)")

    target = jnp.asarray(np.sort(rng.randn(m * n)).astype(np.float32))
    tstate = jax.jit(ph.prepare_target)(target, target[0])
    us = bench(lambda c: ph.match_cdf_pwl(c, tstate), field, batch)
    report(rows, "match_cdf_pwl_full", us, 3 * mb,
           note="apply + LUT build (subsample sort + tail count)")

    # r5: the sublane-gather hierarchical apply (no MXU contraction)
    def gather_apply(c):
        e, d0, d1, q0g, zv, zt = ph.build_pwl_coeffs(
            c.reshape(-1), tstate
        )
        e8, T = ph.pack_gather_lut(e, d0, d1)
        return ph.pwl_apply_gather(c.reshape(-1), e8, T, q0g, zv, zt
                                   ).reshape(c.shape)

    us = bench(gather_apply, field, batch)
    report(rows, "pwl_apply_gather_full", us, 3 * mb,
           note="LUT build + span-8 sublane-gather apply (VPU only)")

    # --- fused spatial chain (match + rim + warp), when supported ---
    from pysteps_tpu.ops import pallas_chain as pc

    if pc.supported((m, n)):
        def chain(c):
            e, d0, d1, q0c, zv, zt = ph.build_pwl_coeffs(
                c.reshape(-1), tstate
            )
            e16, M3 = ph.pack_gather_lut(e, d0, d1)
            out, rim = pc.match_warp_rim(
                c, e16, M3, q0c, zv, zt, jnp.float32(1.0), dy, disp_t,
                jnp.float32(0.0), 48, 10, 10, do_rim=True,
            )
            return out + 0.0 * rim

        us = bench(chain, field, batch)
        report(rows, "fused_chain_total", us, 7 * mb,
               note="LUT build + hierarchical match + rim + warp")

    # --- dilated rim mask ---
    from pysteps_tpu.nowcasts.utils import compute_dilated_mask_from_field

    us = bench(
        lambda c: c + 0.0 * compute_dilated_mask_from_field(c, 0.5, 10, 10),
        field, batch,
    )
    report(rows, "dilated_rim", us, 2 * mb)

    # --- DFT-matmul spectral hop (inverse + forward) ---
    from pysteps_tpu.ops import matfft

    if matfft.supported((m, n)):
        spec = jax.jit(jnp.fft.rfft2)(field)
        us = bench(
            lambda c: matfft.rfft2_mat(matfft.irfft2_mat(c, (m, n))),
            spec, batch,
        )
        # true complex-DFT flops: 2 axes x 2 dirs x ~4 real matmuls x
        # (m*n*side MACs) at bf16x3
        flops = 2 * 2 * 4 * 2 * m * n * side * 3
        report(rows, "matfft_roundtrip", us, (2 * 2.1 + 2) * mb,
               flops=flops, note="irfft2+rfft2 DFT-matmul pair")
    else:
        spec = jax.jit(jnp.fft.rfft2)(field)
        us = bench(
            lambda c: jnp.fft.rfft2(jnp.fft.irfft2(c, s=(m, n))), spec,
            batch,
        )
        report(rows, "xla_fft_roundtrip", us, (2 * 2.1 + 2) * mb,
               note="XLA TPU FFT (matfft window ends at 1024)")

    out = {"side": side, "batch": batch, "rows": rows,
           "methodology": "differenced scan-of-batched, best of 3"}
    with open(f"KERNEL_SOL_{side}.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
