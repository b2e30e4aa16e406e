"""Per-component timing of the STEPS member-step at bench scale.

Runs each hot op in a (scan x vmap) harness matching the real loop shape
(12 lead times x E members) on the available accelerator, to show where
the member-step budget goes.  Usage: python scripts/profile_member_step.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from pysteps_tpu.compilation_cache import enable

enable()

E, SIDE, T, K = 24, 512, 12, 8


def bench_scan(name, body, init_state):
    """Time a scan of `body` over T steps with E-member vmapped states."""

    @jax.jit
    def run(state):
        def step(s, _):
            s = jax.vmap(body)(s)
            return s, ()

        s, _ = jax.lax.scan(step, state, None, length=T)
        return jax.tree.map(
            lambda x: jnp.nanmean(x.real if jnp.iscomplexobj(x) else x), s
        )

    out = run(init_state)
    jax.tree.map(float, out)  # force completion
    t0 = time.time()
    out = run(init_state)
    jax.tree.map(float, out)
    dt = time.time() - t0
    per_mf = dt / (T * E) * 1e3
    print(f"{name:34s} {dt*1e3:8.1f} ms total   {per_mf:7.3f} ms/member-frame")
    return per_mf


def main():
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    # keep closure constants as HOST numpy arrays: embedding an eager
    # device array as a jit constant triggers a D2H readback that the
    # axon TPU path reports as Unimplemented
    field_np = rng.randn(E, SIDE, SIDE).astype(np.float32)
    field = jnp.asarray(field_np)
    fft0 = np.fft.rfft2(field_np[0])
    field_fft_ri = np.stack([fft0.real, fft0.imag], -1).astype(np.float32)
    # complex arrays cannot cross the host<->device boundary eagerly on
    # axon: keep the AR state as a trailing real/imag axis and form the
    # complex view inside jit
    casc_ri = jnp.asarray(
        rng.randn(E, K, 2, SIDE, SIDE // 2 + 1, 2).astype(np.float32)
    )
    weights = np.abs(rng.randn(K, SIDE, SIDE // 2 + 1)).astype(np.float32)
    phi = rng.rand(K, 3).astype(np.float32)
    noise_filt = np.abs(rng.randn(SIDE, SIDE // 2 + 1)).astype(np.float32)
    keys = jax.random.split(key, E)
    disp = jnp.zeros((E, 2, SIDE, SIDE), jnp.float32)
    vel = np.stack(
        [np.full((SIDE, SIDE), 2.0), np.full((SIDE, SIDE), 1.0)]
    ).astype(np.float32)

    from pysteps_tpu.extrapolation.semilagrangian import (
        integrate_displacement,
        model_warp,
    )
    from pysteps_tpu.nowcasts import utils as nu
    from pysteps_tpu.postprocessing.probmatching import (
        _match_cdf_presorted,
        prepare_cdf_matcher,
    )

    ranked = np.sort(field_np[0].ravel())
    zval = np.float32(ranked.min())
    pm_match, pm_state = prepare_cdf_matcher(jnp.asarray(field_np[0]))

    # 1. noise generation (direct spectral white draw -> filter)
    from pysteps_tpu.noise.fftgenerators import _spectral_white

    def noise_body(state):
        k, acc = state
        k, sub = jax.random.split(k)
        eps_fft = _spectral_white(sub, (SIDE, SIDE)) * noise_filt
        return (k, acc + jnp.nanmean(eps_fft.real))

    @jax.jit
    def run_noise(keys, acc):
        def step(s, _):
            return jax.vmap(noise_body)(s), ()

        (_, acc), _ = jax.lax.scan(step, (keys, acc), None, length=T)
        return jnp.nanmean(acc)

    float(run_noise(keys, jnp.zeros(E)))
    t0 = time.time()
    float(run_noise(keys, jnp.zeros(E)))
    dt = time.time() - t0
    print(f"{'noise: rfft2(white)*filter':34s} {dt*1e3:8.1f} ms total   {dt/(T*E)*1e3:7.3f} ms/member-frame")

    # 2. spectral decompose of noise + AR iterate (all-spectral state)
    def ar_body(c_ri):
        c = jax.lax.complex(c_ri[..., 0], c_ri[..., 1])
        eps_lvl = jax.lax.complex(
            field_fft_ri[..., 0], field_fft_ri[..., 1]
        )[None] * weights
        x_new = (
            c[:, 1] * phi[:, 0, None, None]
            + c[:, 0] * phi[:, 1, None, None]
            + eps_lvl * phi[:, 2, None, None]
        )
        out = jnp.stack([c[:, 1], x_new], axis=1)
        return jnp.stack([out.real, out.imag], axis=-1)

    bench_scan("AR(2) spectral iterate (K=8)", ar_body, casc_ri)

    # 3. spectral recompose (sum K levels + irfft2)
    def recomp_body(c_ri):
        c = jax.lax.complex(c_ri[..., 0], c_ri[..., 1])
        out_fft = jnp.sum(c, axis=0)
        f = jnp.fft.irfft2(out_fft, s=(SIDE, SIDE))
        return c_ri + jnp.nanmean(f) * 0

    bench_scan("recompose: sum K + irfft2", recomp_body, casc_ri[:, :, -1])

    # 4. CDF matching: live matcher (PWL Pallas on TPU) vs packed sorts
    def cdf_body(f):
        return pm_match(f, pm_state)

    bench_scan("cdf match (live: pwl on tpu)", cdf_body, field)

    def cdf_sort_body(f):
        return _match_cdf_presorted(f, ranked, zval)

    bench_scan("cdf match (packed sorts)", cdf_sort_body, field)

    # 5. incremental mask dilation
    def mask_body(f):
        m = nu.compute_dilated_mask(f > 0, 2, 10)
        return f + m * 0.0

    bench_scan("incremental mask dilate", mask_body, field)

    # 6. displacement integrate + shift-decomposition warp
    max_disp = 40

    def warp_body(state):
        f, d = state
        d = jax.vmap(lambda dd: integrate_displacement(vel, dd, 1.0, max_disp=max_disp))(d)
        f = jax.vmap(lambda ff, dd: model_warp(ff, dd, max_disp=max_disp, cval=0.0))(f, d)
        return (f, d)

    @jax.jit
    def run_warp(state):
        def step(s, _):
            return warp_body(s), ()

        s, _ = jax.lax.scan(step, state, None, length=T)
        return jnp.nanmean(s[0])

    float(run_warp((field, disp)))
    t0 = time.time()
    float(run_warp((field, disp)))
    dt = time.time() - t0
    print(f"{'integrate + warp (max_disp=40)':34s} {dt*1e3:8.1f} ms total   {dt/(T*E)*1e3:7.3f} ms/member-frame")


if __name__ == "__main__":
    main()
