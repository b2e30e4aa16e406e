"""Micro-ablation of the STEPS spectral noise path on the real TPU.

Times variants of the per-member noise pipeline inside the same
scan(T) x vmap(E) structure as the model, so relative deltas are
meaningful (isolated op timings mislead; CLAUDE.md).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from pysteps_tpu.compilation_cache import enable

enable()

from pysteps_tpu.cascade import bandpass_filters
from pysteps_tpu.cascade.decomposition import decompose_spectral_core
from pysteps_tpu.noise.fftgenerators import _generate_fft_noise, _spectral_white
from pysteps_tpu.utils import spectral as spectral_utils

E, T, m, n, K = 96, 12, 512, 512, 8
shape = (m, n)
rf = n // 2 + 1

bp = bandpass_filters.filter_gaussian(shape, K)
w2d = np.asarray(bp["weights_2d"], np.float32)
rng = np.random.RandomState(0)
filt_np = np.abs(np.fft.rfft2(rng.gamma(2.0, 2.0, shape))).astype(np.float32)

# hermitian dof weights for rfft2 half-plane parseval sums
herm = np.full((m, rf), 2.0, np.float32)
herm[:, 0] = 1.0
if n % 2 == 0:
    herm[:, -1] = 1.0

coeffs_np = np.linspace(0.8, 1.2, K).astype(np.float32)


def run(name, member_fn):
    filt = jnp.asarray(filt_np)
    weights = jnp.asarray(w2d)
    coeffs = jnp.asarray(coeffs_np)

    @jax.jit
    def driver(key0):
        keys = jax.random.split(key0, E)

        def step(carry, t):
            keys = carry
            keys = jax.vmap(lambda k: jax.random.fold_in(k, t))(keys)
            out = jax.vmap(lambda k: member_fn(k, filt, weights, coeffs))(keys)
            return keys, jnp.sum(jnp.abs(out) ** 2)

        _, sums = jax.lax.scan(step, keys, jnp.arange(T))
        return jnp.sum(sums)

    v = float(driver(jax.random.PRNGKey(0)))  # compile+warm
    t0 = time.time()
    v = float(driver(jax.random.PRNGKey(1)))
    dt = time.time() - t0
    print(f"{name:28s} {dt*1e6/(E*T):8.1f} us/member-frame   (chk {v:.3e})")
    return dt


def full(key, filt, weights, coeffs):
    eps_fft = _generate_fft_noise(key, filt, shape, False, domain="spectral")
    eps_levels, _, _ = decompose_spectral_core(eps_fft, weights, shape)
    eps_levels = eps_levels * coeffs[:, None, None]
    return jnp.sum(eps_levels, axis=0)


def no_level_norm(key, filt, weights, coeffs):
    eps_fft = _generate_fft_noise(key, filt, shape, False, domain="spectral")
    eps_levels, _, _ = decompose_spectral_core(
        eps_fft, weights, shape, normalize=False
    )
    eps_levels = eps_levels * coeffs[:, None, None]
    return jnp.sum(eps_levels, axis=0)


def draw_filter_norm(key, filt, weights, coeffs):
    eps_fft = _generate_fft_noise(key, filt, shape, False, domain="spectral")
    return eps_fft


def draw_only(key, filt, weights, coeffs):
    return _spectral_white(key, shape)


def matmul_std(key, filt, weights, coeffs):
    """Idea: per-level std via one (K, B) @ (B,) contraction of the level
    weights^2 against |eps|^2 — no K-level cube materialization for the
    statistics pass; the normalized level sum collapses to a single
    elementwise expression."""
    eps_fft = _generate_fft_noise(key, filt, shape, False, domain="spectral")
    herm_j = jnp.asarray(herm)
    size = m * n
    p2 = (jnp.real(eps_fft) ** 2 + jnp.imag(eps_fft) ** 2) * herm_j
    s2 = (weights.reshape(K, -1) ** 2) @ p2.reshape(-1)  # (K,)
    # spectral mean is the DC bin of each level
    mu = jnp.real(eps_fft[0, 0]) * weights[:, 0, 0] / size
    stds = jnp.sqrt(jnp.maximum(s2 / float(size) ** 2 - mu**2, 1e-24))
    scale = coeffs / jnp.maximum(stds, 1e-12)  # (K,)
    # sum_k scale_k * (w_k * eps - dc_k)  -> single weighted multiply
    wsum = jnp.einsum("k,kij->ij", scale, weights)
    out = eps_fft * wsum
    dc = jnp.sum(scale * mu) * size
    out = out.at[0, 0].add(-dc)
    return out


run("full", full)
run("no_level_norm", no_level_norm)
run("draw_filter_norm", draw_filter_norm)
run("draw_only", draw_only)
run("matmul_std_fused", matmul_std)
run("full(again)", full)


def draw_only_rbg(key, filt, weights, coeffs):
    k2 = jax.random.wrap_key_data(
        jax.random.key_data(key).astype(jnp.uint32).repeat(2)[:4],
        impl="rbg",
    )
    m_, n_ = shape
    rf_ = n_ // 2 + 1
    z = jax.random.normal(k2, (m_, rf_, 2), dtype=jnp.float32)
    return jax.lax.complex(z[..., 0], z[..., 1])


run("draw_only_rbg", draw_only_rbg)
