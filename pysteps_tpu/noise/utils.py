"""
Noise std-dev adjustment (reference: pysteps/noise/utils.py:24-140;
Bowler, Pierce & Seed 2006).

TPU-native: the reference's dask-parallel Monte-Carlo loop over noise
realizations becomes one vmap over folded RNG keys — all ``num_iter``
realizations' FFTs batch into single kernels.
"""

import functools

import jax
import jax.numpy as jnp

from pysteps_tpu.cascade.decomposition import decompose_core
from pysteps_tpu.noise.fftgenerators import (
    _generate_fft_noise,
    _generate_ssft_noise,
    _ssft_gen_masks,
)


@functools.partial(
    jax.jit,
    static_argnames=("num_iter", "conditional", "use_full_fft", "input_shape"),
)
def _stddev_adjs_core(
    precip, precip_thr, precip_min, weights_2d, noise_filt, input_shape,
    key, num_iter, conditional, use_full_fft, ssft_masks=None,
):
    mask = precip >= precip_thr
    R = jnp.where(jnp.isfinite(precip), precip, precip_min)
    R = jnp.where(mask, R, precip_min)
    stat_mask = mask if conditional else jnp.ones_like(mask)
    w = stat_mask.astype(R.dtype)
    cnt = jnp.maximum(jnp.sum(w), 1.0)
    mu = jnp.sum(R * w) / cnt
    sigma = jnp.sqrt(jnp.sum((R - mu) ** 2 * w) / cnt)
    Rc = R - mu

    _, _, stds_obs = decompose_core(
        Rc, weights_2d, mask=stat_mask if conditional else None, normalize=False
    )

    def one_realization(k):
        if ssft_masks is not None:
            N = _generate_ssft_noise(k, noise_filt, ssft_masks, input_shape)
        else:
            N = _generate_fft_noise(k, noise_filt, input_shape, use_full_fft)
        N = N / jnp.std(N) * sigma + mu
        N = jnp.where(mask, N, precip_min) - mu
        _, _, stds = decompose_core(
            N, weights_2d, mask=stat_mask if conditional else None, normalize=False
        )
        return stds

    keys = jax.random.split(key, num_iter)
    stds_noise = jax.vmap(one_realization)(keys)  # (num_iter, k)
    return stds_obs / jnp.mean(stds_noise, axis=0)


def compute_noise_stddev_adjs(
    R,
    R_thr_1,
    R_thr_2,
    F,
    decomp_method,
    noise_filter,
    noise_generator,
    num_iter,
    conditional=True,
    num_workers=1,
    seed=None,
    key=None,
):
    """Scale-dependent correction factors for masked noise cascades
    (reference: noise/utils.py:24).  API-compatible with the reference;
    ``decomp_method``/``noise_generator`` args are accepted but the batched
    jitted cores are used internally.
    """
    del decomp_method, noise_generator, num_workers
    if key is None:
        key = jax.random.PRNGKey(seed if seed is not None else 0)
    filt = noise_filter["field"]
    input_shape = tuple(noise_filter["input_shape"])
    ssft_masks = None
    if filt.ndim == 4:  # ssft / nested (wy, wx, m, n) filter stack
        ssft_masks = jnp.asarray(
            _ssft_gen_masks(
                filt.shape,
                input_shape,
                noise_filter.get("overlap_gen", 0.2),
                noise_filter.get("win_fun", "tukey"),
            ),
            jnp.float32,
        )
    return _stddev_adjs_core(
        jnp.asarray(R, jnp.float32),
        jnp.float32(R_thr_1),
        jnp.float32(R_thr_2),
        F["weights_2d"],
        filt,
        input_shape,
        key,
        int(num_iter),
        bool(conditional),
        bool(noise_filter.get("use_full_fft", False)),
        ssft_masks=ssft_masks,
    )
