"""
Constant-vector advection field (reference: pysteps/motion/constant.py:20-60).

The reference maximizes the correlation between the shifted previous frame
and the current frame with Nelder-Mead; here a coarse grid search over
integer shifts (one batched gather) is refined by a few golden-section-like
gradient-free refinement steps on the bilinear-interpolated objective —
all on device.
"""

import jax
import jax.numpy as jnp

from pysteps_tpu.ops.warp import warp


def constant(R, **kwargs):
    """Constant advection field (2, m, n) from the last two frames of R
    (reference: motion/constant.py:20)."""
    R = jnp.asarray(R, jnp.float32)
    prev, curr = R[-2], R[-1]
    m, n = curr.shape
    finite = jnp.isfinite(prev) & jnp.isfinite(curr)
    prev_f = jnp.where(finite, prev, 0.0)
    curr_f = jnp.where(finite, curr, 0.0)

    max_shift = kwargs.get("max_shift", 20)

    def objective(v):
        # backward-warp prev by -v and correlate with curr
        disp = jnp.stack(
            [jnp.full((m, n), -v[0]), jnp.full((m, n), -v[1])]
        )
        shifted = warp(prev_f, disp, order=1, cval=0.0)
        num = jnp.sum(shifted * curr_f)
        den = jnp.sqrt(jnp.sum(shifted**2) * jnp.sum(curr_f**2))
        return -num / jnp.maximum(den, 1e-12)

    shifts = jnp.arange(-max_shift, max_shift + 1, 2.0)
    vx, vy = jnp.meshgrid(shifts, shifts)
    cands = jnp.stack([vx.ravel(), vy.ravel()], axis=1)
    scores = jax.vmap(objective)(cands)
    best = cands[jnp.argmin(scores)]

    # local refinement: shrink a cross pattern around the best point
    step = 1.0
    for _ in range(8):
        offsets = jnp.asarray(
            [[0, 0], [step, 0], [-step, 0], [0, step], [0, -step]],
            jnp.float32,
        )
        pts = best[None, :] + offsets
        scores = jax.vmap(objective)(pts)
        best = pts[jnp.argmin(scores)]
        step *= 0.6

    return jnp.stack(
        [jnp.full((m, n), best[0]), jnp.full((m, n), best[1])]
    )
