"""
Velocity perturbator "bps" (reference: pysteps/noise/motion.py:55-146;
Bowler, Pierce & Seed 2006).

Per-member Laplace draws come from jax.random key folding; the perturbation
field at lead time t is a fused elementwise op, so the whole ensemble's
velocity perturbations vmap into one kernel.
"""

import jax
import jax.numpy as jnp


def get_default_params_bps_par():
    """Parallel-component (a, b, c) defaults from BPS2006
    (reference: noise/motion.py:43)."""
    return (10.88, 0.23, -7.68)


def get_default_params_bps_perp():
    """Perpendicular-component (a, b, c) defaults from BPS2006
    (reference: noise/motion.py:49)."""
    return (5.76, 0.31, -2.72)


def _laplace(key, shape=()):
    # Laplace(scale=1/sqrt(2)) via inverse-CDF of uniform
    u = jax.random.uniform(key, shape, minval=-0.5 + 1e-7, maxval=0.5 - 1e-7)
    return -jnp.sign(u) * jnp.log(1.0 - 2.0 * jnp.abs(u)) / jnp.sqrt(2.0)


def initialize_bps(
    V, pixelsperkm, timestep, p_par=None, p_perp=None, randstate=None, seed=None, key=None
):
    """Build the BPS perturbator state for a (2, m, n) motion field
    (reference: noise/motion.py:55)."""
    V = jnp.asarray(V)
    if V.ndim != 3 or V.shape[0] != 2:
        raise ValueError("V must have shape (2, m, n)")
    if p_par is None:
        p_par = get_default_params_bps_par()
    if p_perp is None:
        p_perp = get_default_params_bps_perp()
    if key is None:
        key = jax.random.PRNGKey(seed if seed is not None else 0)

    k1, k2 = jax.random.split(key)
    eps_par = _laplace(k1)
    eps_perp = _laplace(k2)

    vsf = 60.0 / (timestep * pixelsperkm)  # pixel/timestep -> km/h

    N = jnp.linalg.norm(V, axis=0)
    V_n = jnp.where(N[None] > 1e-12, V / jnp.maximum(N[None], 1e-12), 0.0)

    return {
        "vsf": vsf,
        "p_par": tuple(float(p) for p in p_par),
        "p_perp": tuple(float(p) for p in p_perp),
        "eps_par": eps_par,
        "eps_perp": eps_perp,
        "V_par": V_n,
        "V_perp": jnp.stack([-V_n[1], V_n[0]]),
    }


def generate_bps(perturbator, t):
    """Perturbation field at lead time t minutes: magnitude grows as
    (a*t^b + c)/vsf along the parallel/perpendicular unit fields
    (reference: noise/motion.py:146+)."""
    vsf = perturbator["vsf"]
    a1, b1, c1 = perturbator["p_par"]
    a2, b2, c2 = perturbator["p_perp"]
    g_par = a1 * t**b1 + c1
    g_perp = a2 * t**b2 + c2
    return (
        perturbator["eps_par"] * g_par * perturbator["V_par"]
        + perturbator["eps_perp"] * g_perp * perturbator["V_perp"]
    ) / vsf
