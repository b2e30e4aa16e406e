"""
DARTS spectral optical flow (reference: pysteps/motion/darts.py:22-244;
Ruzanski, Chandrasekar & Wang 2011).

TPU-native: the reference's per-row Python loops building the (m, n) DARTS
system become one batched modular gather from the 3-D DFT plus broadcast
multiplies; the normal-equation solve is a small complex SVD.  The whole
solver is a single jitted function.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(
    jax.jit, static_argnames=("N_x", "N_y", "N_t", "M_x", "M_y", "output_type")
)
def _darts_core(input_images, N_x, N_y, N_t, M_x, M_y, output_type):
    # time axis last: (m, n, T)
    F = jnp.moveaxis(input_images, 0, 2)
    T_y, T_x, T_t = F.shape
    F = jnp.fft.fftn(F)

    m = (2 * N_x + 1) * (2 * N_y + 1) * (2 * N_t + 1)
    n = (2 * M_x + 1) * (2 * M_y + 1)

    k_t, k_y, k_x = np.unravel_index(
        np.arange(m), (2 * N_t + 1, 2 * N_y + 1, 2 * N_x + 1)
    )
    k_x = jnp.asarray(k_x - N_x)
    k_y = jnp.asarray(k_y - N_y)
    k_t = jnp.asarray(k_t - N_t)
    kp_y, kp_x = np.unravel_index(np.arange(n), (2 * M_y + 1, 2 * M_x + 1))
    kp_x = jnp.asarray(kp_x - M_x)
    kp_y = jnp.asarray(kp_y - M_y)

    # y-vector: modular gather of the input DFT
    y = k_t * F[k_y % T_y, k_x % T_x, k_t % T_t]

    # H-matrix: (m, n) gathers at shifted wavenumbers
    i_ = k_y[:, None] - kp_y[None, :]
    j_ = k_x[:, None] - kp_x[None, :]
    R_ = F[i_ % T_y, j_ % T_x, (k_t % T_t)[:, None]]
    c1 = -1.0 * T_t / (T_x * T_y)
    A = (c1 / T_y) * i_ * R_
    B = (c1 / T_x) * j_ * R_

    # least squares via SVD pseudoinverse of the normal equations
    M = jnp.concatenate([A, B], axis=1)
    M_ct = jnp.conjugate(M).T
    MM = M_ct @ M
    U_s, s, Vh = jnp.linalg.svd(MM, full_matrices=False)
    s_inv = jnp.where(s > 0.01 * s[0], 1.0 / jnp.maximum(s, 1e-30), 0.0)
    MM_inv = jnp.conjugate(Vh).T @ jnp.diag(s_inv.astype(MM.dtype)) @ jnp.conjugate(U_s).T
    x = MM_inv @ (M_ct @ y)

    h, w = 2 * M_y + 1, 2 * M_x + 1
    V_spec = x[: h * w].reshape(h, w)
    U_spec = x[h * w :].reshape(h, w)

    if output_type == "spectral":
        return jnp.stack([U_spec, V_spec])

    ky_grid, kx_grid = np.meshgrid(
        np.arange(-M_y, M_y + 1), np.arange(-M_x, M_x + 1), indexing="ij"
    )
    full_U = jnp.zeros((T_y, T_x), jnp.complex64).at[
        ky_grid % T_y, kx_grid % T_x
    ].set(U_spec)
    full_V = jnp.zeros((T_y, T_x), jnp.complex64).at[
        ky_grid % T_y, kx_grid % T_x
    ].set(V_spec)
    U = jnp.real(jnp.fft.ifft2(full_U))
    V = jnp.real(jnp.fft.ifft2(full_V))
    return jnp.stack([U, V])


def DARTS(input_images, **kwargs):
    """DARTS advection field from a (T, m, n) sequence
    (reference: motion/darts.py:22).  Returns (2, m, n) in pixels/timestep."""
    N_x = kwargs.get("N_x", 50)
    N_y = kwargs.get("N_y", 50)
    N_t = kwargs.get("N_t", 4)
    M_x = kwargs.get("M_x", 2)
    M_y = kwargs.get("M_y", 2)
    output_type = kwargs.get("output_type", "spatial")
    verbose = kwargs.get("verbose", True)

    input_images = jnp.asarray(input_images, jnp.float32)
    if N_t >= input_images.shape[0] - 1:
        raise ValueError(f"N_t={N_t} >= T-1={input_images.shape[0] - 1}")
    if output_type not in ("spatial", "spectral"):
        raise ValueError(f"invalid output_type {output_type}")
    # clamp spectral truncation to the domain size
    T, m, n = input_images.shape
    N_y = min(N_y, (m - 1) // 2)
    N_x = min(N_x, (n - 1) // 2)
    N_t = min(N_t, T - 2)

    if verbose:
        print("Computing the motion field with the DARTS method.")
    return _darts_core(input_images, N_x, N_y, N_t, M_x, M_y, output_type)
