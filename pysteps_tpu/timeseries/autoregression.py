"""
AR(p)/VAR(p) estimation and iteration
(reference: pysteps/timeseries/autoregression.py).

The iteration (`iterate_ar_model`) is the per-step inner op of
STEPS/S-PROG/ANVIL: a fused multiply-add over the cascade stack, written to
broadcast over arbitrary leading batch axes (levels, members) so a whole
ensemble's AR update is one fused XLA kernel.  Estimation (Yule-Walker
solves of p x p systems) happens once at init; the *localized* variants keep
per-pixel parameter maps and vmap the tiny solves over pixels.
"""

import jax
import jax.numpy as jnp
import numpy as np


def adjust_lag2_corrcoef1(gamma_1, gamma_2):
    """Simple stationarity clamp for lag-2 autocorrelation
    (reference: autoregression.py:31)."""
    gamma_2 = jnp.maximum(gamma_2, 2 * gamma_1 * gamma_1 - 1 + 1e-10)
    return jnp.minimum(gamma_2, 1 - 1e-10)


def adjust_lag2_corrcoef2(gamma_1, gamma_2):
    """Advanced stationarity clamp (reference: autoregression.py:55).

    gamma_1 is clipped into (-1, 1) so the (1-gamma_1^2)^1.5 term stays
    real when float error pushes a perfectly persistent correlation past 1.
    """
    gamma_1 = jnp.clip(gamma_1, -0.9999, 0.9999)
    gamma_2 = jnp.maximum(gamma_2, 2 * gamma_1 * gamma_2 - 1)
    gamma_2 = jnp.maximum(
        gamma_2,
        (3 * gamma_1**2 - 2 + 2 * (1 - gamma_1**2) ** 1.5)
        / jnp.maximum(gamma_1**2, 1e-8),
    )
    return gamma_2


def estimate_ar_params_yw(gamma, d=0, check_stationarity=True):
    """Yule-Walker AR(p) fit from lag-l autocorrelations
    (reference: autoregression.py:402).

    Returns array of length p+1: phi_1..phi_p plus the innovation
    coefficient phi_pert = sqrt(1 - sum gamma_j phi_j) (Pulkkinen 2019 eq 6).
    Accepts gamma with optional leading batch axes (..., p): batched solves.
    """
    if d not in (0, 1):
        raise ValueError(f"d = {d}, but 0 or 1 required")
    gamma = jnp.asarray(gamma)
    # keep the Toeplitz system non-singular when lag correlations reach
    # exactly +/-1 (perfectly persistent inputs)
    gamma = jnp.clip(gamma, -0.9985, 0.9985)
    p = gamma.shape[-1]
    # Toeplitz system G phi = gamma with G[i,j] = gamma_|i-j|, gamma_0 = 1
    g = jnp.concatenate([jnp.ones(gamma.shape[:-1] + (1,)), gamma], axis=-1)
    idx = np.abs(np.subtract.outer(np.arange(p), np.arange(p)))
    G = g[..., idx]
    phi = jnp.linalg.solve(G, gamma[..., None])[..., 0]
    if check_stationarity and gamma.ndim == 1:
        if not test_ar_stationarity(np.asarray(phi)):
            raise RuntimeError("nonstationary AR(p) process")
    c = 1.0 - jnp.sum(gamma * phi, axis=-1)
    phi_pert = jnp.sqrt(jnp.maximum(c, 0.0))
    if d == 1:
        phi = _differenced_to_undifferenced(phi)
    return jnp.concatenate([phi, phi_pert[..., None]], axis=-1)


def estimate_ar_params_yw_localized(gamma, d=0):
    """Per-pixel Yule-Walker fit: gamma is a list/stack of (m, n) lag maps
    (reference: autoregression.py:479).  Returns (p+1, m, n)."""
    gamma = jnp.stack(gamma) if isinstance(gamma, (list, tuple)) else jnp.asarray(gamma)
    # (p, m, n) -> (m, n, p) batched solve
    out = estimate_ar_params_yw(
        jnp.moveaxis(gamma, 0, -1), d=d, check_stationarity=False
    )
    return jnp.moveaxis(out, -1, 0)


def _differenced_to_undifferenced(phi):
    """Convert AR params fitted on the differenced series to ARI(p,1) params
    on the original series (reference: autoregression.py:1199 for q=d=1):
    x_t = x_{t-1} + sum phi_i (x_{t-i} - x_{t-i-1})."""
    p = phi.shape[-1]
    # polynomial multiply (1 - sum phi_i B^i)(1 - B) -> coefficients on B^1..B^(p+1)
    out = jnp.zeros(phi.shape[:-1] + (p + 1,))
    out = out.at[..., 0].set(1.0 + phi[..., 0])
    if p > 1:
        out = out.at[..., 1:p].set(phi[..., 1:] - phi[..., :-1])
    out = out.at[..., p].set(-phi[..., p - 1])
    return out


def estimate_ar_params_ols(
    x, p, d=0, check_stationarity=True, include_constant_term=False, h=0, lam=0.0
):
    """OLS AR(p) fit from a sample time series of shape (n, ...)
    (reference: autoregression.py:123)."""
    x = jnp.asarray(x)
    if d == 1:
        x = jnp.diff(x, axis=0)
    n = x.shape[0]
    if n < p + 1:
        raise ValueError(f"n={n} samples insufficient for AR({p}) OLS fit")
    # build design matrix from lagged flattened fields
    flat = x.reshape(n, -1)
    rows = []
    targets = []
    for k in range(p, n):
        rows.append(jnp.stack([flat[k - i - 1] for i in range(p)], axis=-1))
        targets.append(flat[k])
    X = jnp.concatenate(rows, axis=0)  # (N, p)
    y = jnp.concatenate(targets, axis=0)
    if include_constant_term:
        X = jnp.concatenate([X, jnp.ones((X.shape[0], 1))], axis=1)
    XtX = X.T @ X + lam * jnp.eye(X.shape[1])
    phi = jnp.linalg.solve(XtX, X.T @ y)
    resid = y - X @ phi
    phi_pert = jnp.std(resid)
    phi_main = phi[:p]
    if check_stationarity and not test_ar_stationarity(np.asarray(phi_main)):
        raise RuntimeError("nonstationary AR(p) process")
    if d == 1:
        phi_main = _differenced_to_undifferenced(phi_main)
    return jnp.concatenate([phi_main, jnp.array([phi_pert])])


def estimate_ar_params_ols_localized(
    x, p, window_radius, d=0, include_constant_term=False, h=0, lam=0.0,
    window="gaussian",
):
    """Per-pixel OLS AR(p) fit with Gaussian moving-window weighting
    (reference: autoregression.py:235).  x: (n, m, n_cols).
    Returns (p+1, m, n_cols) parameter maps (last = innovation std)."""
    import jax

    x = jnp.asarray(x)
    if d == 1:
        x = jnp.diff(x, axis=0)
    n = x.shape[0]
    if n < p + 1:
        raise ValueError(f"{n} samples insufficient for AR({p})")

    from pysteps_tpu.timeseries.correlation import (
        _gaussian_kernel1d,
        _sep_conv2d,
        _uniform_kernel1d,
    )

    k1d = (
        _gaussian_kernel1d(window_radius)
        if window == "gaussian"
        else _uniform_kernel1d(window_radius)
    )
    smooth = lambda f: _sep_conv2d(f, k1d)  # noqa: E731

    # localized normal equations: A[i,j] = <x_{t-i-1} x_{t-j-1}>_w,
    # b[i] = <x_t x_{t-i-1}>_w, accumulated over time
    A = jnp.zeros((p, p) + x.shape[1:])
    b = jnp.zeros((p,) + x.shape[1:])
    for t in range(p, n):
        for i in range(p):
            b = b.at[i].add(smooth(x[t] * x[t - i - 1]))
            for j in range(i, p):
                val = smooth(x[t - i - 1] * x[t - j - 1])
                A = A.at[i, j].add(val)
                if j != i:
                    A = A.at[j, i].add(val)
    A = A + lam * jnp.eye(p)[..., None, None]
    # per-pixel p x p solve
    A_px = jnp.moveaxis(A.reshape(p, p, -1), -1, 0)
    b_px = jnp.moveaxis(b.reshape(p, -1), -1, 0)
    phi_px = jnp.linalg.solve(A_px, b_px[..., None])[..., 0]
    phi = jnp.moveaxis(phi_px, 0, -1).reshape((p,) + x.shape[1:])
    # innovation std from localized residual power
    resid_pow = jnp.zeros(x.shape[1:])
    for t in range(p, n):
        pred = sum(phi[i] * x[t - i - 1] for i in range(p))
        resid_pow = resid_pow + smooth((x[t] - pred) ** 2)
    phi_pert = jnp.sqrt(resid_pow / max(n - p, 1))
    if d == 1:
        phi = _differenced_to_undifferenced(jnp.moveaxis(phi, 0, -1))
        phi = jnp.moveaxis(phi, -1, 0)
    return jnp.concatenate([phi, phi_pert[None]], axis=0)


def estimate_var_params_ols(
    x, p, d=0, check_stationarity=True, include_constant_term=False, h=0, lam=0.0
):
    """OLS VAR(p) fit from a (n, q, ...) q-variate series
    (reference: autoregression.py:558).  Returns a list of (q, q) matrices
    Phi_1..Phi_p plus the innovation covariance factor."""
    x = jnp.asarray(x)
    if d == 1:
        x = jnp.diff(x, axis=0)
    n, q = x.shape[:2]
    flat = x.reshape(n, q, -1)
    X_rows, Y_rows = [], []
    for t in range(p, n):
        X_rows.append(
            jnp.concatenate([flat[t - i - 1] for i in range(p)], axis=0).T
        )  # (npix, q*p)
        Y_rows.append(flat[t].T)  # (npix, q)
    X = jnp.concatenate(X_rows, axis=0)
    Y = jnp.concatenate(Y_rows, axis=0)
    XtX = X.T @ X + lam * jnp.eye(q * p)
    B = jnp.linalg.solve(XtX, X.T @ Y)  # (q*p, q)
    phi = [B[i * q : (i + 1) * q].T for i in range(p)]
    resid = Y - X @ B
    sigma = resid.T @ resid / max(X.shape[0] - 1, 1)
    w, V = jnp.linalg.eigh((sigma + sigma.T) / 2)
    phi.append(V @ jnp.diag(jnp.sqrt(jnp.maximum(w, 0.0))) @ V.T)
    if check_stationarity and not test_var_stationarity(
        [np.asarray(m) for m in phi[:p]]
    ):
        raise RuntimeError("nonstationary VAR(p) process")
    return phi


def estimate_var_params_ols_localized(
    x, p, window_radius, d=0, include_constant_term=False, h=0, lam=0.0,
    window="gaussian",
):
    """Per-pixel OLS VAR(p) fit with moving-window weighting
    (reference: autoregression.py:676-858).

    x: (n, q, m, n_cols) q-variate series of length n = p+d+h+1.
    Returns [c?, Phi_1..Phi_p, Phi_p+1] with each Phi of shape
    (q, q, m, n_cols) (the constant c, if requested, is (q, m, n_cols));
    Phi_p+1 is zeros, matching the reference.
    """
    x = jnp.asarray(x)
    n, q = x.shape[:2]
    if n != p + d + h + 1:
        raise ValueError(f"n={n} but n = p+d+h+1 = {p + d + h + 1} required")
    if d == 1:
        x = jnp.diff(x, axis=0)
        n -= 1
    spatial = x.shape[2:]

    from pysteps_tpu.timeseries.correlation import (
        _gaussian_kernel1d,
        _sep_conv2d,
        _uniform_kernel1d,
    )

    k1d = (
        _gaussian_kernel1d(window_radius)
        if window == "gaussian"
        else _uniform_kernel1d(window_radius)
    )
    smooth = lambda f: _sep_conv2d(f, k1d)  # noqa: E731

    nc = p * q + (1 if include_constant_term else 0)
    # localized normal equations per pixel: B = XZ Z2^{-1}
    # XZ[a, (k,b)]  = sum_l < x[p+l, a] * x[p-1-k+l, b] >_w
    # Z2[(i,a),(k,b)] = sum_l < x[p-1-i+l, a] * x[p-1-k+l, b] >_w
    XZ = jnp.zeros((q, nc) + spatial)
    Z2 = jnp.zeros((nc, nc) + spatial)
    off = 1 if include_constant_term else 0
    for l in range(h + 1):
        if include_constant_term:
            Z2 = Z2.at[0, 0].add(smooth(jnp.ones(spatial)))
            for i in range(p):
                for a in range(q):
                    s = smooth(x[p - 1 - i + l, a])
                    Z2 = Z2.at[0, off + i * q + a].add(s)
                    Z2 = Z2.at[off + i * q + a, 0].add(s)
            for a in range(q):
                XZ = XZ.at[a, 0].add(smooth(x[p + l, a]))
        for a in range(q):
            for k in range(p):
                for b in range(q):
                    XZ = XZ.at[a, off + k * q + b].add(
                        smooth(x[p + l, a] * x[p - 1 - k + l, b])
                    )
        for i in range(p):
            for a in range(q):
                for k in range(p):
                    for b in range(q):
                        if (k, b) < (i, a):
                            continue  # filled by the symmetric copy below
                        s = smooth(x[p - 1 - i + l, a] * x[p - 1 - k + l, b])
                        Z2 = Z2.at[off + i * q + a, off + k * q + b].add(s)
                        if (i, a) != (k, b):
                            Z2 = Z2.at[off + k * q + b, off + i * q + a].add(s)

    # batched per-pixel solve: B Z2 = XZ  <=>  Z2^T B^T = XZ^T
    Z2_px = jnp.moveaxis(Z2.reshape(nc, nc, -1), -1, 0)
    Z2_px = Z2_px + lam * jnp.eye(nc)
    XZ_px = jnp.moveaxis(XZ.reshape(q, nc, -1), -1, 0)
    Bt = jnp.linalg.solve(jnp.swapaxes(Z2_px, -1, -2), jnp.swapaxes(XZ_px, -1, -2))
    B = jnp.moveaxis(jnp.swapaxes(Bt, -1, -2), 0, -1).reshape((q, nc) + spatial)

    out = []
    if include_constant_term:
        out.append(B[:, 0])
    phi = [B[:, off + k * q : off + (k + 1) * q] for k in range(p)]
    if d == 1:
        # undifference: x_t = x_{t-1} + sum phi_i dx_{t-i}  (as in the AR case)
        phi_u = [phi[0] + jnp.eye(q)[..., None, None]]
        for i in range(1, p):
            phi_u.append(phi[i] - phi[i - 1])
        phi_u.append(-phi[p - 1])
        phi = phi_u
    out.extend(phi)
    out.append(jnp.zeros((q, q) + spatial))
    return out


def estimate_var_params_yw_localized(gamma, d=0):
    """Per-pixel Yule-Walker VAR fit from localized correlation-matrix maps
    (reference: autoregression.py:939).  gamma: list of (q, q, m, n) maps."""
    gamma = [jnp.asarray(g) for g in gamma]
    q = gamma[0].shape[0]
    p = len(gamma) - 1
    spatial = gamma[0].shape[2:]
    # per-pixel block system
    G = jnp.zeros((p * q, p * q) + spatial)
    for i in range(p):
        for j in range(p):
            blk = gamma[abs(i - j)]
            if i > j:
                blk = jnp.swapaxes(blk, 0, 1)
            G = G.at[i * q : (i + 1) * q, j * q : (j + 1) * q].set(blk)
    b = jnp.concatenate(
        [jnp.swapaxes(gamma[i], 0, 1) for i in range(1, p + 1)], axis=0
    )
    G_px = jnp.moveaxis(G.reshape(p * q, p * q, -1), -1, 0)
    b_px = jnp.moveaxis(b.reshape(p * q, q, -1), -1, 0)
    x_px = jnp.linalg.solve(G_px, b_px)
    x = jnp.moveaxis(x_px, 0, -1).reshape((p * q, q) + spatial)
    phi = [x[i * q : (i + 1) * q] for i in range(p)]
    phi.append(jnp.zeros((q, q) + spatial))
    return phi


def iterate_ar_model(x, phi, eps=None):
    """One AR(p) step over a sliding window stack
    (reference: autoregression.py:1020).

    x: (..., p, m, n) window of the p most recent states (oldest first).
    phi: (..., p+1) parameters broadcastable against x's leading axes.
    eps: optional innovation (..., m, n).
    Returns the shifted window with the new state appended.
    """
    x = jnp.asarray(x)
    phi = jnp.asarray(phi)
    p = x.shape[-3]
    # lag i uses x[..., -(i+1), :, :] and phi[..., i]
    coeffs = phi[..., :p][..., ::-1]  # align oldest-first window
    x_new = jnp.sum(x * coeffs[..., :, None, None], axis=-3)
    if eps is not None:
        x_new = x_new + phi[..., -1:, None] * eps
    return jnp.concatenate([x[..., 1:, :, :], x_new[..., None, :, :]], axis=-3)


def iterate_var_model(x, phi, eps=None):
    """One VAR(p) step (reference: autoregression.py:1076).

    x: (p, q, ...) window; phi: list of (q, q) matrices (p+1 of them).
    """
    x = jnp.asarray(x)
    p = len(phi) - 1
    x_new = jnp.zeros(x.shape[1:])
    for l in range(p):
        x_new = x_new + jnp.einsum("ij,j...->i...", phi[l], x[-(l + 1)])
    if eps is not None:
        x_new = x_new + jnp.einsum("ij,j...->i...", phi[-1] @ phi[-1], eps)
    return jnp.concatenate([x[1:], x_new[None]], axis=0)


def estimate_var_params_yw(gamma, d=0, check_stationarity=True):
    """Yule-Walker VAR(p) fit from lag-l cross-correlation matrices
    (reference: autoregression.py:854).  gamma: list of (q, q) matrices
    Gamma_0..Gamma_p."""
    q = gamma[0].shape[0]
    p = len(gamma) - 1
    G = jnp.block(
        [
            [gamma[abs(i - j)].T if i > j else gamma[abs(i - j)] for j in range(p)]
            for i in range(p)
        ]
    )
    b = jnp.concatenate([gamma[i].T for i in range(1, p + 1)], axis=0)
    x = jnp.linalg.solve(G, b)
    phi = [x[i * q : (i + 1) * q, :] for i in range(p)]
    if check_stationarity and not test_var_stationarity(
        [np.asarray(m) for m in phi]
    ):
        raise RuntimeError("nonstationary VAR(p) process")
    # innovation matrix: zero, as in the reference (estimation not implemented)
    phi.append(jnp.zeros((q, q)))
    return phi


def ar_acf(gamma, n=None):
    """Extend lag-correlations to the theoretical ACF of the fitted AR(p)
    (reference: autoregression.py:81)."""
    gamma = list(np.asarray(g) for g in np.atleast_1d(np.asarray(gamma)))
    ar_order = len(gamma)
    if n is None or n == ar_order:
        return gamma
    if n < ar_order:
        raise ValueError(f"n={n} must be larger than the AR order {ar_order}")
    phi = np.asarray(estimate_ar_params_yw(jnp.asarray(gamma)))[:-1]
    acf = [float(g) for g in gamma]
    for t in range(n - ar_order):
        gammas = np.array(acf[t : t + ar_order])[::-1]
        acf.append(float(np.sum(gammas * phi)))
    return acf


def test_ar_stationarity(phi):
    """Check the AR(p) characteristic roots lie inside the unit circle
    (reference: autoregression.py:1138)."""
    phi = np.asarray(phi)
    p = len(phi)
    if p == 0:
        return True
    companion = np.zeros((p, p))
    companion[0, :] = phi
    if p > 1:
        companion[1:, :-1] = np.eye(p - 1)
    return bool(np.all(np.abs(np.linalg.eigvals(companion)) < 1.0))


def test_var_stationarity(phi):
    """VAR stationarity via the block-companion spectral radius
    (reference: autoregression.py:1164)."""
    phi = [np.asarray(m) for m in phi]
    q = phi[0].shape[0]
    p = len(phi)
    top = np.concatenate(phi, axis=1)
    comp = np.zeros((p * q, p * q))
    comp[:q, :] = top
    if p > 1:
        comp[q:, :-q] = np.eye((p - 1) * q)
    return bool(np.all(np.abs(np.linalg.eigvals(comp)) < 1.0))
