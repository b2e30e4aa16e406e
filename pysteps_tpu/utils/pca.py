"""
Principal-component transform for the reduced-space EnKF
(reference: pysteps/utils/pca.py:25,136).

TPU-native: SVD + matmuls in JAX; the (members x pixels) matrices involved
map straight onto the MXU.  No sklearn dependency — the economy SVD of the
centred data reproduces sklearn.decomposition.PCA(svd_solver="full").
"""

import functools

import jax.numpy as jnp


def _fit_pca_sharded(Xc, mesh):
    """PCA fit via the Gram trick with the feature axis sharded over the
    mesh (SURVEY §2.17: the EnKF/PCA linear algebra as sharded matmuls):
    G = Xc @ Xc^T is a psum of per-shard (n_ens x n_ens) products, the
    tiny eigendecomposition is replicated, and the components come from
    one more sharded matmul.  Numerically equivalent to the SVD fit up
    to per-component sign (which cancels in transform/backtransform)."""
    import jax
    from jax.sharding import PartitionSpec as P

    axis = "y" if mesh.shape.get("y", 1) > 1 else list(mesh.shape)[0]
    n_sh = mesh.shape[axis]
    n_ens, n_feat = Xc.shape
    pad = -n_feat % n_sh
    Xp = jnp.pad(Xc, ((0, 0), (0, pad)))

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=P(None, axis), out_specs=P()
    )
    def gram(xl):
        return jax.lax.psum(xl @ xl.T, axis)

    G = gram(Xp)
    lam, U = jnp.linalg.eigh(G)
    order = jnp.argsort(lam)[::-1]
    lam = jnp.maximum(lam[order], 0.0)
    U = U[:, order]
    S = jnp.sqrt(jnp.maximum(lam, 1e-30))
    UtS = (U / S[None, :]).T  # (n_comp, n_ens)

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, axis), P()), out_specs=P(None, axis),
    )
    def components(xl, uts):
        return uts @ xl

    Vt = components(Xp, UtS)[:, :n_feat]
    var = lam / max(n_ens - 1, 1)
    return Vt, var


def pca_transform(forecast_ens, mask=None, pca_params=None, get_params=False,
                  mesh=None, **kwargs):
    """Project (n_ens, n_features) forecasts onto principal components
    (reference: utils/pca.py:25; same signature and dict keys).

    With ``mask`` (boolean, n_features), only the masked features enter
    the projection (Lien criterion pixel selection in the PCA EnKF).
    ``kwargs``: n_components (default n_ens), svd_solver (ignored — the
    full SVD always runs on the accelerator).

    Returns the transformed (n_ens, n_components) array, plus the
    ``pca_params`` dict (principal_components, mean, explained_variance)
    when ``get_params=True``.
    """
    X = jnp.asarray(forecast_ens, jnp.float32)
    if X.ndim != 2:
        raise ValueError("Input array should be two-dimensional!")

    if pca_params is None:
        n_components = kwargs.get("n_components", X.shape[0])
        mean = jnp.mean(X, axis=0)
        Xc = X - mean
        if mesh is not None:
            Vt, var = _fit_pca_sharded(Xc, mesh)
        else:
            # economy SVD: components are rows of Vt
            _, S, Vt = jnp.linalg.svd(Xc, full_matrices=False)
            var = (S**2) / max(X.shape[0] - 1, 1)
        if n_components is not None:
            Vt = Vt[:n_components]
        pca_params = {
            "principal_components": Vt,
            "mean": mean,
            "explained_variance": var / jnp.maximum(jnp.sum(var), 1e-30),
        }
    else:
        if "principal_components" not in pca_params:
            raise KeyError(
                "Output is not None but has no key 'principal_components'!"
            )
        if "mean" not in pca_params:
            raise KeyError("Output is not None but has no key 'mean'!")
        if X.shape[1] != pca_params["mean"].shape[0]:
            raise ValueError("pca mean has not the same length as the input array!")
        if X.shape[1] != pca_params["principal_components"].shape[1]:
            raise ValueError(
                "principal components have not the same length as the input array"
            )

    if mask is None:
        transformed = (X - pca_params["mean"]) @ pca_params["principal_components"].T
    else:
        mask = jnp.asarray(mask, bool)
        transformed = (
            (X[:, mask] - pca_params["mean"][mask])
            @ pca_params["principal_components"][:, mask].T
        )

    if get_params:
        return transformed, pca_params
    return transformed


def pca_backtransform(forecast_ens_pc, pca_params):
    """Inverse of :func:`pca_transform` (reference: utils/pca.py:136)."""
    Z = jnp.asarray(forecast_ens_pc, jnp.float32)
    return Z @ pca_params["principal_components"] + pca_params["mean"]
