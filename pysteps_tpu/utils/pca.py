"""
Principal-component transform for the reduced-space EnKF
(reference: pysteps/utils/pca.py:25,136).

TPU-native: SVD + matmuls in JAX; the (pixels x members) matrices involved
map straight onto the MXU.
"""

import jax.numpy as jnp


def pca_transform(data_array, n_components=None, pca_params=None):
    """Project (n_samples, n_features) data onto principal components.

    Returns (transformed, params) where params holds the mean and component
    matrix for the back-transform (reference: utils/pca.py:25).
    """
    X = jnp.asarray(data_array, jnp.float32)
    if pca_params is None:
        mean = jnp.mean(X, axis=0)
        Xc = X - mean
        # economy SVD: components are rows of Vt
        _, S, Vt = jnp.linalg.svd(Xc, full_matrices=False)
        if n_components is not None:
            Vt = Vt[:n_components]
            S = S[:n_components]
        explained_variance = (S**2) / max(X.shape[0] - 1, 1)
        pca_params = {
            "mean": mean,
            "components": Vt,
            "explained_variance": explained_variance,
        }
    transformed = (X - pca_params["mean"]) @ pca_params["components"].T
    return transformed, pca_params


def pca_backtransform(data_array, pca_params):
    """Inverse of :func:`pca_transform` (reference: utils/pca.py:136)."""
    Z = jnp.asarray(data_array, jnp.float32)
    return Z @ pca_params["components"] + pca_params["mean"]
