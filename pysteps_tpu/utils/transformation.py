"""
Invertible intensity transforms with metadata bookkeeping
(reference: pysteps/utils/transformation.py).

All transforms are pure jnp elementwise ops (``jnp.where`` instead of boolean
assignment) so they can live inside jitted pipelines; metadata handling stays
host-side.  NQT keeps its sorted-quantile tables as arrays rather than a
scipy interp1d object so the inverse is also jittable.
"""

import jax.numpy as jnp
import jax.scipy.stats as jstats
import numpy as np


def dB_transform(R, metadata=None, threshold=None, zerovalue=None, inverse=False):
    """dB transform of rain rates (reference: transformation.py:150).

    Forward: R >= threshold -> 10 log10 R, else ``zerovalue``
    (default threshold_dB - 5).  Inverse: 10^(R/10) with thresholding.
    """
    R = jnp.asarray(R)
    metadata = dict(metadata) if metadata is not None else (
        {"transform": "dB"} if inverse else {"transform": None}
    )

    if not inverse:
        if metadata.get("transform") == "dB":
            return R, metadata
        if threshold is None:
            threshold = metadata.get("threshold", 0.1)
        zeros = R < threshold
        R = jnp.where(zeros, 0.0, R)  # avoid log10(<=0) NaNs under jit
        threshold_db = 10.0 * np.log10(threshold)
        if zerovalue is None:
            zerovalue = threshold_db - 5
        R = jnp.where(zeros, zerovalue, 10.0 * jnp.log10(jnp.where(zeros, 1.0, R)))
        metadata.update(transform="dB", zerovalue=zerovalue, threshold=threshold_db)
        return R, metadata

    if metadata.get("transform") != "dB":
        return R, metadata
    if threshold is None:
        threshold = metadata.get("threshold", -10.0)
    if zerovalue is None:
        zerovalue = 0.0
    R = 10.0 ** (R / 10.0)
    threshold_lin = 10.0 ** (threshold / 10.0)
    R = jnp.where(R < threshold_lin, zerovalue, R)
    metadata.update(transform=None, threshold=threshold_lin, zerovalue=zerovalue)
    return R, metadata


def boxcox_transform(
    R, metadata=None, Lambda=None, threshold=None, zerovalue=None, inverse=False
):
    """One-parameter Box-Cox transform; Lambda=0 is the log transform
    (reference: transformation.py:27)."""
    R = jnp.asarray(R)
    metadata = dict(metadata) if metadata is not None else (
        {"transform": "BoxCox"} if inverse else {"transform": None}
    )

    if not inverse:
        if metadata.get("transform") == "BoxCox":
            return R, metadata
        if Lambda is None:
            Lambda = metadata.get("BoxCox_lambda", 0.0)
        if threshold is None:
            threshold = metadata.get("threshold", 0.1)
        zeros = R < threshold
        Rsafe = jnp.where(zeros, 1.0, R)
        if Lambda == 0.0:
            Rt = jnp.log(Rsafe)
            threshold_t = np.log(threshold)
        else:
            Rt = (Rsafe**Lambda - 1) / Lambda
            threshold_t = (threshold**Lambda - 1) / Lambda
        if zerovalue is None:
            zerovalue = threshold_t - 1
        R = jnp.where(zeros, zerovalue, Rt)
        metadata.update(
            transform="BoxCox",
            BoxCox_lambda=Lambda,
            zerovalue=zerovalue,
            threshold=threshold_t,
        )
        return R, metadata

    if metadata.get("transform") not in ["BoxCox", "log"]:
        return R, metadata
    if Lambda is None:
        Lambda = metadata.pop("BoxCox_lambda", 0.0)
    if threshold is None:
        threshold = metadata.get("threshold", -10.0)
    if zerovalue is None:
        zerovalue = 0.0
    if Lambda == 0.0:
        R = jnp.exp(R)
        threshold_lin = np.exp(threshold)
    else:
        R = jnp.exp(jnp.log(Lambda * R + 1) / Lambda)
        threshold_lin = np.exp(np.log(Lambda * threshold + 1) / Lambda)
    R = jnp.where(R < threshold_lin, zerovalue, R)
    metadata.update(transform=None, zerovalue=zerovalue, threshold=threshold_lin)
    return R, metadata


def sqrt_transform(R, metadata=None, inverse=False, **kwargs):
    """Square-root transform (reference: transformation.py:329)."""
    R = jnp.asarray(R)
    if metadata is None:
        metadata = {"transform": "sqrt" if inverse else None}
        metadata["zerovalue"] = np.nan
        metadata["threshold"] = np.nan
    else:
        metadata = dict(metadata)
    if not inverse:
        R = jnp.sqrt(R)
        metadata.update(
            transform="sqrt",
            zerovalue=np.sqrt(metadata["zerovalue"]),
            threshold=np.sqrt(metadata["threshold"]),
        )
    else:
        R = R**2
        metadata.update(
            transform=None,
            zerovalue=metadata["zerovalue"] ** 2,
            threshold=metadata["threshold"] ** 2,
        )
    return R, metadata


def NQ_transform(R, metadata=None, inverse=False, **kwargs):
    """Normal-quantile transform (reference: transformation.py:237).

    The inverse mapping is stored in metadata as two sorted arrays
    ("nqt_quantiles", "nqt_values") used with jnp.interp, rather than a scipy
    interp1d object, so both directions are device-computable.
    """
    a = kwargs.get("a", 0.0)
    R = jnp.asarray(R, dtype=jnp.float32)
    shape0 = R.shape
    Rflat = R.ravel()
    finite = jnp.isfinite(Rflat)

    if metadata is None:
        metadata = {"transform": "NQT" if inverse else None}
        metadata["zerovalue"] = float(jnp.nanmin(Rflat))
    else:
        metadata = dict(metadata)

    if not inverse:
        n = Rflat.size
        pp = (jnp.arange(n) + 1 - a) / (n + 1 - 2 * a)
        Rqn = jstats.norm.ppf(pp)
        # NaNs sort to the end; interp against the sorted finite values
        Rsorted = jnp.sort(jnp.where(finite, Rflat, jnp.inf))
        Rt = jnp.interp(Rflat, Rsorted, Rqn)
        Rt = jnp.where(Rflat == metadata["zerovalue"], 0.0, Rt)
        Rt = jnp.where(finite, Rt, jnp.nan)
        metadata["nqt_quantiles"] = Rqn
        metadata["nqt_values"] = Rsorted
        metadata["transform"] = "NQT"
        metadata["zerovalue"] = 0
        pos = Rt > 0
        metadata["threshold"] = float(jnp.min(jnp.where(pos, Rt, jnp.inf)))
        return Rt.reshape(shape0), metadata

    qs = metadata.pop("nqt_quantiles")
    vals = metadata.pop("nqt_values")
    Rb = jnp.interp(Rflat, qs, vals)
    Rb = jnp.where(finite, Rb, jnp.nan)
    metadata["transform"] = None
    metadata["zerovalue"] = float(jnp.nanmin(Rb))
    wet = Rb > metadata["zerovalue"]
    metadata["threshold"] = float(jnp.min(jnp.where(wet, Rb, jnp.inf)))
    return Rb.reshape(shape0), metadata
