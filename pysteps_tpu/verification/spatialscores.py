"""
Spatial verification: FSS and binary-MSE intensity-scale decomposition
(reference: pysteps/verification/spatialscores.py).

FSS fractions are computed with box-filter convolutions (XLA convs; the
reference uses scipy.ndimage.uniform_filter); the intensity-scale skill
score uses an in-house 2-D Haar wavelet transform instead of PyWavelets.
"""

import jax
import jax.numpy as jnp
import numpy as np


def _uniform_filter(field, size):
    k = jnp.ones((size, size), jnp.float32) / (size * size)
    return jax.lax.conv_general_dilated(
        field[None, None].astype(jnp.float32), k[None, None], (1, 1), "SAME"
    )[0, 0]


def fss(X_f, X_o, thr, scale):
    """One-shot fractions skill score (reference: spatialscores.py:516)."""
    state = fss_init(thr, scale)
    fss_accum(state, X_f, X_o)
    return fss_compute(state)


def fss_init(thr, scale):
    """(reference: spatialscores.py:549)"""
    return {"thr": thr, "scale": int(scale), "sum_obs_sq": 0.0,
            "sum_fct_obs": 0.0, "sum_fct_sq": 0.0}


def fss_accum(fss, X_f, X_o):
    """(reference: spatialscores.py:572)"""
    X_f = jnp.asarray(X_f)
    X_o = jnp.asarray(X_o)
    valid = jnp.isfinite(X_f) & jnp.isfinite(X_o)
    I_f = ((X_f >= fss["thr"]) & valid).astype(jnp.float32)
    I_o = ((X_o >= fss["thr"]) & valid).astype(jnp.float32)
    if fss["scale"] > 1:
        S_f = _uniform_filter(I_f, fss["scale"])
        S_o = _uniform_filter(I_o, fss["scale"])
    else:
        S_f, S_o = I_f, I_o
    fss["sum_obs_sq"] += float(jnp.sum(S_o**2))
    fss["sum_fct_obs"] += float(jnp.sum(S_f * S_o))
    fss["sum_fct_sq"] += float(jnp.sum(S_f**2))


def fss_merge(fss_1, fss_2):
    """(reference: spatialscores.py:613)"""
    out = dict(fss_1)
    for k in ("sum_obs_sq", "sum_fct_obs", "sum_fct_sq"):
        out[k] = fss_1[k] + fss_2[k]
    return out


def fss_compute(fss):
    """(reference: spatialscores.py:657)"""
    numer = fss["sum_fct_sq"] - 2.0 * fss["sum_fct_obs"] + fss["sum_obs_sq"]
    denom = fss["sum_fct_sq"] + fss["sum_obs_sq"]
    return 1.0 - numer / max(denom, 1e-12)


def _haar_decomp(field, n_levels):
    """2-D Haar multiresolution detail energies, one per scale."""
    field = jnp.asarray(field, jnp.float32)
    details = []
    approx = field
    for _ in range(n_levels):
        a = (
            approx[0::2, 0::2] + approx[0::2, 1::2]
            + approx[1::2, 0::2] + approx[1::2, 1::2]
        ) / 4.0
        up = jnp.repeat(jnp.repeat(a, 2, axis=0), 2, axis=1)
        details.append(approx - up)
        approx = a
    details.append(approx)
    return details


def binary_mse(X_f, X_o, thr, wavelet="haar", return_scales=True):
    """Binary MSE intensity-scale decomposition
    (reference: spatialscores.py:43-177)."""
    state = binary_mse_init(thr)
    binary_mse_accum(state, X_f, X_o)
    return binary_mse_compute(state, return_scales)


def binary_mse_init(thr, wavelet="haar"):
    """(reference: spatialscores.py:103)"""
    return {"thr": thr, "mse": None, "eps": None, "n": 0}


def binary_mse_accum(bmse, X_f, X_o):
    """(reference: spatialscores.py:124)"""
    X_f = np.asarray(X_f)
    X_o = np.asarray(X_o)
    valid = np.isfinite(X_f) & np.isfinite(X_o)
    I_f = ((X_f >= bmse["thr"]) & valid).astype(np.float32)
    I_o = ((X_o >= bmse["thr"]) & valid).astype(np.float32)
    side = min(I_f.shape)
    n_levels = int(np.log2(side))
    E_d = _haar_decomp(jnp.asarray(I_f - I_o), n_levels)
    mse = np.array([float(jnp.mean(jnp.asarray(d) ** 2)) for d in E_d[:-1]])
    eps = float(np.sum(I_o) / valid.sum()) if valid.sum() else 0.0
    if bmse["mse"] is None:
        bmse["mse"] = mse
        bmse["eps"] = eps
    else:
        bmse["mse"] = bmse["mse"] + mse
        bmse["eps"] += eps
    bmse["n"] += 1


def binary_mse_merge(bmse_1, bmse_2):
    out = dict(bmse_1)
    out["mse"] = bmse_1["mse"] + bmse_2["mse"]
    out["eps"] = bmse_1["eps"] + bmse_2["eps"]
    out["n"] = bmse_1["n"] + bmse_2["n"]
    return out


def binary_mse_compute(bmse, return_scales=True):
    """Skill score SS = 1 - MSE / MSE_random per scale
    (reference: spatialscores.py:154)."""
    n = max(bmse["n"], 1)
    mse = bmse["mse"] / n
    eps = bmse["eps"] / n
    mse_random = 2.0 * eps * (1 - eps) / (len(mse))
    SS = 1.0 - mse / max(mse_random, 1e-12)
    if return_scales:
        scales = 2 ** np.arange(1, len(mse) + 1)
        return SS, scales
    return SS


def intensity_scale_init(name, thrs, scales=None, wavelet="haar"):
    """Streaming intensity-scale verification object
    (reference: spatialscores.py:97-179): a dict of per-threshold fss/bmse
    states, accumulated with intensity_scale_accum."""
    name = name.lower()
    thrs = np.atleast_1d(np.asarray(thrs, float))
    if name == "fss":
        if scales is None:
            raise ValueError("FSS needs the scales argument")
        scales = np.atleast_1d(np.asarray(scales, int))
        states = {
            float(thr): {int(s): fss_init(float(thr), int(s)) for s in scales}
            for thr in thrs
        }
    elif name == "bmse":
        scales = None  # determined by the wavelet decomposition depth
        states = {float(thr): binary_mse_init(float(thr), wavelet) for thr in thrs}
    else:
        raise ValueError(f"unknown intensity-scale score {name}")
    return {"name": name, "thrs": thrs, "scales": scales, "states": states}


def intensity_scale_accum(intscale, X_f, X_o):
    """Accumulate one forecast/observation pair into every (thr, scale) state
    (reference: spatialscores.py:182-210)."""
    for thr in intscale["thrs"]:
        state = intscale["states"][float(thr)]
        if intscale["name"] == "fss":
            for s in intscale["scales"]:
                fss_accum(state[int(s)], X_f, X_o)
        else:
            binary_mse_accum(state, X_f, X_o)
    if intscale["scales"] is None:
        # bmse: scale count known after the first accumulation
        first = intscale["states"][float(intscale["thrs"][0])]
        intscale["scales"] = 2 ** np.arange(1, len(first["mse"]) + 1)


def intensity_scale_merge(intscale_1, intscale_2):
    """Merge two accumulated intensity-scale objects (associative; the
    cross-worker reduction — reference: spatialscores.py:213-258)."""
    if intscale_1["name"] != intscale_2["name"]:
        raise ValueError(
            "cannot merge intensity-scale objects of different methods: "
            f"{intscale_1['name']} != {intscale_2['name']}"
        )
    out = {
        "name": intscale_1["name"],
        "thrs": intscale_1["thrs"],
        "scales": intscale_1["scales"],
        "states": {},
    }
    for thr in out["thrs"]:
        s1 = intscale_1["states"][float(thr)]
        s2 = intscale_2["states"][float(thr)]
        if out["name"] == "fss":
            out["states"][float(thr)] = {
                int(s): fss_merge(s1[int(s)], s2[int(s)])
                for s in out["scales"]
            }
        else:
            out["states"][float(thr)] = binary_mse_merge(s1, s2)
    return out


def intensity_scale_compute(intscale):
    """(n_scales, n_thrs) skill matrix from an accumulated object
    (reference: spatialscores.py:261-297)."""
    thrs = intscale["thrs"]
    scales = intscale["scales"]
    SS = np.zeros((len(scales), len(thrs)))
    for k, thr in enumerate(thrs):
        state = intscale["states"][float(thr)]
        if intscale["name"] == "fss":
            for j, s in enumerate(scales):
                SS[j, k] = fss_compute(state[int(s)])
        else:
            SS[:, k] = binary_mse_compute(state, return_scales=False)
    return SS


def intensity_scale(X_f, X_o, name, thrs, scales=None, wavelet="haar"):
    """Intensity-scale skill-score matrix over thresholds
    (reference: spatialscores.py:43)."""
    out = []
    for thr in np.atleast_1d(thrs):
        if name.lower() == "fss":
            row = [fss(X_f, X_o, thr, s) for s in scales]
        elif name.lower() == "bmse":
            row, scales_out = binary_mse(X_f, X_o, thr)
            scales = scales_out
        else:
            raise ValueError(f"unknown intensity-scale score {name}")
        out.append(np.asarray(row))
    return np.stack(out).T
