"""
Deterministic continuous scores (reference:
pysteps/verification/detcontscores.py) with streaming init/accum/merge/
compute using Chan et al. parallel mean/variance/covariance merges
(reference: detcontscores.py:601-626).
"""

import jax.numpy as jnp
import numpy as np


def det_cont_fct(pred, obs, scores="", axis=None, conditioning=None, thr=0.0):
    """One-shot continuous scores (reference: detcontscores.py:34)."""
    pred = jnp.asarray(pred, jnp.float32)
    obs = jnp.asarray(obs, jnp.float32)
    valid = jnp.isfinite(pred) & jnp.isfinite(obs)
    if conditioning == "single":
        valid &= (obs > thr) | (pred > thr)
    elif conditioning == "double":
        valid &= (obs > thr) & (pred > thr)
    w = valid.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(w), 1.0)
    err = jnp.where(valid, pred - obs, 0.0)
    obs_v = jnp.where(valid, obs, 0.0)
    pred_v = jnp.where(valid, pred, 0.0)

    me = jnp.sum(err) / cnt
    mae = jnp.sum(jnp.abs(err)) / cnt
    mse = jnp.sum(err**2) / cnt
    obs_mean = jnp.sum(obs_v) / cnt
    pred_mean = jnp.sum(pred_v) / cnt
    obs_var = jnp.sum(jnp.where(valid, (obs - obs_mean) ** 2, 0.0)) / cnt
    pred_var = jnp.sum(jnp.where(valid, (pred - pred_mean) ** 2, 0.0)) / cnt
    cov = jnp.sum(
        jnp.where(valid, (obs - obs_mean) * (pred - pred_mean), 0.0)
    ) / cnt

    result = {
        "ME": me,
        "MAE": mae,
        "MSE": mse,
        "RMSE": jnp.sqrt(mse),
        "NMSE": mse / jnp.maximum((obs_mean + pred_mean) ** 2 / 4.0, 1e-12),
        "DRMSE": jnp.sqrt(mse) / jnp.maximum(obs_mean, 1e-12),
        "beta1": cov / jnp.maximum(obs_var, 1e-12),
        "beta2": cov / jnp.maximum(pred_var, 1e-12),
        "corr_p": cov / jnp.maximum(jnp.sqrt(obs_var * pred_var), 1e-12),
        "corr_s": _spearman(pred, obs, valid),
        "RV": 1.0 - mse / jnp.maximum(obs_var, 1e-12),
        "scatter": _scatter(pred, obs, valid),
    }
    result = {k: float(v) for k, v in result.items()}
    if isinstance(scores, str):
        wanted = [s.strip() for s in scores.split(",")] if scores else []
    else:
        wanted = list(scores)
    if not wanted or wanted == [""]:
        return result
    picked = {k: v for k, v in result.items() if k.lower() in [s.lower() for s in wanted]}
    if len(picked) == 1:
        return list(picked.values())[0]
    return picked


def _spearman(pred, obs, valid):
    # rank correlation via double argsort over the valid samples (invalid
    # entries pushed to the end with equal ranks, cancelling in the mean)
    p = jnp.where(valid, pred, jnp.inf).ravel()
    o = jnp.where(valid, obs, jnp.inf).ravel()
    def ranks(x):
        order = jnp.argsort(x)
        r = jnp.zeros_like(order).at[order].set(jnp.arange(x.size))
        return r.astype(jnp.float32)
    rp, ro = ranks(p), ranks(o)
    w = valid.ravel().astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(w), 1.0)
    mp = jnp.sum(rp * w) / cnt
    mo = jnp.sum(ro * w) / cnt
    cov = jnp.sum((rp - mp) * (ro - mo) * w)
    vp = jnp.sum((rp - mp) ** 2 * w)
    vo = jnp.sum((ro - mo) ** 2 * w)
    return cov / jnp.maximum(jnp.sqrt(vp * vo), 1e-12)


def _scatter(pred, obs, valid):
    # half the distance between 16% and 84% quantiles of the error
    # distribution in dB (reference: detcontscores scatter definition)
    ratio = jnp.where(
        valid & (obs > 0) & (pred > 0), 10.0 * jnp.log10(pred / obs), jnp.nan
    )
    q84 = jnp.nanquantile(ratio, 0.84)
    q16 = jnp.nanquantile(ratio, 0.16)
    return (q84 - q16) / 2.0


def det_cont_fct_init(axis=None, conditioning=None, thr=0.0):
    """(reference: detcontscores.py:288)"""
    return {
        "cov": 0.0, "vobs": 0.0, "vpred": 0.0, "mobs": 0.0, "mpred": 0.0,
        "me": 0.0, "mae": 0.0, "mse": 0.0, "n": 0.0,
        "conditioning": conditioning, "thr": thr,
    }


def det_cont_fct_accum(err, pred, obs):
    """Chan parallel-merge accumulation (reference: detcontscores.py:334)."""
    pred = jnp.asarray(pred, jnp.float32)
    obs = jnp.asarray(obs, jnp.float32)
    valid = jnp.isfinite(pred) & jnp.isfinite(obs)
    if err["conditioning"] == "single":
        valid &= (obs > err["thr"]) | (pred > err["thr"])
    elif err["conditioning"] == "double":
        valid &= (obs > err["thr"]) & (pred > err["thr"])
    n_b = float(jnp.sum(valid))
    if n_b == 0:
        return
    w = valid.astype(jnp.float32)
    mobs_b = float(jnp.sum(obs * w) / n_b)
    mpred_b = float(jnp.sum(pred * w) / n_b)
    vobs_b = float(jnp.sum((obs - mobs_b) ** 2 * w) / n_b)
    vpred_b = float(jnp.sum((pred - mpred_b) ** 2 * w) / n_b)
    cov_b = float(jnp.sum((obs - mobs_b) * (pred - mpred_b) * w) / n_b)
    e = jnp.where(valid, pred - obs, 0.0)
    me_b = float(jnp.sum(e) / n_b)
    mae_b = float(jnp.sum(jnp.abs(e)) / n_b)
    mse_b = float(jnp.sum(e**2) / n_b)

    n_a = err["n"]
    n = n_a + n_b
    if n_a == 0:
        err.update(
            mobs=mobs_b, mpred=mpred_b, vobs=vobs_b, vpred=vpred_b,
            cov=cov_b, me=me_b, mae=mae_b, mse=mse_b, n=n_b,
        )
        return
    d_obs = mobs_b - err["mobs"]
    d_pred = mpred_b - err["mpred"]
    err["vobs"] = (n_a * err["vobs"] + n_b * vobs_b) / n + d_obs**2 * n_a * n_b / n**2
    err["vpred"] = (
        n_a * err["vpred"] + n_b * vpred_b
    ) / n + d_pred**2 * n_a * n_b / n**2
    err["cov"] = (
        n_a * err["cov"] + n_b * cov_b
    ) / n + d_obs * d_pred * n_a * n_b / n**2
    err["mobs"] += d_obs * n_b / n
    err["mpred"] += d_pred * n_b / n
    err["me"] += (me_b - err["me"]) * n_b / n
    err["mae"] += (mae_b - err["mae"]) * n_b / n
    err["mse"] += (mse_b - err["mse"]) * n_b / n
    err["n"] = n


def det_cont_fct_merge(err_1, err_2):
    """(reference: detcontscores.py:601)"""
    out = dict(err_1)
    n_a, n_b = err_1["n"], err_2["n"]
    if n_b == 0:
        return out
    if n_a == 0:
        return dict(err_2)
    n = n_a + n_b
    d_obs = err_2["mobs"] - err_1["mobs"]
    d_pred = err_2["mpred"] - err_1["mpred"]
    out["vobs"] = (n_a * err_1["vobs"] + n_b * err_2["vobs"]) / n + d_obs**2 * n_a * n_b / n**2
    out["vpred"] = (
        n_a * err_1["vpred"] + n_b * err_2["vpred"]
    ) / n + d_pred**2 * n_a * n_b / n**2
    out["cov"] = (
        n_a * err_1["cov"] + n_b * err_2["cov"]
    ) / n + d_obs * d_pred * n_a * n_b / n**2
    for k in ("mobs", "mpred", "me", "mae", "mse"):
        out[k] = (n_a * err_1[k] + n_b * err_2[k]) / n
    out["n"] = n
    return out


def det_cont_fct_compute(err, scores=""):
    """(reference: detcontscores.py:475)"""
    result = {
        "ME": err["me"],
        "MAE": err["mae"],
        "MSE": err["mse"],
        "RMSE": np.sqrt(err["mse"]),
        "NMSE": err["mse"] / max((err["mobs"] + err["mpred"]) ** 2 / 4.0, 1e-12),
        "DRMSE": np.sqrt(err["mse"]) / max(err["mobs"], 1e-12),
        "beta1": err["cov"] / max(err["vobs"], 1e-12),
        "beta2": err["cov"] / max(err["vpred"], 1e-12),
        "corr_p": err["cov"] / max(np.sqrt(err["vobs"] * err["vpred"]), 1e-12),
        "RV": 1.0 - err["mse"] / max(err["vobs"], 1e-12),
    }
    if isinstance(scores, str):
        wanted = [s.strip() for s in scores.split(",")] if scores else []
    else:
        wanted = list(scores)
    if not wanted or wanted == [""]:
        return result
    picked = {
        k: v for k, v in result.items() if k.lower() in [s.lower() for s in wanted]
    }
    if len(picked) == 1:
        return list(picked.values())[0]
    return picked
