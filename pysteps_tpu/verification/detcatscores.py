"""
Deterministic categorical scores from a 2x2 contingency table
(reference: pysteps/verification/detcatscores.py:23-403).

Streaming protocol: det_cat_fct_init / accum / merge / compute.  The accum
is a fused jnp reduction; merge is associative addition (maps to psum
across hosts).
"""

import jax.numpy as jnp
import numpy as np


def det_cat_fct(pred, obs, thr, scores="", axis=None):
    """One-shot scores (reference: detcatscores.py:23)."""
    contab = det_cat_fct_init(thr, axis=axis)
    det_cat_fct_accum(contab, pred, obs)
    return det_cat_fct_compute(contab, scores)


def det_cat_fct_init(thr, axis=None):
    """(reference: detcatscores.py:100)"""
    return {
        "hits": None,
        "false_alarms": None,
        "misses": None,
        "correct_negatives": None,
        "thr": thr,
        "axis": axis,
    }


def det_cat_fct_accum(contab, pred, obs):
    """(reference: detcatscores.py:133)"""
    pred = jnp.asarray(pred)
    obs = jnp.asarray(obs)
    axis = contab["axis"]
    if axis is None:
        axis = tuple(range(pred.ndim))
    thr = contab["thr"]
    valid = jnp.isfinite(pred) & jnp.isfinite(obs)
    predb = (pred > thr) & valid
    obsb = (obs > thr) & valid
    H = jnp.sum(predb & obsb, axis=axis)
    F = jnp.sum(predb & ~obsb & valid, axis=axis)
    M = jnp.sum(~predb & obsb & valid, axis=axis)
    R = jnp.sum(~predb & ~obsb & valid, axis=axis)
    for key, val in zip(
        ("hits", "false_alarms", "misses", "correct_negatives"), (H, F, M, R)
    ):
        contab[key] = val if contab[key] is None else contab[key] + val


def det_cat_fct_merge(contab_1, contab_2):
    """(reference: detcatscores.py:207)"""
    out = dict(contab_1)
    for key in ("hits", "false_alarms", "misses", "correct_negatives"):
        out[key] = contab_1[key] + contab_2[key]
    return out


def det_cat_fct_compute(contab, scores=""):
    """(reference: detcatscores.py:266)"""
    if isinstance(scores, str):
        scores = [s.strip() for s in scores.split(",")] if scores else [""]
    H = jnp.asarray(contab["hits"], jnp.float64 if False else jnp.float32)
    F = jnp.asarray(contab["false_alarms"], jnp.float32)
    M = jnp.asarray(contab["misses"], jnp.float32)
    R = jnp.asarray(contab["correct_negatives"], jnp.float32)
    N = H + F + M + R

    result = {}
    for score in scores:
        s = score.lower()
        if s in ("pod", ""):
            result["POD"] = _f(H / (H + M))
        if s in ("far", ""):
            result["FAR"] = _f(F / (H + F))
        if s in ("fa", ""):
            result["FA"] = _f(F / (F + R))
        if s in ("acc", ""):
            result["ACC"] = _f((H + R) / N)
        if s in ("csi", ""):
            result["CSI"] = _f(H / (H + M + F))
        if s in ("bias", ""):
            result["BIAS"] = _f((H + F) / (H + M))
        if s in ("hss", ""):
            result["HSS"] = _f(
                2 * (H * R - F * M) / ((H + M) * (M + R) + (H + F) * (F + R))
            )
        if s in ("hk", ""):
            result["HK"] = _f(H / (H + M) - F / (F + R))
        if s in ("gss", "ets", ""):
            HR = (H + M) * (H + F) / N
            result["GSS" if s in ("gss", "") else "ETS"] = _f(
                (H - HR) / (H + M + F - HR)
            )
        if s in ("f1", ""):
            result["F1"] = _f(2 * H / (2 * H + F + M))
        if s in ("mcc", ""):
            result["MCC"] = _f(
                (H * R - F * M)
                / jnp.sqrt((H + F) * (H + M) * (R + F) * (R + M))
            )
        if s in ("sedi", ""):
            hr = H / (H + M)
            fa = F / (F + R)
            result["SEDI"] = _f(
                (jnp.log(fa) - jnp.log(hr) + jnp.log(1 - hr) - jnp.log(1 - fa))
                / (jnp.log(fa) + jnp.log(hr) + jnp.log(1 - hr) + jnp.log(1 - fa))
            )
    if len(result) == 1:
        return list(result.values())[0]
    return result


def _f(x):
    x = np.asarray(x)
    return float(x) if x.ndim == 0 else x
