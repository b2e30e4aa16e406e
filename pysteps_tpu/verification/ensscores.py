"""
Ensemble skill/spread and rank histogram
(reference: pysteps/verification/ensscores.py).
"""

import numpy as np

from pysteps_tpu.verification.interface_helpers import resolve_det_score


def ensemble_skill(X_f, X_o, metric, **kwargs):
    """Mean skill of individual members vs observation
    (reference: ensscores.py:25)."""
    X_f, X_o = np.asarray(X_f), np.asarray(X_o)
    scores = [resolve_det_score(metric)(X_f[i], X_o, **kwargs) for i in range(X_f.shape[0])]
    return float(np.mean(scores))


def ensemble_spread(X_f, metric, **kwargs):
    """Mean pairwise member-vs-member score (reference: ensscores.py:80)."""
    X_f = np.asarray(X_f)
    n = X_f.shape[0]
    vals = []
    for i in range(n):
        for j in range(i + 1, n):
            vals.append(resolve_det_score(metric)(X_f[i], X_f[j], **kwargs))
    return float(np.mean(vals))


def rankhist(X_f, X_o, X_min=None, normalize=True):
    """One-shot rank histogram (reference: ensscores.py:117)."""
    rh = rankhist_init(X_f.shape[0], X_min=X_min)
    rankhist_accum(rh, X_f, X_o)
    return rankhist_compute(rh, normalize=normalize)


def rankhist_init(num_ens_members, X_min=None):
    """(reference: ensscores.py:157)"""
    return {
        "num_ens_members": num_ens_members,
        "n": np.zeros(num_ens_members + 1, dtype=float),
        "X_min": X_min,
    }


def rankhist_accum(rankhist, X_f, X_o):
    """(reference: ensscores.py:180)"""
    X_f = np.asarray(X_f)
    X_o = np.asarray(X_o)
    num = rankhist["num_ens_members"]
    flat_f = X_f.reshape(num, -1).T
    flat_o = X_o.reshape(-1)
    valid = np.all(np.isfinite(flat_f), axis=1) & np.isfinite(flat_o)
    if rankhist["X_min"] is not None:
        # exclude all-dry cases below the threshold
        wet = (flat_o >= rankhist["X_min"]) | np.any(
            flat_f >= rankhist["X_min"], axis=1
        )
        valid &= wet
    flat_f, flat_o = flat_f[valid], flat_o[valid]
    ranks = np.sum(flat_f < flat_o[:, None], axis=1)
    ties = np.sum(flat_f == flat_o[:, None], axis=1)
    # randomize tie ranks
    if np.any(ties > 0):
        ranks = ranks + (np.random.rand(len(ranks)) * (ties + 1)).astype(int)
    for r in range(num + 1):
        rankhist["n"][r] += np.sum(ranks == r)


def rankhist_merge(rankhist_1, rankhist_2):
    out = dict(rankhist_1)
    out["n"] = rankhist_1["n"] + rankhist_2["n"]
    return out


def rankhist_compute(rankhist, normalize=True):
    """(reference: ensscores.py:234)"""
    if normalize:
        return rankhist["n"] / max(rankhist["n"].sum(), 1.0)
    return rankhist["n"]
