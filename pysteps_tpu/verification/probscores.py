"""
Probabilistic scores: CRPS, reliability diagram, ROC
(reference: pysteps/verification/probscores.py).
"""

import jax.numpy as jnp
import numpy as np


def CRPS(X_f, X_o):
    """Continuous ranked probability score of an ensemble forecast
    (reference: probscores.py:28).  X_f: (n_members, ...), X_o: (...)."""
    crps = CRPS_init()
    CRPS_accum(crps, X_f, X_o)
    return CRPS_compute(crps)


def CRPS_init():
    """(reference: probscores.py:77)"""
    return {"CRPS_sum": 0.0, "n": 0.0}


def CRPS_accum(CRPS, X_f, X_o):
    """Accumulate using the empirical-CDF integral formulation
    (reference: probscores.py:95)."""
    X_f = jnp.asarray(X_f, jnp.float32)
    X_o = jnp.asarray(X_o, jnp.float32)
    n_members = X_f.shape[0]
    flat_f = X_f.reshape(n_members, -1).T  # (N, members)
    flat_o = X_o.reshape(-1)
    valid = jnp.all(jnp.isfinite(flat_f), axis=1) & jnp.isfinite(flat_o)

    fsort = jnp.sort(flat_f, axis=1)
    # integral of (F(x) - H(x - obs))^2 dx over the piecewise-constant CDF
    obs = flat_o[:, None]
    below = jnp.minimum(fsort, obs)
    # term1: E|X - obs| ; term2: 0.5 E|X - X'| (exact for empirical CDF)
    term1 = jnp.mean(jnp.abs(flat_f - obs), axis=1)
    # pairwise |X_i - X_j| via sorted representation: sum_i (2i+1-n) x_(i)
    idx = jnp.arange(n_members)
    pair = jnp.sum((2 * idx + 1 - n_members) * fsort, axis=1) / (
        n_members * n_members
    )
    crps_pix = term1 - pair
    del below
    CRPS["CRPS_sum"] += float(jnp.sum(jnp.where(valid, crps_pix, 0.0)))
    CRPS["n"] += float(jnp.sum(valid))


def CRPS_merge(CRPS_1, CRPS_2):
    return {
        "CRPS_sum": CRPS_1["CRPS_sum"] + CRPS_2["CRPS_sum"],
        "n": CRPS_1["n"] + CRPS_2["n"],
    }


def CRPS_compute(CRPS):
    """(reference: probscores.py:134)"""
    return 1.0 * CRPS["CRPS_sum"] / max(CRPS["n"], 1.0)


def reldiag(P_f, X_o, X_min, n_bins=10, min_count=10):
    """One-shot reliability diagram (reference: probscores.py:151)."""
    rd = reldiag_init(X_min, n_bins=n_bins, min_count=min_count)
    reldiag_accum(rd, P_f, X_o)
    return reldiag_compute(rd)


def reldiag_init(X_min, n_bins=10, min_count=10):
    """(reference: probscores.py:189)"""
    return {
        "X_min": X_min,
        "bin_edges": np.linspace(-1e-6, 1 + 1e-6, n_bins + 1),
        "n_bins": n_bins,
        "X_sum": np.zeros(n_bins),
        "Y_sum": np.zeros(n_bins, dtype=float),
        "num_idx": np.zeros(n_bins, dtype=float),
        "sample_size": np.zeros(n_bins, dtype=int),
        "min_count": min_count,
    }


def reldiag_accum(reldiag, P_f, X_o):
    """(reference: probscores.py:219)"""
    P_f = np.asarray(P_f).ravel()
    X_o = np.asarray(X_o).ravel()
    valid = np.isfinite(P_f) & np.isfinite(X_o)
    P_f, X_o = P_f[valid], X_o[valid]
    obs = (X_o >= reldiag["X_min"]).astype(float)
    which_bin = np.digitize(P_f, reldiag["bin_edges"]) - 1
    which_bin = np.clip(which_bin, 0, reldiag["n_bins"] - 1)
    for b in range(reldiag["n_bins"]):
        sel = which_bin == b
        reldiag["X_sum"][b] += P_f[sel].sum()
        reldiag["Y_sum"][b] += obs[sel].sum()
        reldiag["num_idx"][b] += sel.sum()
        reldiag["sample_size"][b] += int(sel.sum())


def reldiag_compute(reldiag):
    """(reference: probscores.py:258)"""
    f = reldiag["X_sum"] / np.maximum(reldiag["num_idx"], 1)
    r = reldiag["Y_sum"] / np.maximum(reldiag["num_idx"], 1)
    mask = reldiag["sample_size"] >= reldiag["min_count"]
    return r[mask], f[mask]


def ROC_curve(P_f, X_o, X_min, n_prob_thrs=10, compute_area=False):
    """One-shot ROC curve (reference: probscores.py:288)."""
    roc = ROC_curve_init(X_min, n_prob_thrs=n_prob_thrs)
    ROC_curve_accum(roc, P_f, X_o)
    return ROC_curve_compute(roc, compute_area=compute_area)


def ROC_curve_init(X_min, n_prob_thrs=10):
    """(reference: probscores.py:322)"""
    return {
        "X_min": X_min,
        "hits": np.zeros(n_prob_thrs, dtype=float),
        "misses": np.zeros(n_prob_thrs, dtype=float),
        "false_alarms": np.zeros(n_prob_thrs, dtype=float),
        "corr_neg": np.zeros(n_prob_thrs, dtype=float),
        "prob_thrs": np.linspace(0.0, 1.0, n_prob_thrs),
    }


def ROC_curve_accum(ROC, P_f, X_o):
    """(reference: probscores.py:342)"""
    P_f = np.asarray(P_f).ravel()
    X_o = np.asarray(X_o).ravel()
    valid = np.isfinite(P_f) & np.isfinite(X_o)
    P_f, X_o = P_f[valid], X_o[valid]
    obs = X_o >= ROC["X_min"]
    for i, thr in enumerate(ROC["prob_thrs"]):
        fore = P_f >= thr
        ROC["hits"][i] += np.sum(fore & obs)
        ROC["misses"][i] += np.sum(~fore & obs)
        ROC["false_alarms"][i] += np.sum(fore & ~obs)
        ROC["corr_neg"][i] += np.sum(~fore & ~obs)


def ROC_curve_compute(ROC, compute_area=False):
    """(reference: probscores.py:366)"""
    POD = ROC["hits"] / np.maximum(ROC["hits"] + ROC["misses"], 1)
    POFD = ROC["false_alarms"] / np.maximum(
        ROC["false_alarms"] + ROC["corr_neg"], 1
    )
    if compute_area:
        x = np.concatenate([[1.0], POFD, [0.0]])[::-1]
        y = np.concatenate([[1.0], POD, [0.0]])[::-1]
        area = np.trapezoid(y, x=x)
        return POFD, POD, area
    return POFD, POD
